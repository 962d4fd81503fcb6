"""Streaming quantile-sketch maintenance — the incremental form of
q45's mergeable log-histogram (operators/sketch.py log_hist_bins /
hist_quantiles).

Bin counts are ADDITIVE: each batch reduces to its own (group, bin,
cnt) delta — a pure function of the batch, like the KMV partials —
and the current sketch is just their sum. Quantile reads run
hist_quantiles over the merged counts, so ``quantiles()`` equals the
batch operator over the union of all drained batches at ANY drain
point (equivalence-tested), with the same guaranteed-overestimate
edge math. That additivity is the entire reason to keep a histogram
instead of the values: per-day/per-source sketches persist in
O(bins ≤ ~540) and answer any later quantile question by addition,
never a rescan — the same argument as streaming/kmv.py, applied to
quantiles instead of cardinality.

Replays are marker-skip no-ops; crash-after-write replays rewrite
identical partitions (``_batch`` dynamic-partition overwrite +
committed markers — the uniform family contract). Group/value column
names are pinned in store metadata: histograms of different value
columns must never merge.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["IncrementalHistogram"]


class IncrementalHistogram:
    """Maintains per-group log-histogram bin counts for a growing
    stream of (group, positive long value) rows; quantile estimates
    on demand."""

    def __init__(
        self,
        store_path: str,
        group_col: str = "source",
        value_col: str = "v",
    ) -> None:
        self.store_path = store_path
        self.group_col = group_col
        self.value_col = value_col
        meta_path = os.path.join(store_path, "hist_meta.json")
        meta = {"group_col": group_col, "value_col": value_col}
        if os.path.exists(meta_path):
            stored = json.load(open(meta_path))
            if stored != meta:
                raise ValueError(
                    f"store at {store_path} was built with {stored}; got "
                    f"{meta} — histograms of different columns must never "
                    "merge (rebuild into a fresh store instead)"
                )
        else:
            os.makedirs(store_path, exist_ok=True)
            with open(meta_path, "w") as f:
                json.dump(meta, f)

    # -- store layout ------------------------------------------------------

    @property
    def _bins_path(self) -> str:
        return os.path.join(self.store_path, "bins")

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.store_path, "_commits", str(batch_id))

    # -- foreachBatch body -------------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        """Reduce the batch to its (group, bin, cnt) delta and land it
        in the batch's own partition. Pure function of the batch —
        replay-idempotent."""
        if os.path.exists(self._marker(batch_id)):
            return
        from ..operators.sketch import log_hist_bins

        delta = log_hist_bins(
            batch.select(
                F.col(self.group_col).alias("g"),
                F.col(self.value_col).alias("v"),
            ),
            "g",
            "v",
        )
        delta.withColumn("_batch", F.lit(int(batch_id))).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy(
            "_batch"
        ).parquet(self._bins_path)
        self._commit(batch_id)
        # Auto-compaction policy hook (r12 verdict #3): fires only when
        # a policy is installed AND due; replays never reach here (the
        # marker short-circuit above), so policy cannot break replay
        # idempotence.
        from .compaction import maybe_auto_compact

        maybe_auto_compact(
            self.store_path, lambda: self.compact(batch.sparkSession)
        )

    def _commit(self, batch_id: int) -> None:
        os.makedirs(os.path.dirname(self._marker(batch_id)), exist_ok=True)
        open(self._marker(batch_id), "w").close()

    # -- drives ------------------------------------------------------------

    def run_available_now(self, stream_df: DataFrame, checkpoint: str) -> None:
        q = (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def compact(self, spark: SparkSession) -> None:
        """Fold committed per-batch deltas into one SUMMED row per
        (group, bin) in the ``_batch=-1`` base partition
        (streaming/compaction.py) — state drops to O(groups · bins).
        Bin counts are additive, so the fold IS the read-side sum;
        markers survive, so replays of folded batches stay no-ops."""
        from .compaction import compact_store

        def fold(df: DataFrame) -> DataFrame:
            return df.groupBy("g", "bin").agg(
                F.sum("cnt").cast("long").alias("cnt")
            )

        compact_store(spark, self.store_path, folds={"bins": fold})

    # -- reads -------------------------------------------------------------

    def counts(self, spark: SparkSession) -> DataFrame:
        """The current merged sketch: summed (g, bin, cnt) deltas."""
        from pyspark.sql import types as T

        schema = "g string, bin long, cnt long"
        empty = spark.createDataFrame([], T._parse_datatype_string(schema))
        from .compaction import dataset_present

        if not dataset_present(self._bins_path):
            return empty
        return (
            spark.read.schema(
                T._parse_datatype_string(schema + ", _batch int")
            )
            .parquet(self._bins_path)
            .drop("_batch")
            .groupBy("g", "bin")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )

    def quantiles(self, spark: SparkSession, qs) -> DataFrame:
        """(g, q, est) over the maintained sketch via the shared
        hist_quantiles spec — equals the batch operator over every
        value seen."""
        from ..operators.sketch import hist_quantiles

        return hist_quantiles(self.counts(spark), "g", qs)
