"""Streaming Count-Min maintenance — the incremental form of q47's
mergeable frequency grid (operators/sketch.py cm_sketch / cm_fold /
cm_estimate).

Counter cells are ADDITIVE: each batch reduces to its own (r, b, cnt)
delta — a pure function of the batch, like the KMV partials and the
histogram bins — and the current grid is just their cell-wise sum.
Point-frequency reads run cm_estimate over the merged grid, so
``estimate()`` equals the batch operator over the union of all
drained batches at ANY drain point (equivalence-tested), with the
same guaranteed-overestimate contract. That additivity is the entire
reason to keep a grid instead of the keys: per-day/per-source
O(depth·width) grids persist and answer later frequency questions —
for keys chosen AFTER the data was seen — by addition, never a
rescan; the streaming/kmv.py argument applied to frequencies instead
of cardinality.

Replays are marker-skip no-ops; crash-after-write replays rewrite
identical partitions (``_batch`` dynamic-partition overwrite +
committed markers — the uniform family contract). Key column, depth
and width are pinned in store metadata: grids built with different
hashes geometries must never merge.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["IncrementalCountMin"]


class IncrementalCountMin:
    """Maintains a Count-Min counter grid for a growing stream of
    LONG keys; point-frequency estimates on demand."""

    def __init__(
        self,
        store_path: str,
        key_col: str = "k",
        depth: int = 4,
        width: int = 2048,
    ) -> None:
        self.store_path = store_path
        self.key_col = key_col
        self.depth = depth
        self.width = width
        meta_path = os.path.join(store_path, "cm_meta.json")
        meta = {"key_col": key_col, "depth": depth, "width": width}
        if os.path.exists(meta_path):
            stored = json.load(open(meta_path))
            if stored != meta:
                raise ValueError(
                    f"store at {store_path} was built with {stored}; got "
                    f"{meta} — grids of different key columns or geometries "
                    "must never merge (rebuild into a fresh store instead)"
                )
        else:
            os.makedirs(store_path, exist_ok=True)
            with open(meta_path, "w") as f:
                json.dump(meta, f)

    # -- store layout ------------------------------------------------------

    @property
    def _cells_path(self) -> str:
        return os.path.join(self.store_path, "cells")

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.store_path, "_commits", str(batch_id))

    # -- foreachBatch body -------------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        """Reduce the batch to its (r, b, cnt) delta and land it in the
        batch's own partition. Pure function of the batch —
        replay-idempotent."""
        if os.path.exists(self._marker(batch_id)):
            return
        from ..operators.sketch import cm_sketch

        delta = cm_sketch(batch, self.key_col, self.depth, self.width)
        delta.withColumn("_batch", F.lit(int(batch_id))).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy(
            "_batch"
        ).parquet(self._cells_path)
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
        """Fold committed per-batch deltas into one SUMMED grid row
        per cell in the ``_batch=-1`` base partition
        (streaming/compaction.py) — state drops to ≤ depth·width rows
        total. Cells are additive, so the fold IS the read-side sum;
        markers survive, so replays of folded batches stay no-ops."""
        from .compaction import compact_store

        def fold(df: DataFrame) -> DataFrame:
            return df.groupBy("r", "b").agg(
                F.sum("cnt").cast("long").alias("cnt")
            )

        compact_store(spark, self.store_path, folds={"cells": fold})

    # -- reads -------------------------------------------------------------

    def cells(self, spark: SparkSession) -> DataFrame:
        """The current merged grid: summed (r, b, cnt) deltas."""
        from pyspark.sql import types as T

        schema = "r int, b long, cnt long"
        empty = spark.createDataFrame([], T._parse_datatype_string(schema))
        from .compaction import dataset_present

        if not dataset_present(self._cells_path):
            return empty
        return (
            spark.read.schema(
                T._parse_datatype_string(schema + ", _batch int")
            )
            .parquet(self._cells_path)
            .drop("_batch")
            .groupBy("r", "b")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )

    def estimate(self, items: DataFrame, out_col: str = "est") -> DataFrame:
        """Point-frequency estimates for ``items`` (carrying its
        columns) over the maintained grid via the shared cm_estimate
        spec — equals the batch operator over every key seen, with the
        same est ≥ truth guarantee."""
        from ..operators.sketch import cm_estimate

        grid = self.cells(items.sparkSession)
        return cm_estimate(
            grid, items, self.key_col, self.depth, self.width, out_col=out_col
        )
