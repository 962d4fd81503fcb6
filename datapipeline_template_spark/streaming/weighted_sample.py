"""Streaming weighted-sample maintenance — the incremental form of
pk10's Efraimidis–Spirakis token-weighted sample
(operators/sampling.py weighted_race_key / weighted_sample_topk).

The race key is a PURE FUNCTION of (key, weight), so a maintained
weighted sample needs no global state at all: each micro-batch
reduces to its own per-stratum top-k winner set (rows + race, ≤ k per
stratum), and the current sample is the top-k of the UNION of the
partials — exactly the batch operator over every row seen, by the
same top-k-of-top-k's identity the KMV family rests on
(equivalence-tested at every drain point). This is the property that
makes weighted reservoir sampling streamable in the literature
(Efraimidis & Spirakis 2006 §3), realized here in the engine's exact
integer millibit arithmetic, so the maintained winner set is
portable and oracle-checkable rather than seed-and-state-bound.

Like streaming/kmv.py, a batch's partial is a pure function of the
batch alone — a crash-after-write replay rewrites the identical
partition, idempotent even before the marker lands; the ``_batch``
dynamic-partition overwrite + committed markers keep the uniform
family contract anyway. The read-side merge additionally applies
DISTINCT over the bounded partial rows: a key re-sent with the same
weight (at-least-once delivery upstream of the marker discipline)
collapses to its identical race row instead of occupying two of the
k slots. A key re-sent with a DIFFERENT weight is a caller contract
violation — the race is a pure function, there is no
last-write-wins; fix the upstream key.

Parameter guard: (k, key_col, weight_col, stratum_col) are pinned in
store metadata — winner sets raced under different weights or strata
must never merge (the streaming/decon.py frozen-meta pattern).

Scale: state is ≤ k rows per (stratum, batch) before compaction and
≤ k per stratum after; the merge shuffles winner rows, never data
rows. Old partials can be periodically compacted into one winner set
per stratum with the same merge — the read path is already that
aggregation.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["IncrementalWeightedSample"]


class IncrementalWeightedSample:
    """Maintains per-stratum Efraimidis–Spirakis weighted samples for
    a growing stream of (stratum: string, key: long, weight: long)
    rows."""

    def __init__(
        self,
        store_path: str,
        key_col: str = "doc_id",
        weight_col: str = "n_tok",
        stratum_col: str = "source",
        k: int = 15,
    ) -> None:
        if k <= 0:
            raise ValueError("need k > 0")
        self.store_path = store_path
        self.key_col = key_col
        self.weight_col = weight_col
        self.stratum_col = stratum_col
        self.k = k
        meta_path = os.path.join(store_path, "wsample_meta.json")
        meta = {
            "k": k,
            "key_col": key_col,
            "weight_col": weight_col,
            "stratum_col": stratum_col,
        }
        if os.path.exists(meta_path):
            stored = json.load(open(meta_path))
            if stored != meta:
                raise ValueError(
                    f"store at {store_path} was built with {stored}; "
                    f"got {meta} — winner sets raced under different "
                    "weights or strata must never merge (rebuild into a "
                    "fresh store instead)"
                )
        else:
            os.makedirs(store_path, exist_ok=True)
            with open(meta_path, "w") as f:
                json.dump(meta, f)

    # -- store layout ------------------------------------------------------

    @property
    def _parts_path(self) -> str:
        return os.path.join(self.store_path, "partials")

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.store_path, "_commits", str(batch_id))

    # -- foreachBatch body -------------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        """Reduce the batch to ≤ k winner rows per touched stratum and
        land them in the batch's own partition. Pure function of the
        batch — replay-idempotent by construction."""
        if os.path.exists(self._marker(batch_id)):
            return
        from pyspark.sql import types as T

        from ..operators.sampling import weighted_sample_topk

        stype = batch.schema[self.stratum_col].dataType
        if not isinstance(stype, T.StringType):
            # The read side pins `stratum string`; refuse at the write
            # instead of failing obscurely on read (IncrementalKmv's
            # guard).
            raise TypeError(
                f"IncrementalWeightedSample stores string strata; "
                f"{self.stratum_col} is {stype.simpleString()} — cast it "
                "before the sink"
            )
        part = weighted_sample_topk(
            batch.select(self.stratum_col, self.key_col, self.weight_col),
            key=self.key_col,
            weight_col=self.weight_col,
            k=self.k,
            stratum_cols=self.stratum_col,
        ).drop("rk")
        part.withColumn("_batch", F.lit(int(batch_id))).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy(
            "_batch"
        ).parquet(self._parts_path)
        self._commit(batch_id)

    def _commit(self, batch_id: int) -> None:
        os.makedirs(os.path.dirname(self._marker(batch_id)), exist_ok=True)
        open(self._marker(batch_id), "w").close()

    # -- drives ------------------------------------------------------------

    def run_available_now(self, stream_df: DataFrame, checkpoint: str) -> None:
        """Drain all pending input (AvailableNow, R21), maintaining the
        per-stratum winner sets incrementally."""
        q = (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # -- reads -------------------------------------------------------------

    def _read_partials(self, spark: SparkSession) -> DataFrame:
        from pyspark.sql import types as T

        cols = (
            f"{self.stratum_col} string, {self.key_col} bigint, "
            f"{self.weight_col} bigint, race bigint"
        )
        from .compaction import dataset_present

        if not dataset_present(self._parts_path):
            return spark.createDataFrame([], T._parse_datatype_string(cols))
        return (
            spark.read.schema(T._parse_datatype_string(cols + ", _batch int"))
            .parquet(self._parts_path)
            .drop("_batch")
        )

    def sample(self, spark: SparkSession) -> DataFrame:
        """The current winner set: per-stratum k smallest race keys
        over the DISTINCT union of every committed partial — a bounded
        rank over O(strata × batches × k) rows, never a re-scan.
        Equals the batch weighted_sample_topk over all rows seen (the
        top-k-of-top-k's identity; equivalence-tested). Before any
        drain the result is legitimately EMPTY."""
        from pyspark.sql import Window

        w = Window.partitionBy(self.stratum_col).orderBy("race", self.key_col)
        return (
            self._read_partials(spark)
            .distinct()
            .withColumn("rk", F.row_number().over(w).cast("long"))
            .where(F.col("rk") <= self.k)
        )
