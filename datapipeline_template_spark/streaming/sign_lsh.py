"""Streaming sign-LSH maintenance for EMBEDDINGS — the vector-side
sibling of ``streaming/lsh.py`` (MinHash signatures), completing the
incremental family: LSH signatures, rollups, chunk registries, and now
the bucketed-vector index behind multi-table ANN
(``operators/similarity.lsh_multi_table_pairs``).

A growing embedding corpus never re-pairs itself: each micro-batch of
new vectors is quantized and bucketed ONCE (buckets are write-once per
vector — the same deterministic plane schedule every run), probed
against the stored vector table on each table's bucket equi-key, and
exactly the cosine-verified pairs TOUCHING the batch (new×existing and
new×new) are appended to the maintained pair table. After any number
of drains the maintained pairs equal the full-corpus
``lsh_multi_table_pairs`` over every vector seen — a pair (a, b) is
emitted exactly once, in the batch where its LATER member arrives.

Exactly-once under at-least-once ``foreachBatch`` delivery: identical
machinery to ``streaming/lsh.py`` — per-``_batch`` partition overwrite
makes replays byte-idempotent, a committed-batch marker makes them
cheap no-ops, and the "existing" read excludes the current batch id so
a crash-after-write replay never sees its own rows as corpus.

Store layout: the vector table holds the QUANTIZED array + squared
norm + one bucket column per table — the per-row work
(``quantize_vec`` / ``norm_sq_prequantized`` / ``lsh_bucket``) is paid
once at ingest, so every later probe join scores pre-quantized arrays
with the flat codegen-resident dot (the ss01-family fast path). At
100 TB the vector store is a real table bucketed by (table, bucket)
for the probe; here it is a parquet directory with identical
semantics. The probe broadcast is size-gated per batch exactly like
the MinHash maintainer: the batch count (needed anyway for the empty
skip) pins the strategy, so a backfill degrades to a shuffle join
instead of OOMing executors.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cosine_prequantized, norm_sq_prequantized, quantize_vec
from ..operators.similarity import lsh_bucket_prequantized

__all__ = ["IncrementalSignLsh"]


class IncrementalSignLsh:
    """Maintains a bucketed-vector table + cosine-verified candidate
    pair table from a stream of (id, embedding) rows, one micro-batch
    at a time."""

    def __init__(
        self,
        store_path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        threshold: float = 0.3,
        n_planes: int = 8,
        n_tables: int = 2,
        dim: int = 64,
        broadcast_max_rows: int = 2_000_000,
    ) -> None:
        self.store_path = store_path
        self.id_col = id_col
        self.vec_col = vec_col
        self.threshold = threshold
        self.n_planes = n_planes
        self.n_tables = n_tables
        self.dim = dim
        self.broadcast_max_rows = broadcast_max_rows

    # -- store layout ------------------------------------------------------

    @property
    def _vec_path(self) -> str:
        return os.path.join(self.store_path, "vectors")

    @property
    def _pairs_path(self) -> str:
        return os.path.join(self.store_path, "pairs")

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.store_path, "_commits", str(batch_id))

    # -- per-row ingest work (write-once per vector) -------------------------

    def _prepare(self, df: DataFrame) -> DataFrame:
        """(id, vec) → (id, _qv, _n, _b0.._bL-1): quantized array,
        squared norm, one sign-LSH bucket per table (disjoint plane
        slices — same schedule as lsh_multi_table_pairs)."""
        out = df.select(
            F.col(self.id_col).alias("_id"),
            quantize_vec(F.col(self.vec_col)).alias("_qv"),
        ).withColumn("_n", norm_sq_prequantized(F.col("_qv")))
        for t in range(self.n_tables):
            out = out.withColumn(
                f"_b{t}",
                lsh_bucket_prequantized(
                    F.col("_qv"),
                    n_planes=self.n_planes,
                    dim=self.dim,
                    plane_offset=t * self.n_planes,
                ),
            )
        return out

    # -- foreachBatch body ---------------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        """Bucket the batch, probe it against the stored corpus per
        table, append (via per-batch overwrite) vectors and the
        cosine-verified pairs touching the batch."""
        if os.path.exists(self._marker(batch_id)):
            return
        spark = batch.sparkSession
        # Eager materialization: the prepared rows feed every table's
        # probe join (both sides), the size gate, and the store write.
        new_v = self._prepare(batch).localCheckpoint(eager=True)
        n_new = new_v.count()
        if n_new == 0:
            self._commit(batch_id)
            return

        from .compaction import dataset_present

        if dataset_present(self._vec_path):
            existing = (
                spark.read.parquet(self._vec_path)
                # Crash-after-write replays must not see their own rows.
                .where(F.col("_batch") != F.lit(int(batch_id)))
                .drop("_batch")
            )
        else:
            existing = spark.createDataFrame([], new_v.schema)
        all_v = existing.unionByName(new_v)
        do_broadcast = n_new <= self.broadcast_max_rows

        pairs = None
        for t in range(self.n_tables):
            a = (F.broadcast(new_v) if do_broadcast else new_v).alias("a")
            joined = a.join(
                all_v.alias("b"),
                (F.col(f"a._b{t}") == F.col(f"b._b{t}"))
                & (F.col("a._id") != F.col("b._id")),
            ).select(
                F.least("a._id", "b._id").alias("id_a"),
                F.greatest("a._id", "b._id").alias("id_b"),
                cosine_prequantized(
                    F.col("a._qv"), F.col("b._qv"),
                    F.col("a._n"), F.col("b._n"), self.dim,
                ).alias("cosine"),
            )
            pairs = joined if pairs is None else pairs.unionByName(joined)
        # The cosine is deterministic per pair (exact-int dot), so the
        # distinct over (ids, score) dedups across tables AND across
        # the new×new double emission (a,b)+(b,a)→least/greatest.
        pairs = pairs.where(F.col("cosine") >= F.lit(self.threshold)).distinct()

        pairs.withColumn("_batch", F.lit(int(batch_id))).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy("_batch").parquet(
            self._pairs_path
        )
        new_v.withColumn("_batch", F.lit(int(batch_id))).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy("_batch").parquet(
            self._vec_path
        )
        self._commit(batch_id)

    def _commit(self, batch_id: int) -> None:
        os.makedirs(os.path.dirname(self._marker(batch_id)), exist_ok=True)
        open(self._marker(batch_id), "w").close()

    # -- drives --------------------------------------------------------------

    def run_available_now(self, stream_df: DataFrame, checkpoint: str) -> None:
        """Drain all pending input (AvailableNow, R21), maintaining
        the vector and pair tables incrementally."""
        q = (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # -- reads ----------------------------------------------------------------

    def vectors(self, spark: SparkSession) -> DataFrame:
        """All maintained (id, _qv, _n, buckets) rows. Finishes any
        compaction swap a crash left pending before reading."""
        from .compaction import dataset_present

        dataset_present(self._vec_path)
        return spark.read.parquet(self._vec_path).drop("_batch")

    def pairs(self, spark: SparkSession) -> DataFrame:
        """All maintained cosine-verified pairs (id_a < id_b),
        distinct across batches by the exactly-once emission
        contract.

        Empty-store handling is gated on directory EXISTENCE (the same
        probe ``process_batch`` uses for the vector store), never a
        broad ``except`` — a corrupt store or permission error must
        surface, not read as "no pairs yet". When no batch has ever
        drained, the id type is taken from the vector store if one
        exists; with the store entirely empty the documented default is
        ``bigint`` (the engine's id convention)."""
        from pyspark.sql import types as T

        from .compaction import dataset_present

        if dataset_present(self._pairs_path):
            return spark.read.parquet(self._pairs_path).select("id_a", "id_b")
        idt = (
            self.vectors(spark).schema["_id"].dataType
            if dataset_present(self._vec_path)
            else T.LongType()
        )
        return spark.createDataFrame(
            [],
            T.StructType(
                [T.StructField("id_a", idt), T.StructField("id_b", idt)]
            ),
        )
