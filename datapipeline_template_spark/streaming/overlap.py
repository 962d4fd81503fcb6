"""Streaming source-overlap maintenance — the incremental form of the
tx22 contamination audit (queries/text.py).

A growing corpus never recomputes its source × source shingle-overlap
matrix from scratch: each micro-batch of new documents is shingled
ONCE, reduced to its distinct (source, shingle) rows, and anti-joined
against the stored distinct set — only rows the store has never seen
produce deltas. Two delta tables make the audit additive:

- ``tot_deltas``: per batch, how many NEW distinct shingles each
  source gained.
- ``pair_deltas``: per batch, for each unordered source pair, how many
  shingles became NEWLY SHARED — a (pair, shingle) contribution is
  emitted exactly once, in the batch where the LATER of the two
  (source, shingle) memberships arrives (the IncrementalLsh emission
  contract, applied to set intersections): against the stored set for
  cross-batch sharing, within the batch's own new rows for same-batch
  sharing.

``overlap()`` then just SUMs the deltas and divides — after any number
of drains it equals the batch tx22 matrix over every document seen
(equivalence-tested), because |A|, |B| and |A ∩ B| are all additive
over never-seen-before elements.

Exactly-once under at-least-once ``foreachBatch`` delivery: per-batch
``_batch=<id>`` dynamic-partition overwrite + committed-batch markers,
and the stored-set read excludes the current batch id so a
crash-after-write replay computes the identical deltas (the
streaming/lsh.py discipline).

Scale: the store is distinct (source, shingle) — the same cardinality
tx22's first shuffle produces; the anti-join and the cross probe are
equi-joins on the shingle hash (bucket the store by ``g`` at 100 TB).
A shingle carried by all S sources costs S rows per probe, never a
corpus-sized blowup.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["IncrementalSourceOverlap"]


class IncrementalSourceOverlap:
    """Maintains distinct (source, shingle) rows plus additive overlap
    deltas from a stream of (id, source, text) documents."""

    def __init__(
        self,
        store_path: str,
        source_col: str = "source",
        text_col: str = "text",
        k: int = 3,
    ) -> None:
        self.store_path = store_path
        self.source_col = source_col
        self.text_col = text_col
        self.k = k

    # -- store layout ------------------------------------------------------

    @property
    def _sg_path(self) -> str:
        return os.path.join(self.store_path, "sg")

    @property
    def _tot_path(self) -> str:
        return os.path.join(self.store_path, "tot_deltas")

    @property
    def _pairs_path(self) -> str:
        return os.path.join(self.store_path, "pair_deltas")

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.store_path, "_commits", str(batch_id))

    # -- foreachBatch body -------------------------------------------------

    def _batch_sg(self, batch: DataFrame) -> DataFrame:
        """Distinct (source, g) over the batch — the tx22 shingle spec
        (tokenize → k-gram poly shingles → explode → distinct)."""
        from ..operators.dedup import shingle_tokens
        from ..operators.text import tokenize

        return (
            batch.select(
                F.col(self.source_col).alias("source"),
                F.explode(
                    shingle_tokens(tokenize(self.text_col), k=self.k)
                ).alias("g"),
            )
            .distinct()
        )

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        """Shingle the batch, derive never-seen (source, g) rows, and
        append (via per-batch overwrite) the stored rows plus the
        additive total/pair deltas."""
        if os.path.exists(self._marker(batch_id)):
            return
        spark = batch.sparkSession
        sg_b = self._batch_sg(batch)
        if os.path.isdir(self._sg_path):
            stored = (
                spark.read.parquet(self._sg_path)
                # Crash-after-write replay must not see its own rows.
                .where(F.col("_batch") != F.lit(int(batch_id)))
                .select("source", "g")
            )
        else:
            stored = spark.createDataFrame([], sg_b.schema)
        # Eager: `new` feeds the store write, the tot delta, and BOTH
        # sides of two joins — and severs lineage from the store paths
        # being overwritten below.
        new = sg_b.join(
            stored, ["source", "g"], "left_anti"
        ).localCheckpoint(eager=True)

        tot = new.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("d")
        )
        cross = (
            new.alias("n")
            .join(stored.alias("s"), "g")
            .where(F.col("n.source") != F.col("s.source"))
            .select(
                F.least("n.source", "s.source").alias("src_a"),
                F.greatest("n.source", "s.source").alias("src_b"),
            )
        )
        within = (
            new.alias("a")
            .join(new.alias("b"), "g")
            .where(F.col("a.source") < F.col("b.source"))
            .select(
                F.col("a.source").alias("src_a"),
                F.col("b.source").alias("src_b"),
            )
        )
        pair_delta = (
            cross.unionByName(within)
            .groupBy("src_a", "src_b")
            .agg(F.count(F.lit(1)).cast("long").alias("d"))
        )

        for df, path in (
            (new, self._sg_path),
            (tot, self._tot_path),
            (pair_delta, self._pairs_path),
        ):
            df.withColumn("_batch", F.lit(int(batch_id))).write.mode(
                "overwrite"
            ).option("partitionOverwriteMode", "dynamic").partitionBy(
                "_batch"
            ).parquet(path)
        self._commit(batch_id)

    def _commit(self, batch_id: int) -> None:
        os.makedirs(os.path.dirname(self._marker(batch_id)), exist_ok=True)
        open(self._marker(batch_id), "w").close()

    # -- drives ------------------------------------------------------------

    def run_available_now(self, stream_df: DataFrame, checkpoint: str) -> None:
        """Drain all pending input (AvailableNow, R21), maintaining the
        overlap deltas incrementally."""
        q = (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # -- reads -------------------------------------------------------------

    def _read_or_empty(
        self, spark: SparkSession, path: str, schema_str: str
    ) -> DataFrame:
        """Read a delta table, or a typed empty frame when the store
        legitimately has no rows yet (no drain, or every batch wrote
        an empty delta — dynamic-partition overwrite of an empty frame
        creates NO files, so the directory may be absent or
        footerless). The absence check is explicit (isdir), never a
        broad except that would also swallow real read errors."""
        from pyspark.sql import types as T

        empty = spark.createDataFrame([], T._parse_datatype_string(schema_str))
        from .compaction import dataset_present

        if not dataset_present(path):
            return empty
        try:
            return spark.read.schema(
                T._parse_datatype_string(schema_str + ", _batch int")
            ).parquet(path).drop("_batch")
        except Exception as exc:  # pragma: no cover - footerless dir
            # partitionBy of an all-empty delta can leave a directory
            # with no parquet footers; an explicit schema read usually
            # handles it, so anything else is a REAL error.
            if "PATH_NOT_FOUND" in str(exc) or "Unable to infer" in str(exc):
                return empty
            raise

    def overlap(self, spark: SparkSession) -> DataFrame:
        """The tx22 matrix over every document seen: per source pair
        (src_a < src_b) with any sharing, distinct-shingle sizes,
        shared count, exact Jaccard — a SUM over the maintained deltas,
        never a recomputation. Before any drain (or after only
        zero-shingle batches) the matrix is legitimately EMPTY."""
        tot = (
            self._read_or_empty(spark, self._tot_path, "source string, d long")
            .groupBy("source")
            .agg(F.sum("d").cast("long").alias("n"))
        )
        shared = (
            self._read_or_empty(
                spark, self._pairs_path,
                "src_a string, src_b string, d long",
            )
            .groupBy("src_a", "src_b")
            .agg(F.sum("d").cast("long").alias("n_shared"))
        )
        ta = tot.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
        tb = tot.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
        jac = F.col("n_shared").cast("double") / (
            F.col("n_a") + F.col("n_b") - F.col("n_shared")
        ).cast("double")
        return (
            shared.join(F.broadcast(ta), "src_a")
            .join(F.broadcast(tb), "src_b")
            .select(
                "src_a", "src_b", "n_a", "n_b", "n_shared",
                jac.alias("jaccard"),
            )
        )
