"""Streaming perplexity-filter maintenance — the incremental form of
tx23's unigram-surprisal banding (queries/text.py).

CCNet-style perplexity filtering is normally a batch recompute: the
LM's unigram counts depend on the WHOLE corpus, so a naive pipeline
re-tokenizes everything whenever the corpus grows. But every piece of
the score is additive or joinable:

- ``counts``: per-batch (w, c) token-count deltas — additive, the LM
  is just their sum (the IncrementalBpeVocab insight applied to the
  scoring LM instead of the merge table).
- ``tot``: per-batch total-token delta — additive.
- ``doctok``: per-batch (doc_id, w, n) token PROFILES — a pure
  function of each document, written once; re-scoring a document
  against a grown LM is then ONE equi-join on w, never a re-parse.

``scores()`` therefore equals the batch ``unigram_surprisal`` over
every document seen, at any drain point (equivalence-tested) — the
honest contract for a score that by definition shifts as the corpus
grows: maintained state makes the refresh a join, not a recompute.
``bands()`` applies tx23's pinned thresholds on top.

Every per-batch artifact is a pure function of the batch alone (the
streaming/kmv.py discipline — no store reads), so a crash-after-write
replay rewrites identical partitions; ``_batch`` dynamic-partition
overwrite + committed markers keep the family contract uniform.

Scale: counts state is the vocabulary (bounded, Zipf); doctok state is
the corpus's per-doc token multiset — the same cardinality the batch
pipeline's first shuffle produces, bucketable by w at 100 TB. The
score refresh is two w-keyed equi-joins + one doc-keyed aggregate.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["IncrementalSurprisal"]


class IncrementalSurprisal:
    """Maintains the unigram LM and per-doc token profiles for a
    growing (id, text) document stream; scores/bands on demand."""

    def __init__(
        self,
        store_path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        self.store_path = store_path
        self.id_col = id_col
        self.text_col = text_col

    # -- store layout ------------------------------------------------------

    @property
    def _counts_path(self) -> str:
        return os.path.join(self.store_path, "counts")

    @property
    def _tot_path(self) -> str:
        return os.path.join(self.store_path, "tot")

    @property
    def _doctok_path(self) -> str:
        return os.path.join(self.store_path, "doctok")

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.store_path, "_commits", str(batch_id))

    # -- foreachBatch body -------------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        """Tokenize the batch ONCE and land its three additive
        artifacts. Pure function of the batch — replay-idempotent."""
        if os.path.exists(self._marker(batch_id)):
            return
        from ..operators.text import tokenize

        tok = batch.select(
            F.col(self.id_col).alias("doc_id"),
            F.explode(tokenize(self.text_col)).alias("w"),
        )
        doctok = tok.groupBy("doc_id", "w").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        # counts/tot derive from doctok so the batch tokenizes once.
        counts = doctok.groupBy("w").agg(F.sum("n").cast("long").alias("c"))
        tot = doctok.agg(F.sum("n").cast("long").alias("t"))
        for df, path in (
            (doctok, self._doctok_path),
            (counts, self._counts_path),
            (tot, self._tot_path),
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
        q = (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # -- reads -------------------------------------------------------------

    def _read(self, spark: SparkSession, path: str, schema_str: str) -> DataFrame:
        from pyspark.sql import types as T

        empty = spark.createDataFrame([], T._parse_datatype_string(schema_str))
        from .compaction import dataset_present

        if not dataset_present(path):
            return empty
        return (
            spark.read.schema(
                T._parse_datatype_string(schema_str + ", _batch int")
            )
            .parquet(path)
            .drop("_batch")
        )

    def lm(self, spark: SparkSession) -> DataFrame:
        """The current unigram LM: summed (w, c) deltas."""
        return (
            self._read(spark, self._counts_path, "w string, c long")
            .groupBy("w")
            .agg(F.sum("c").cast("long").alias("c"))
        )

    def scores(self, spark: SparkSession) -> DataFrame:
        """Per-document (doc_id, n_tokens, sum_mb) over EVERY document
        seen, scored against the CURRENT maintained LM — equals batch
        ``unigram_surprisal`` over the union of all drained batches.
        Two w-keyed equi-joins + one doc-keyed aggregate; no document
        is ever re-tokenized."""
        from ..functions import milli_log2

        doctok = self._read(
            spark, self._doctok_path, "doc_id long, w string, n long"
        )
        tot = (
            self._read(spark, self._tot_path, "t long")
            .agg(F.sum("t").cast("long").alias("t"))
        )
        surp = self.lm(spark).crossJoin(F.broadcast(tot)).select(
            "w", (milli_log2("t") - milli_log2("c")).alias("surp")
        )
        return (
            doctok.join(surp, "w")
            .groupBy("doc_id")
            .agg(
                F.sum("n").cast("long").alias("n_tokens"),
                F.sum(F.col("n") * F.col("surp")).cast("long").alias("sum_mb"),
            )
        )

    def bands(self, spark: SparkSession) -> DataFrame:
        """tx23's banding over the maintained scores (pinned
        thresholds — see queries/text.py for the measurement
        discipline)."""
        from ..queries.text import TX23_HEAD_MB, TX23_TAIL_MB

        mean_mb = F.expr("sum_mb DIV n_tokens")
        return self.scores(spark).select(
            "doc_id",
            "n_tokens",
            "sum_mb",
            mean_mb.alias("mean_mb"),
            F.when(mean_mb < TX23_HEAD_MB, "head")
            .when(mean_mb < TX23_TAIL_MB, "middle")
            .otherwise("tail")
            .alias("band"),
        )
