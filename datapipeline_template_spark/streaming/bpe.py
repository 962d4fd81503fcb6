"""Streaming BPE-vocabulary maintenance — the tokenizer-side member
of the incremental-index family (MinHash signatures, sign-LSH vectors,
rollups, chunk registries, cluster assignments, D4 marks, and now the
word-frequency vocabulary BPE learning runs on).

The split that makes tokenizer training incremental: learning merges
(``operators/text.bpe_train``) needs only the DISTINCT-WORD frequency
table — thousands of times smaller than the corpus — while building
that table is the one full-corpus scan. So the corpus streams through
word counting (map-only pre-tokenize + one map-side-combined partial
aggregate per micro-batch), per-batch count partitions accumulate
under the family's exactly-once discipline, and ``learn()`` re-runs
the deterministic merge loop on the compact maintained vocabulary
whenever a fresh tokenizer is wanted. A corpus append never re-scans
the existing mass; only the merge learning (cheap, vocab-sized)
re-runs — and MUST re-run, because a single count change can reorder
every argmax after it (merge tables are not incrementally patchable;
prefix stability holds only for unchanged counts, see the tx20
property test).

Exactly-once under at-least-once ``foreachBatch`` delivery: the family
contract — per-``_batch`` dynamic-partition overwrite makes replays
byte-idempotent, and a committed-batch marker makes them cheap no-ops.
Counts are ADDITIVE across batches, so the maintained table needs no
read-modify-write: reads aggregate the partitions (at 100 TB the
periodic compaction of batch partitions is ordinary parquet
maintenance, not a correctness concern).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .kmeans import _has_parquet_files

__all__ = ["IncrementalBpeVocab"]


class IncrementalBpeVocab:
    """Maintains the lowercase-alpha word-frequency table from a
    stream of (id, text) rows, one micro-batch at a time, and learns
    BPE merges from the maintained vocabulary on demand."""

    def __init__(self, store_path: str, text_col: str = "text") -> None:
        self.store_path = store_path
        self.text_col = text_col
        os.makedirs(store_path, exist_ok=True)

    # -- store layout ------------------------------------------------------

    @property
    def _counts_path(self) -> str:
        return os.path.join(self.store_path, "word_counts")

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.store_path, "_commits", str(batch_id))

    # -- foreachBatch body -------------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        if os.path.exists(self._marker(batch_id)):
            return
        counts = (
            batch.select(
                F.explode(
                    F.expr(
                        f"regexp_extract_all({self.text_col}, "
                        "'[a-zA-Z]+', 0)"
                    )
                ).alias("t")
            )
            .select(F.lower(F.col("t")).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        )
        counts.withColumn("_batch", F.lit(int(batch_id))).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy("_batch").parquet(
            self._counts_path
        )
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

    def word_counts(self, spark: SparkSession) -> DataFrame:
        """(word, freq) over everything drained — per-batch partial
        counts are additive, so the read is one aggregate, no
        read-modify-write ever happened. FILE-presence gated (family
        convention): a drained-but-wordless batch leaves a partition
        directory schema inference cannot read."""
        from pyspark.sql import types as T

        if _has_parquet_files(self._counts_path):
            return (
                spark.read.parquet(self._counts_path)
                .groupBy("word")
                .agg(F.sum("freq").alias("freq"))
            )
        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("word", T.StringType()),
                    T.StructField("freq", T.LongType()),
                ]
            ),
        )

    def vocab(self, spark: SparkSession) -> DataFrame:
        """The maintained vocabulary in ``bpe_train``'s input shape:
        sentinel-spaced character rep + frequency (tx20's exact
        construction, so learned merges are comparable)."""
        return self.word_counts(spark).select(
            F.concat(
                F.lit(" "),
                F.array_join(
                    F.expr("regexp_extract_all(word, '[a-z]', 0)"), " "
                ),
                F.lit(" "),
            ).alias("rep"),
            "freq",
        )

    def learn(
        self, spark: SparkSession, n_merges: int = 8
    ) -> list[tuple[str, str, int]]:
        """Deterministic merge learning over the MAINTAINED vocabulary
        — equals ``bpe_train`` over a batch-built vocab of every text
        seen (tested). Re-runs in full by design: one count change can
        reorder every later argmax, so merge tables are re-derived,
        never patched; the saving is the corpus scan, which never
        repeats."""
        from ..operators.text import bpe_train

        merges, _ = bpe_train(
            self.vocab(spark), "rep", "freq", n_merges=n_merges
        )
        return merges
