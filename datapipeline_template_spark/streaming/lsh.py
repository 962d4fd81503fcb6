"""Streaming MinHash-LSH maintenance — the end-to-end form of
``operators/dedup.lsh_candidate_pairs_incremental``.

A growing corpus never re-pairs itself: each micro-batch of new
documents is signed ONCE (signatures are write-once per doc), probed
against the stored signature table on the (band, bucket) equi-key,
and exactly the candidate pairs TOUCHING the batch (new×existing and
new×new) are appended to the maintained pair table. After any number
of drains, the maintained pairs equal the full-corpus
``lsh_candidate_pairs`` over every document seen — the dd09
equivalence contract, kept end-to-end by construction: a pair (a, b)
is emitted exactly once, in the batch where its LATER member arrives.

Exactly-once under at-least-once ``foreachBatch`` delivery: every
batch writes its signature rows and its pair rows into a
``_batch=<id>`` subdirectory with overwrite semantics, so a REPLAYED
batch rewrites the identical bytes instead of appending duplicates —
idempotence by path, not by marker alone. A committed-batch marker
(the same pattern as ``streaming/rollup.py``) additionally turns
replays into cheap no-ops, and on a half-written crash (data landed,
marker lost) the replay's overwrite repairs the store. The reading of
"existing" signatures excludes the current batch id for the same
reason: a crash-after-sig-write replay must not see its own rows as
corpus.

Contract: document ids are unique across batches (write-once docs —
re-delivery of a batch is handled by the marker/overwrite, but the
same doc_id arriving in two DIFFERENT batches would sign twice; CDC
feeds should keep-latest upstream). At 100 TB the signature store is
a real table (bucketed by id or band for the probe join); here it is
a parquet directory with the identical layout semantics.

Scale: the probe broadcast is size-gated per batch — the maintainer
counts the batch (a count it needs anyway to skip empty batches) and
pins ``broadcast`` explicitly, so a backfill-sized batch degrades to
the shuffle join instead of OOMing executors.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    lsh_candidate_pairs_incremental,
    minhash_signatures_kernel,
)

__all__ = ["IncrementalLsh"]


class IncrementalLsh:
    """Maintains a signature table + candidate-pair table from a
    stream of (id, text) documents, one micro-batch at a time."""

    def __init__(
        self,
        store_path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        num_hashes: int = 32,
        bands: int = 8,
        rows_per_band: int = 4,
        k: int = 3,
        broadcast_max_rows: int = 2_000_000,
    ) -> None:
        if bands * rows_per_band != num_hashes:
            raise ValueError(
                f"bands*rows_per_band must equal num_hashes "
                f"({bands}*{rows_per_band} != {num_hashes})"
            )
        self.store_path = store_path
        self.id_col = id_col
        self.text_col = text_col
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = rows_per_band
        self.k = k
        self.broadcast_max_rows = broadcast_max_rows

    # -- store layout ------------------------------------------------------

    @property
    def _sig_path(self) -> str:
        return os.path.join(self.store_path, "signatures")

    @property
    def _pairs_path(self) -> str:
        return os.path.join(self.store_path, "pairs")

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.store_path, "_commits", str(batch_id))

    # -- foreachBatch body -------------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        """Sign the batch, probe it against the stored corpus, append
        (via per-batch overwrite) signatures and touching pairs."""
        if os.path.exists(self._marker(batch_id)):
            return
        spark = batch.sparkSession
        # Eager materialization: the signatures feed the probe join
        # (both sides), the size gate, and the store write — signing
        # three times would triple the kernel cost, and severing
        # lineage here also lets the pair plan read the signature
        # store without overlapping the paths being written.
        sigs_new = minhash_signatures_kernel(
            batch,
            self.id_col,
            self.text_col,
            num_hashes=self.num_hashes,
            k=self.k,
        ).localCheckpoint(eager=True)
        n_new = sigs_new.count()
        if n_new == 0:
            self._commit(batch_id)
            return

        from .compaction import dataset_present

        if dataset_present(self._sig_path):
            existing = (
                spark.read.parquet(self._sig_path)
                # A crash-after-sig-write replay must not treat its own
                # half-committed rows as corpus.
                .where(F.col("_batch") != F.lit(int(batch_id)))
                .select(self.id_col, "sig")
            )
        else:
            existing = spark.createDataFrame([], sigs_new.schema)
        pairs = lsh_candidate_pairs_incremental(
            existing,
            sigs_new,
            self.id_col,
            "sig",
            bands=self.bands,
            rows_per_band=self.rows_per_band,
            broadcast=n_new <= self.broadcast_max_rows // max(self.bands, 1),
        )
        # Per-batch overwrite => byte-idempotent replay, no duplicate
        # rows ever, no read-modify-write of prior batches' data.
        pairs.withColumn("_batch", F.lit(int(batch_id))).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy("_batch").parquet(
            self._pairs_path
        )
        sigs_new.withColumn("_batch", F.lit(int(batch_id))).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy("_batch").parquet(
            self._sig_path
        )
        self._commit(batch_id)

    def _commit(self, batch_id: int) -> None:
        os.makedirs(os.path.dirname(self._marker(batch_id)), exist_ok=True)
        open(self._marker(batch_id), "w").close()

    # -- drives ------------------------------------------------------------

    def run_available_now(self, stream_df: DataFrame, checkpoint: str) -> None:
        """Drain all pending input (AvailableNow, R21), maintaining
        the signature and pair tables incrementally."""
        q = (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # -- reads -------------------------------------------------------------

    def signatures(self, spark: SparkSession) -> DataFrame:
        """All maintained (id, sig) rows. Finishes any compaction swap
        a crash left pending before reading."""
        from .compaction import dataset_present

        dataset_present(self._sig_path)
        return spark.read.parquet(self._sig_path).select(self.id_col, "sig")

    def pairs(self, spark: SparkSession) -> DataFrame:
        """All maintained candidate pairs (id_a < id_b), distinct
        across batches by the exactly-once emission contract."""
        from .compaction import dataset_present

        dataset_present(self._pairs_path)
        try:
            return spark.read.parquet(self._pairs_path).select("id_a", "id_b")
        except Exception:
            # No pair-bearing batch yet: an empty/absent store is a
            # legitimate state (e.g. every batch so far was
            # bucket-disjoint) — surface it as an empty frame typed
            # like the ids, not as a read error.
            idt = self.signatures(spark).schema[self.id_col].dataType
            from pyspark.sql import types as T

            return spark.createDataFrame(
                [],
                T.StructType(
                    [T.StructField("id_a", idt), T.StructField("id_b", idt)]
                ),
            )
