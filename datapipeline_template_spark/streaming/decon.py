"""Streaming decontamination maintenance — the incremental form of
dd07/dd10's eval-overlap gate (queries/dedup.py).

Contract mirrors the FAISS-style frozen-artifact split the other
maintainers use (streaming/ivfpq.py, streaming/curation.py): the EVAL
shingle set is FROZEN at construction (benchmarks change rarely, and a
changed benchmark invalidates every prior flag — that is a rebuild,
not an increment), while the corpus GROWS. Each micro-batch of new
documents is shingled once and probed against the frozen eval set;
its (doc_id, n_shared) flags land in a ``_batch=<id>`` partition.
Documents sharing nothing are absent — the dd07 convention. After any
number of drains the maintained flags equal the batch
``decontaminate_flags`` over every document seen (equivalence-tested),
because per-document overlap counts depend only on the document and
the frozen eval set — no cross-batch state at all, which is what makes
decontamination the EASIEST stage to maintain and the one no growing
corpus has an excuse to skip.

Exactly-once under at-least-once ``foreachBatch`` delivery: per-batch
dynamic-partition overwrite + committed-batch markers (the
streaming/lsh.py discipline). The frozen eval set is written once at
construction with an O_EXCL-style guard: a maintainer pointed at an
existing store must present the SAME eval fingerprint or refuse —
flags computed against two different eval sets must never mix.

Scale: the eval set collapses to its distinct shingle hashes and
BROADCASTS (benchmarks are tiny against a 100 TB corpus — the dd07
story); each batch is map-only explode + hash probe + one per-doc
count. k is a constructor parameter (default 5, dd10's GPT-3-style
width — see pipe15 for why 3-gram gates false-positive on real text).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["IncrementalDecon"]


class IncrementalDecon:
    """Maintains per-document eval-overlap flags for a growing corpus
    against a FROZEN eval set, one micro-batch at a time."""

    def __init__(
        self,
        store_path: str,
        eval_docs: DataFrame | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
        k: int = 5,
    ) -> None:
        self.store_path = store_path
        self.id_col = id_col
        self.text_col = text_col
        self.k = k
        meta_path = os.path.join(store_path, "eval_meta.json")
        if eval_docs is not None:
            ev = self._shingle(eval_docs).select(
                F.explode(F.col("_sh")).alias("g")
            ).distinct()
            if os.path.exists(meta_path):
                # Existing store: the eval set must MATCH — refuse to
                # mix flags computed against different benchmarks.
                meta = json.load(open(meta_path))
                fp = self._fingerprint(ev)
                if meta["k"] != k or meta["fingerprint"] != fp:
                    raise ValueError(
                        "IncrementalDecon store at "
                        f"{store_path} was built against a different "
                        "eval set or shingle width (stored k="
                        f"{meta['k']}, fingerprint {meta['fingerprint']}"
                        f"; got k={k}, {fp}) — decontamination flags "
                        "from different eval sets must never mix; use "
                        "a fresh store to re-gate against a new "
                        "benchmark."
                    )
            else:
                ev.write.mode("overwrite").parquet(self._eval_path)
                os.makedirs(store_path, exist_ok=True)
                meta = {"k": k, "fingerprint": self._fingerprint(ev)}
                tmp = meta_path + ".tmp"
                with open(tmp, "w") as fh:
                    json.dump(meta, fh)
                os.replace(tmp, meta_path)
        elif not os.path.exists(meta_path):
            raise ValueError(
                "new IncrementalDecon store needs eval_docs — the "
                "frozen benchmark the gate protects"
            )

    # -- shingles ------------------------------------------------------------

    def _shingle(self, docs: DataFrame) -> DataFrame:
        """(id, _sh): the dd03/dd10 shingle spec at width k."""
        from ..operators.dedup import shingle_tokens
        from ..operators.text import tokenize

        return docs.select(
            F.col(self.id_col),
            shingle_tokens(tokenize(self.text_col), k=self.k).alias("_sh"),
        )

    @staticmethod
    def _fingerprint(ev: DataFrame) -> str:
        """Order-insensitive fingerprint of the eval shingle set
        (count + sum of hashes — collisions would need a crafted
        adversary, fine for a config-mismatch guard)."""
        row = ev.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("g").alias("s"),
        ).collect()[0]
        return f"{row['n']}:{row['s']}"

    # -- store layout ----------------------------------------------------------

    @property
    def _eval_path(self) -> str:
        return os.path.join(self.store_path, "eval_shingles")

    @property
    def _flags_path(self) -> str:
        return os.path.join(self.store_path, "flags")

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.store_path, "_commits", str(batch_id))

    # -- foreachBatch body -----------------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        """Shingle the batch, probe the frozen eval set, append (via
        per-batch overwrite) the touching documents' flags."""
        if os.path.exists(self._marker(batch_id)):
            return
        spark = batch.sparkSession
        from ..operators.dedup import decontaminate_flags

        ev = spark.read.parquet(self._eval_path).select(
            F.array(F.col("g")).alias("_sh")
        )
        flags = decontaminate_flags(
            self._shingle(batch), ev, self.id_col, "_sh"
        )
        flags.withColumn("_batch", F.lit(int(batch_id))).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy(
            "_batch"
        ).parquet(self._flags_path)
        self._commit(batch_id)

    def _commit(self, batch_id: int) -> None:
        os.makedirs(os.path.dirname(self._marker(batch_id)), exist_ok=True)
        open(self._marker(batch_id), "w").close()

    # -- drives ------------------------------------------------------------

    def run_available_now(self, stream_df: DataFrame, checkpoint: str) -> None:
        """Drain all pending input (AvailableNow, R21)."""
        q = (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # -- reads -------------------------------------------------------------

    def flags(self, spark: SparkSession) -> DataFrame:
        """All maintained (id, n_shared) rows — every drained document
        sharing ≥ 1 eval shingle, exactly the batch
        ``decontaminate_flags`` output over all documents seen."""
        from .compaction import dataset_present

        dataset_present(self._flags_path)
        try:
            return spark.read.parquet(self._flags_path).select(
                self.id_col, "n_shared"
            )
        except Exception:
            from pyspark.sql import types as T

            return spark.createDataFrame(
                [],
                T.StructType(
                    [
                        T.StructField(self.id_col, T.LongType()),
                        T.StructField("n_shared", T.LongType()),
                    ]
                ),
            )
