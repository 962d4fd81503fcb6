"""Streaming IVF-PQ index maintenance — the ninth incremental family.

The retrieval index ss21 builds (coarse cell + m PQ codes per vector,
``operators/clustering.py`` ``ivf_pq_adc_topk``) has the same
write-once property the assignment families exploit: under FROZEN
coarse centroids and FROZEN codebooks, a vector's cell and codes never
change, so a growing corpus never re-encodes anything — each
micro-batch encodes only its own rows and appends them to the
maintained index. Searches then run against the maintained table with
zero recompute of the indexed mass: exactly how a production ANN
index ingests (FAISS `add()` after `train()`).

Contract (the dd09 equivalence discipline shared by all nine
families):

- ``index(spark)`` == batch ``pq_encode`` + ``kmeans_assign`` over
  every vector drained so far (equivalence test in
  tests/test_streaming.py).
- ``search(...)`` over the maintained index == ``ivf_pq_adc_topk``
  over the batch-built index — the retrieval the index exists for.
- Replays no-op (committed-batch markers); a crash window (marker
  lost after data landed) self-repairs via the idempotent dynamic
  ``_batch`` partition overwrite; a maintainer re-created with
  different frozen artifacts refuses the store loudly.

Reference parity: the reference pipeline has no ANN surface; this is
the LLM-training-data extension stack (similarity-search maintenance
for a continuously ingested corpus).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import quantize_vec
from ..operators.clustering import ivf_pq_adc_topk, kmeans_assign, pq_encode
from .kmeans import _has_parquet_files

__all__ = ["IncrementalIvfPq"]


class IncrementalIvfPq:
    """Maintains the IVF-PQ index table (id, cluster, c0..c{m-1}) from
    a stream of (id, vector) rows against FROZEN coarse centroids and
    PQ codebooks, one micro-batch at a time."""

    def __init__(
        self,
        store_path: str,
        coarse_centroids: list[list[int]],
        codebooks: list[list[list[int]]],
        sub_dim: int = 8,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        self.store_path = store_path
        self.coarse = [[int(v) for v in cv] for cv in coarse_centroids]
        self.codebooks = [
            [[int(v) for v in cv] for cv in cb] for cb in codebooks
        ]
        self.sub_dim = int(sub_dim)
        self.id_col = id_col
        self.vec_col = vec_col
        self._persist_artifacts()

    # -- store layout ------------------------------------------------------

    @property
    def _index_path(self) -> str:
        return os.path.join(self.store_path, "index")

    @property
    def _artifact_path(self) -> str:
        return os.path.join(self.store_path, "artifacts.json")

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.store_path, "_commits", str(batch_id))

    def _persist_artifacts(self) -> None:
        """Frozen artifacts are part of the store: encoding is
        write-once ONLY under the same quantizers — a maintainer
        re-created with different centroids or codebooks would
        silently mix encoding regimes; fail loudly instead (the
        IncrementalKmeansAssign centroid-guard convention)."""
        os.makedirs(self.store_path, exist_ok=True)
        payload = {
            "coarse": self.coarse,
            "codebooks": self.codebooks,
            "sub_dim": self.sub_dim,
        }
        if os.path.exists(self._artifact_path):
            with open(self._artifact_path) as f:
                stored = json.load(f)
            if stored != payload:
                raise ValueError(
                    "store was built with different frozen artifacts "
                    "(coarse centroids / codebooks / sub_dim); the PQ "
                    "encoding is write-once only under identical "
                    "quantizers — re-training requires a full rebuild "
                    "into a fresh store_path"
                )
        else:
            tmp = self._artifact_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(payload, f)
            os.replace(tmp, self._artifact_path)

    # -- foreachBatch body -------------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        if os.path.exists(self._marker(batch_id)):
            return
        m = len(self.codebooks)
        cells = kmeans_assign(
            batch.select(
                F.col(self.id_col).alias("vec_id"),
                quantize_vec(F.col(self.vec_col)).alias("_cq"),
            ),
            "_cq",
            self.coarse,
        ).select("vec_id", "cluster")
        codes = pq_encode(
            batch, self.id_col, self.vec_col, self.codebooks, self.sub_dim
        )
        row = codes.join(cells, "vec_id").select(
            "vec_id", "cluster", *[f"c{j}" for j in range(m)]
        )
        row.withColumn("_batch", F.lit(int(batch_id))).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy(
            "_batch"
        ).parquet(self._index_path)
        self._commit(batch_id)

    def _commit(self, batch_id: int) -> None:
        os.makedirs(os.path.dirname(self._marker(batch_id)), exist_ok=True)
        open(self._marker(batch_id), "w").close()

    # -- drives ------------------------------------------------------------

    def run_available_now(self, stream_df: DataFrame, checkpoint: str) -> None:
        """Drain all pending input (AvailableNow, R21), maintaining
        the index incrementally."""
        q = (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # -- reads -------------------------------------------------------------

    def _read_index(self, spark: SparkSession) -> DataFrame:
        """Internal read with the store's own column names (vec_id +
        cluster + codes). Empty-store handling gated on actual FILE
        presence (family convention)."""
        from pyspark.sql import types as T

        m = len(self.codebooks)
        cols = ["vec_id", "cluster", *[f"c{j}" for j in range(m)]]
        if _has_parquet_files(self._index_path):
            return spark.read.parquet(self._index_path).select(*cols)
        return spark.createDataFrame(
            [], T.StructType([T.StructField(c, T.LongType()) for c in cols])
        )

    def index(self, spark: SparkSession) -> DataFrame:
        """All maintained (id, cluster, c0..c{m-1}) rows, with the id
        column under the caller's ``id_col`` name."""
        out = self._read_index(spark)
        if self.id_col != "vec_id":
            out = out.withColumnRenamed("vec_id", self.id_col)
        return out

    def search(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int = 5,
        n_probe: int = 2,
    ) -> DataFrame:
        """ADC top-k retrieval over the maintained index — the read
        the index exists for, with zero recompute of the indexed mass.
        ``queries`` carries (id_col, vec_col) rows; the routed
        candidate join and scoring are exactly ``ivf_pq_adc_topk``."""
        return ivf_pq_adc_topk(
            self._read_index(spark),
            queries,
            self.id_col,
            self.vec_col,
            self.coarse,
            self.codebooks,
            sub_dim=self.sub_dim,
            k=k,
            n_probe=n_probe,
        )
