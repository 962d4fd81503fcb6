"""Streaming prefix-filter similarity-join maintenance — the
incremental form of dd21's exact Jaccard join (operators/dedup.py
prefix_rows / verify_jaccard_candidates), the dd09 incremental-LSH
argument applied to the SSJoin/PPJoin index.

The batch prefix filter orders elements by corpus-wide document
frequency — a GLOBAL artifact that would change every stored set's
prefix as new data arrives. The streamable form FREEZES the order
(the frozen-classifier / frozen-decon-eval-set pattern): the prefix
lemma needs only a total order COMMON to all sets, not the true
frequencies, so a frozen order preserves recall 1.0 EXACTLY — every
pair with Jaccard ≥ t still shares a prefix element — while
frequency drift degrades only candidate VOLUME (elements that grew
common since the freeze keep blocking as if rare, generating extra
candidates the verifier then rejects). That split — guarantee
intact, efficiency measurable — is what makes the index honestly
maintainable; re-freeze and rebuild when the measured candidate
ratio drifts past budget.

Under a frozen order each set's prefix is a pure function of the set
alone, so a batch reduces to its own ``(doc, prefix-element)`` rows
plus its ``(doc, set)`` verification arrays — both written to
``_batch`` partitions with the uniform marker discipline
(crash-after-write replays rewrite identical partitions). ``pairs()``
self-joins the accumulated prefix rows and verifies against the
stored sets: equal to the batch operator with the same frozen order
over the union of drained batches at ANY drain point
(equivalence-tested). ``new_pairs(batch_id)`` restricts one side to
a single batch — the dd09 new×(corpus∪new) shape that never re-pairs
the old corpus against itself.

Parameter guard: (t_milli, columns) and a FINGERPRINT of the frozen
order are pinned in store metadata — prefixes cut under different
orders or thresholds must never meet in one index.

Scale: prefix rows are ≤ |set| per doc (typically ≪ — the point of
the filter); the candidate join is an equi-join on rare-by-frozen-
order elements; verification arrays are fetched per candidate id
only.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["IncrementalPrefixJoin"]


class IncrementalPrefixJoin:
    """Maintains a frozen-order prefix-filter index for a growing
    stream of (id: long, set: array<long>) rows; exact Jaccard ≥ t
    pairs on demand."""

    def __init__(
        self,
        store_path: str,
        id_col: str = "doc_id",
        set_col: str = "shingles",
        t_milli: int = 500,
    ) -> None:
        if not 0 < t_milli <= 1000:
            raise ValueError("t_milli must be in (0, 1000]")
        self.store_path = store_path
        self.id_col = id_col
        self.set_col = set_col
        self.t_milli = t_milli
        self._meta_path = os.path.join(store_path, "prefix_meta.json")
        meta = {"t_milli": t_milli, "id_col": id_col, "set_col": set_col}
        if os.path.exists(self._meta_path):
            stored = json.load(open(self._meta_path))
            if {k: stored[k] for k in meta} != meta:
                raise ValueError(
                    f"store at {store_path} was built with {stored}; got "
                    f"{meta} — prefixes cut under different thresholds or "
                    "columns must never meet in one index"
                )
        else:
            os.makedirs(store_path, exist_ok=True)
            with open(self._meta_path, "w") as f:
                json.dump(meta, f)

    # -- store layout ------------------------------------------------------

    @property
    def _order_path(self) -> str:
        return os.path.join(self.store_path, "order")

    @property
    def _prefix_path(self) -> str:
        return os.path.join(self.store_path, "prefix")

    @property
    def _sets_path(self) -> str:
        return os.path.join(self.store_path, "sets")

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.store_path, "_commits", str(batch_id))

    # -- frozen order ------------------------------------------------------

    @staticmethod
    def _order_fingerprint(order: DataFrame) -> dict:
        row = order.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.coalesce(
                F.sum(
                    (F.col("_s") % 1_000_003) * (F.col("_df") % 1_000_003)
                    % 2_147_483_647
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("chk"),
        ).first()
        return {"order_n": row["n"], "order_chk": row["chk"]}

    def freeze_order(self, order: DataFrame) -> None:
        """Pin the element order: a ``(_s, _df)`` frequency frame
        (typically the reference corpus's document frequencies).
        Refuses to re-freeze a DIFFERENT order over an existing store
        — every stored prefix was cut under the first one. Re-freezing
        the identical frame (same fingerprint) is a no-op, so replays
        of an init script are safe."""
        dup = (
            order.groupBy("_s")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") > 1)
            .count()
        )
        if dup:
            raise ValueError(
                f"order frame has {dup} duplicate _s keys — a duplicate "
                "would multiply every prefix row through the frequency "
                "join; aggregate to one (_s, _df) row per element first"
            )
        fp = self._order_fingerprint(order)
        meta = json.load(open(self._meta_path))
        if "order_n" in meta:
            if {k: meta[k] for k in fp} != fp:
                raise ValueError(
                    "store already has a frozen order with fingerprint "
                    f"{({k: meta[k] for k in fp})}; got {fp} — rebuild "
                    "into a fresh store to change the order"
                )
            return
        order.select("_s", "_df").write.mode("overwrite").parquet(
            self._order_path
        )
        meta.update(fp)
        with open(self._meta_path, "w") as f:
            json.dump(meta, f)

    def _frozen_order(self, spark: SparkSession) -> DataFrame:
        if "order_n" not in json.load(open(self._meta_path)):
            raise ValueError(
                "no frozen order: call freeze_order(...) before draining "
                "batches — prefixes are only comparable under ONE order"
            )
        from pyspark.sql import types as T

        return spark.read.schema(
            T._parse_datatype_string("_s bigint, _df bigint")
        ).parquet(self._order_path)

    # -- foreachBatch body -------------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        """Reduce the batch to its prefix rows (under the frozen
        order) + verification sets and land both in the batch's own
        partitions. Pure function of (batch, frozen order) —
        replay-idempotent."""
        if os.path.exists(self._marker(batch_id)):
            return
        from ..operators.dedup import prefix_rows

        order = self._frozen_order(batch.sparkSession)
        pref = prefix_rows(
            batch, self.id_col, self.set_col, self.t_milli, order=order
        )
        pref.withColumn("_batch", F.lit(int(batch_id))).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy(
            "_batch"
        ).parquet(self._prefix_path)
        sets = batch.select(
            F.col(self.id_col).alias("_vid"),
            F.array_distinct(F.col(self.set_col)).alias("_vset"),
        )
        sets.withColumn("_batch", F.lit(int(batch_id))).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy(
            "_batch"
        ).parquet(self._sets_path)
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

    def _read(self, spark: SparkSession, path: str, schema: str) -> DataFrame:
        from pyspark.sql import types as T

        from .compaction import dataset_present

        if not dataset_present(path):
            return spark.createDataFrame([], T._parse_datatype_string(schema))
        return (
            spark.read.schema(T._parse_datatype_string(schema + ", _batch int"))
            .parquet(path)
        )

    def pairs(self, spark: SparkSession) -> DataFrame:
        """All verified Jaccard ≥ t pairs over every drained row —
        equal to the batch prefix_filter_pairs with the same frozen
        order (equivalence-tested). Prefix rows self-join (equi, on
        the element), sets fetched per candidate id.

        A doc id re-sent in a LATER batch (at-least-once delivery
        under a new batch_id, which the marker discipline cannot
        collapse) lands duplicate rows in both stores; candidates are
        distinct'd and the sets read is distinct'd here, so the
        verify join emits each pair ONCE (re-send equivalence
        test-pinned). The contract assumes a re-sent id carries the
        IDENTICAL set — two different sets under one id are a
        producer bug this index cannot reconcile."""
        from ..operators.dedup import verify_jaccard_candidates

        pref = self._read(spark, self._prefix_path, "_id bigint, _s bigint").drop(
            "_batch"
        ).localCheckpoint(eager=True)
        cand = (
            pref.alias("a")
            .join(pref.alias("b"), "_s")
            .where(F.col("a._id") < F.col("b._id"))
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .distinct()
        )
        sets = self._read(
            spark, self._sets_path, "_vid bigint, _vset array<bigint>"
        ).drop("_batch").distinct()
        return verify_jaccard_candidates(cand, sets, self.t_milli)

    def new_pairs(self, spark: SparkSession, batch_id: int) -> DataFrame:
        """Pairs with at least one side in ``batch_id`` — the dd09
        new×(corpus∪new) incremental shape: the old corpus is never
        re-paired against itself."""
        from ..operators.dedup import verify_jaccard_candidates

        pref = self._read(spark, self._prefix_path, "_id bigint, _s bigint")
        newp = pref.where(F.col("_batch") == batch_id).drop("_batch")
        allp = pref.drop("_batch")
        cand = (
            newp.alias("a")
            .join(allp.alias("b"), "_s")
            .where(F.col("a._id") != F.col("b._id"))
            .select(
                F.least(F.col("a._id"), F.col("b._id")).alias("id_a"),
                F.greatest(F.col("a._id"), F.col("b._id")).alias("id_b"),
            )
            .distinct()
        )
        sets = self._read(
            spark, self._sets_path, "_vid bigint, _vset array<bigint>"
        ).drop("_batch").distinct()
        return verify_jaccard_candidates(cand, sets, self.t_milli)
