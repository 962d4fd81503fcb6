"""Certified heavy hitters — exact top-k at 100 TB without shuffling
the full distinct-item set.

A plain ``groupBy(item).count()`` top-k shuffles one row per DISTINCT
item; on a web-scale n-gram column that shuffle (billions of distinct
keys) dwarfs the answer. The classic two-pass alternative:

1. **Local top-k'** per partition (Arrow ``mapInPandas``): each
   partition emits its k' most frequent items with their LOCAL counts,
   plus the partition's k'-th count t_i (the cap on anything it
   dropped). Output is k'·partitions rows — tiny.
2. **Exact recount** of the candidate union: broadcast-semi-join the
   candidates against the item stream, one small groupBy, exact global
   counts, total-order top-k.

**Certification** makes the result provably exact rather than
approximate: an item absent from EVERY partition's local top-k' has
global count ≤ Σ t_i (it was below the local threshold everywhere).
If the k-th exact candidate count exceeds that bound, no non-candidate
can displace it — the top-k is certified exact, and the operator
raises otherwise (raise k'). On Zipf-distributed text the bound is
loose by orders of magnitude, so modest k' certifies easily.

This is the SpaceSaving/Misra-Gries shape with per-partition exact
counting; a strict-memory MG summary can replace step 1's
``value_counts`` if per-partition distinct counts outgrow executor
memory, with the same merge/certify contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["certified_topk"]


def certified_topk(
    items: DataFrame, item_col: str, k: int, local_k: int = 1024
) -> DataFrame:
    """Exact, certified top-``k`` (count DESC, item ASC) of a
    one-column item stream. Raises if exactness cannot be certified at
    this ``local_k``."""
    if k <= 0 or local_k < k:
        raise ValueError("need 0 < k <= local_k")
    import pandas as pd

    def local_counts(batches):
        acc: dict[str, int] = {}
        for pdf in batches:
            for item, n in pdf[item_col].value_counts().items():
                acc[item] = acc.get(item, 0) + int(n)
        if not acc:
            return
        s = pd.Series(acc).sort_values(ascending=False)
        top = s.iloc[:local_k]
        # t = the partition's k'-th count: an upper bound on every item
        # this partition did NOT report. 0 when nothing was dropped.
        t = int(top.iloc[-1]) if len(s) > local_k else 0
        yield pd.DataFrame(
            {item_col: top.index, "cnt": top.to_numpy(), "t": t}
        )

    local = items.mapInPandas(
        local_counts, schema=f"{item_col} string, cnt long, t long"
    ).persist()
    try:
        # Σ t_i over partitions. mapInPandas is narrow, so each output
        # partition holds exactly one local_counts emission (its input
        # partition's rows, all carrying the same t) — one t per
        # partition id is that partition's dropped-item cap.
        total_bound = (
            local.select(F.spark_partition_id().alias("_pid"), "t")
            .groupBy("_pid")
            .agg(F.max("t").alias("t"))
            .agg(F.sum("t").alias("bound"))
        )

        candidates = local.select(item_col).distinct()
        exact = (
            items.join(F.broadcast(candidates), item_col, "left_semi")
            .groupBy(item_col)
            .agg(F.count(F.lit(1)).alias("n"))
        )
        topk = exact.orderBy(F.col("n").desc(), F.col(item_col)).limit(k)

        # k rows + one scalar — driver-side metadata, not a data collect.
        rows = topk.collect()
        b = total_bound.first()["bound"] or 0
        kth = rows[-1]["n"] if len(rows) == k else 0
        if b > 0 and kth <= b:
            raise ValueError(
                f"top-{k} not certifiable: k-th count {kth} <= missed-item "
                f"bound {b}; raise local_k (was {local_k})"
            )
    finally:
        local.unpersist()
    spark = items.sparkSession
    return spark.createDataFrame(rows, schema=f"{item_col} string, n long")
