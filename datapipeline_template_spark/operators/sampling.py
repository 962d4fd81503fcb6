"""Deterministic sampling operators for training-data pipelines.

`df.sample()` is seed-dependent *per partition layout* — the same seed
on a different file split yields a different sample, which breaks
reproducibility the moment a 100 TB corpus is re-compacted. These
operators hash a stable key instead: membership depends only on the
row's key, so the sample is identical across runs, partitionings,
engines — and oracle-replayable in plain SQL (the driver checks q35).

The hash is a Knuth multiplicative step mod the engine's poly prime:
(key * 2654435761) % p — key magnitudes up to ~3.4e3 * p stay inside
int64, and both Spark and DuckDB evaluate it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import POLY_P

__all__ = [
    "sample_hash_bucket",
    "deterministic_sample",
    "stratified_sample",
    "quota_sample",
]

_KNUTH = 2_654_435_761


def sample_hash_bucket(key: Column | str, p: int = POLY_P) -> Column:
    """Stable pseudo-uniform bucket in [0, p) from an integer key."""
    c = F.col(key) if isinstance(key, str) else key
    return (c.cast("long") * F.lit(_KNUTH)) % F.lit(p)


def deterministic_sample(df: DataFrame, key: str, rate: float) -> DataFrame:
    """Keep rows whose key-hash falls below rate·p — a reproducible
    ~rate sample, stable under repartitioning/compaction and pure
    filter pushdown (no shuffle, no RNG state)."""
    return df.where(sample_hash_bucket(key) < F.lit(int(rate * POLY_P)))


def stratified_sample(df: DataFrame, key: str, stratum_col: str, rates: dict[str, float]) -> DataFrame:
    """Per-stratum hash sampling: each stratum gets its own rate
    (missing strata default to 0 — dropped). The membership test stays
    a scalar predicate, so Catalyst can still push it down; no
    per-group shuffle, unlike `sampleBy` which is also seed-unstable."""
    bucket = sample_hash_bucket(key)
    thresh = F.lit(0).cast("long")
    expr = None
    for stratum, rate in rates.items():
        cond = F.col(stratum_col) == F.lit(stratum)
        t = F.lit(int(rate * POLY_P))
        expr = F.when(cond, t) if expr is None else expr.when(cond, t)
    thresh = expr.otherwise(F.lit(0)) if expr is not None else thresh
    return df.where(bucket < thresh)


def quota_sample(
    df: DataFrame,
    key: str,
    stratum_col: str,
    quotas: dict[str, int],
    default_quota: int = 0,
) -> DataFrame:
    """EXACT-size per-stratum sample: the first ``quotas[stratum]``
    rows of each stratum in stable key-hash order — how a fixed-size
    eval set is drawn (\"exactly 500 docs per source\") when a rate
    can't guarantee the count.

    Ordering is (key-hash, key): pseudo-random but fully deterministic
    across runs, partitionings, and engines — and because it's a total
    order, the chosen set is too. Strata smaller than their quota keep
    every row. Rate-based ``stratified_sample`` stays the scale
    default (pure scan-side filter, no shuffle); the quota form pays
    ONE hash shuffle on the stratum for its rank window, which is the
    unavoidable cost of an exact count. Quotas are per-stratum row
    caps — far under window-sort pressure even on a skewed stratum,
    since rank is computed streaming over the sorted partition.
    """
    if any(q < 0 for q in quotas.values()) or default_quota < 0:
        raise ValueError("quotas must be non-negative")
    from pyspark.sql import Window

    bucket = sample_hash_bucket(key)
    expr = None
    for stratum, q in quotas.items():
        cond = F.col(stratum_col) == F.lit(stratum)
        t = F.lit(int(q))
        expr = F.when(cond, t) if expr is None else expr.when(cond, t)
    quota = expr.otherwise(F.lit(int(default_quota))) if expr is not None else F.lit(
        int(default_quota)
    )
    w = Window.partitionBy(stratum_col).orderBy(bucket.asc(), F.col(key).asc())
    # Collision-safe rank name: never clobber a caller's column.
    rank_col = "_rank"
    while rank_col in df.columns:
        rank_col += "_"
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= quota)
        .drop(rank_col)
    )
