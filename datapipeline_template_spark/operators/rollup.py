"""Cascade (multi-resolution) time rollups — continuous-aggregate
semantics: each coarser level re-aggregates the NEXT-FINER level, not
the raw feed.

This is the hypertable/continuous-aggregate pattern (TimescaleDB
continuous aggregates, Druid rollup segments): at 100 TB the hourly
table is ~5-6 orders of magnitude smaller than raw events, so
day/month levels cost almost nothing and raw is scanned exactly once.
Correctness requires every measure to be DECOMPOSABLE — sum/count/
min/max re-aggregate exactly (count re-aggregates as sum); averages
must be carried as (sum, count) and divided at read time.

In one Spark plan the cascade is a chain of hash aggregates: Catalyst
runs the raw→finest aggregate with a map-side partial, and each
re-aggregation reuses the previous level's (far smaller) output —
exactly the shuffle profile a 1000-executor run wants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cascade_rollup", "REAGG"]

# How each measure kind folds one level into the next.
REAGG = {
    "sum": F.sum,
    "count": F.sum,  # counts add up
    "min": F.min,
    "max": F.max,
}

_FIRST_AGG = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}


def cascade_rollup(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    measures: dict[str, tuple[str, Column]],
    levels: tuple[str, ...] = ("hour", "day", "month"),
) -> dict[str, DataFrame]:
    """Build one DataFrame per level, coarser levels derived from finer.

    ``measures``: out_name -> (kind, source column) with kind one of
    sum|count|min|max. Every level has columns (bucket, *keys,
    *measure names); ``bucket`` is ``date_trunc(level, ts)``.

    Returns {level: DataFrame} in cascade order. Only the first level
    touches ``df``; each next level aggregates the previous one — the
    dict lets callers persist/write intermediate levels (the cluster-
    scale shape: hourly is a stored table, day/month read it).
    """
    bad = [k for k, (kind, _) in measures.items() if kind not in _FIRST_AGG]
    if bad:
        raise ValueError(f"non-decomposable measure kind for {bad}; allowed {list(_FIRST_AGG)}")
    if not levels:
        raise ValueError("levels must be non-empty")

    finest = levels[0]
    cur = df.groupBy(
        F.date_trunc(finest, F.col(ts_col)).alias("bucket"), *[F.col(k) for k in keys]
    ).agg(*[_FIRST_AGG[kind](col).alias(name) for name, (kind, col) in measures.items()])
    out = {finest: cur}
    for lvl in levels[1:]:
        cur = cur.groupBy(
            F.date_trunc(lvl, F.col("bucket")).alias("bucket"), *[F.col(k) for k in keys]
        ).agg(
            *[REAGG[kind](F.col(name)).alias(name) for name, (kind, _) in measures.items()]
        )
        out[lvl] = cur
    return out
