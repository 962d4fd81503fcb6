"""Interval (range-overlap) join, Spark-first.

Spark has no native interval-join physical operator: a raw
``a.lo <= b.ts AND b.ts <= a.hi`` theta join falls back to
BroadcastNestedLoopJoin (quadratic work, one task per broadcast
partition — unusable at 100 TB). The standard distributed re-expression
is BIN BUCKETING (the same trick Structured Streaming uses internally
for stream-stream time-interval joins, and DataFusion/Flink expose as
range-bin join):

1. pick a bin width >= a typical interval length;
2. each INTERVAL row is emitted once per bin its [lo, hi] span covers
   (``sequence(floor(lo/w), floor(hi/w))`` — a small constant fan-out
   when intervals are short relative to the bin);
3. each POINT row lands in exactly ONE bin (``floor(ts/w)``);
4. equi-join on the bin + residual range predicate.

Because the point side has a unique bin per row, every qualifying
(point, interval) pair meets in exactly one bin — no post-join dedup
needed. Catalyst runs a plain shuffled/broadcast HASH join on the bin
key; AQE handles bin skew (hot time windows) like any other hot key.

Scale knobs: bin width trades fan-out (wide bins -> fewer duplicate
interval rows) against join selectivity (narrow bins -> fewer false
candidates filtered by the residual predicate). At 100 TB pick
``bin_width ~ p95 interval length`` so interval fan-out stays <= ~2x.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_point_join"]


def _micros(c: Column) -> Column:
    return F.unix_micros(c)


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo: str,
    hi: str,
    bin_width_s: int = 600,
    extra_on: Column | None = None,
) -> DataFrame:
    """All (point, interval) pairs with ``lo <= point_ts <= hi``
    (inclusive bounds), via the bin-bucketed equi-join above — never a
    nested-loop join. ``extra_on`` adds a residual predicate evaluated
    after the bin match (e.g. key equality or anti-self-match).

    Returns points' columns + intervals' columns; callers project /
    aggregate from there. Column names must be disjoint. The two sides
    are aliased ``_p`` (points) and ``_i`` (intervals) so self-joins
    resolve unambiguously; ``extra_on`` may reference those aliases.
    """
    w = F.lit(int(bin_width_s) * 1_000_000)
    bi = intervals.withColumn(
        "_bin_i",
        F.explode(
            F.sequence(
                F.floor(_micros(F.col(lo)) / w), F.floor(_micros(F.col(hi)) / w)
            )
        ),
    ).alias("_i")
    bp = points.withColumn("_bin_p", F.floor(_micros(F.col(point_ts)) / w)).alias("_p")
    cond = (
        (F.col("_p._bin_p") == F.col("_i._bin_i"))
        & (F.col(f"_p.{point_ts}") >= F.col(f"_i.{lo}"))
        & (F.col(f"_p.{point_ts}") <= F.col(f"_i.{hi}"))
    )
    if extra_on is not None:
        cond = cond & extra_on
    return bp.join(bi, cond, "inner").drop("_bin_p", "_bin_i")
