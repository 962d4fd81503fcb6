"""Temporal queries (tj*) — as-of join and cascade rollups over the
events feed.

The as-of join is the canonical time-series operator the reference
family exposes (DuckDB ASOF JOIN is the oracle's native spelling);
`operators/asof.py` re-expresses it Spark-first as union + window
carry (one key shuffle, no theta join, fan-out independent).
`operators/rollup.py` adds continuous-aggregate cascades (coarse
levels re-aggregate fine ones — raw scanned once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import cents
from ..operators.asof import asof_join
from ..operators.rollup import cascade_rollup
from . import register

# ---------------------------------------------------------------------------
# tj01 — for every event, the most recent STRICTLY-PRIOR click by the
# same user (strict boundary: an event never matches itself).
# ---------------------------------------------------------------------------

_TJ01_ORACLE = """
WITH clicks AS (
  SELECT user_id, ts, MAX(event_id) AS click_id
  FROM events
  WHERE event_type = 'click'
  GROUP BY user_id, ts
)
SELECT e.event_id, e.user_id, e.ts, c.ts AS prev_ts, c.click_id AS prev_click_id
FROM events e
ASOF LEFT JOIN clicks c
  ON e.user_id = c.user_id AND e.ts > c.ts
"""


@register("tj01_asof_prev_click", oracle=_TJ01_ORACLE)
def tj01_asof_prev_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, strict `<` boundary, left semantics (events with no
    prior click keep NULLs). The right side is pre-aggregated unique
    per (user_id, ts) so tie resolution is engine-independent."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    clicks = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    return asof_join(
        ev,
        clicks,
        keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["click_id"],
        how="left",
        strict=True,
        prefix="prev_",
    )


# ---------------------------------------------------------------------------
# tj02 — cascade rollup: month level derived hour → day → month; the
# oracle aggregates straight from raw, so the value-hash PROVES the
# re-aggregation is exact (decomposable measures, integer cents).
# ---------------------------------------------------------------------------

_TJ02_ORACLE = """
SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS bucket,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       CAST(MIN(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS min_cents,
       CAST(MAX(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS max_cents
FROM events
GROUP BY 1, 2
"""


@register("tj02_cascade_rollup", oracle=_TJ02_ORACLE)
def tj02_cascade_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate cascade: monthly per-type stats computed
    hour → day → month (each level re-aggregates the previous one; raw
    scanned once), hash-checked against the oracle's direct
    month-from-raw aggregate — exactness of the re-aggregation is the
    assertion, not just the final numbers."""
    ev = table(spark, sf_dir, "events").select(
        "ts", "event_type", cents("value").alias("vc")
    )
    levels = cascade_rollup(
        ev,
        ts_col="ts",
        keys=["event_type"],
        measures={
            "n_events": ("count", F.lit(1)),
            "value_cents": ("sum", F.col("vc")),
            "min_cents": ("min", F.col("vc")),
            "max_cents": ("max", F.col("vc")),
        },
        levels=("hour", "day", "month"),
    )
    return levels["month"]


# ---------------------------------------------------------------------------
# tj03 — interval-overlap join: concurrent-event counts (±10 minutes)
# ---------------------------------------------------------------------------

_TJ03_ORACLE = """
SELECT a.event_id,
       CAST(count(*) - 1 AS BIGINT) AS n_concurrent
FROM events a JOIN events b
  ON b.ts >= a.ts - INTERVAL 10 MINUTE
 AND b.ts <= a.ts + INTERVAL 10 MINUTE
GROUP BY a.event_id
"""


@register("tj03_interval_join", oracle=_TJ03_ORACLE)
def tj03_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event, how many OTHER events (any user) fall within
    ±10 minutes — the interval-overlap join Spark lacks natively,
    re-expressed as operators.interval.interval_point_join's
    bin-bucketed equi-join (bin = the 10-minute radius, so each
    interval spans <= 3 bins). A theta-join spelling would run as a
    BroadcastNestedLoopJoin — quadratic and unusable at 100 TB.

    Each event always matches its own interval, so the inner join
    keeps every event and ``count - 1`` is the concurrent count —
    zero-neighbor events still get a row."""
    from ..operators.interval import interval_point_join

    ev = table(spark, sf_dir, "events")
    points = ev.select(F.col("event_id").alias("p_event_id"), "ts")
    intervals = ev.select(
        (F.col("ts") - F.expr("INTERVAL 10 MINUTES")).alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("hi"),
    )
    joined = interval_point_join(points, intervals, "ts", "lo", "hi", bin_width_s=600)
    return (
        joined.groupBy("p_event_id")
        .agg((F.count(F.lit(1)) - F.lit(1)).cast("long").alias("n_concurrent"))
        .select(F.col("p_event_id").alias("event_id"), "n_concurrent")
    )
