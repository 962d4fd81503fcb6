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


# ---------------------------------------------------------------------------
# tj04 — daily gap-fill + LOCF (time-series resample). Registered in the
# registry OVERFLOW section.
# ---------------------------------------------------------------------------

_TJ04_ORACLE = """
WITH ev AS (
  SELECT user_id, ts, arg_max(value, event_id) AS value, MAX(event_id) AS event_id
  FROM events GROUP BY user_id, ts
), bounds AS (
  SELECT user_id,
         CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS d0,
         CAST(date_trunc('day', MAX(ts)) AS TIMESTAMP) AS d1
  FROM events GROUP BY user_id
), grid AS (
  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS TIMESTAMP) AS day
  FROM bounds
), probe AS (
  SELECT user_id, day, day + INTERVAL 1 DAY AS probe_ts FROM grid
), counts AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id, CAST(date_trunc('day', ts) AS TIMESTAMP)
), filled AS (
  SELECT p.user_id, p.day, e.value AS locf_value, e.event_id AS locf_event_id
  FROM probe p ASOF LEFT JOIN ev e
    ON p.user_id = e.user_id AND p.probe_ts > e.ts
)
SELECT f.user_id, f.day, f.locf_value, f.locf_event_id,
       COALESCE(c.n_events, 0) AS n_events,
       COALESCE(c.n_events, 0) = 0 AS is_gap
FROM filled f LEFT JOIN counts c ON f.user_id = c.user_id AND f.day = c.day
"""


@register("tj04_gapfill_locf", oracle=_TJ04_ORACLE)
def tj04_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample: a dense per-user DAILY grid from first to
    last active day (in-plan `sequence` explode — no driver loop),
    each day carrying the user's latest event value through end-of-day
    (LOCF via the engine's as-of join, strict `ts < day+1`), plus the
    day's event count and a gap flag. The gap-fill/LOCF pair is the
    continuous-aggregate companion (tj02 rolls up what exists; tj04
    materializes what's missing). Ties at identical ts are pre-reduced
    with arg_max(event_id) so the carried value is a deterministic
    total order, not partition luck. Carried doubles are VALUES, not
    float aggregates — byte-identical across engines."""
    from ..operators.asof import asof_join

    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    # One row per (user, ts): carry the max-event_id row's value.
    dedup = ev.groupBy("user_id", "ts").agg(
        F.max(F.struct("event_id", "value")).alias("_m")
    ).select(
        "user_id", "ts", F.col("_m.value").alias("value"),
        F.col("_m.event_id").alias("event_id"),
    )
    day = lambda c: F.date_trunc("day", F.col(c))  # noqa: E731
    bounds = ev.groupBy("user_id").agg(
        F.min(day("ts")).alias("d0"), F.max(day("ts")).alias("d1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    probe = grid.withColumn("probe_ts", F.col("day") + F.expr("interval 1 day"))
    filled = asof_join(
        probe, dedup, keys=["user_id"], left_ts="probe_ts", right_ts="ts",
        value_cols=["value", "event_id"], strict=True,
    )
    counts = ev.groupBy("user_id", day("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    out = filled.join(counts, ["user_id", "day"], "left")
    return out.select(
        "user_id",
        "day",
        F.col("r_value").alias("locf_value"),
        F.col("r_event_id").alias("locf_event_id"),
        F.coalesce("_n", F.lit(0)).cast("long").alias("n_events"),
        (F.coalesce("_n", F.lit(0)) == 0).alias("is_gap"),
    )


# ---------------------------------------------------------------------------
# tj05 — nearest-event join: for each purchase, the closest click in
# EITHER direction (operators/asof.py asof_join_nearest — the
# bidirectional sibling backward-only ASOF cannot express)
# ---------------------------------------------------------------------------

_TJ05_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN event_type = 'click'
              THEN struct_pack(cts := ts, cid := event_id) END AS cp
  FROM events WHERE event_type IN ('click', 'purchase')
), win AS (
  SELECT user_id, event_id, ts, event_type,
         LAST_VALUE(cp IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY ts, CASE WHEN event_type = 'click' THEN 0 ELSE 1 END,
                    event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
         FIRST_VALUE(cp IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY ts, CASE WHEN event_type = 'click' THEN 0 ELSE 1 END,
                    event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next
  FROM e
), chosen AS (
  SELECT user_id, event_id, ts,
         CASE WHEN prev IS NULL
                OR (next IS NOT NULL
                    AND (epoch_ns((next).cts) - epoch_ns(ts)) // 1000
                        < (epoch_ns(ts) - epoch_ns((prev).cts)) // 1000)
              THEN next ELSE prev END AS cp,
         CASE WHEN prev IS NULL
                OR (next IS NOT NULL
                    AND (epoch_ns((next).cts) - epoch_ns(ts)) // 1000
                        < (epoch_ns(ts) - epoch_ns((prev).cts)) // 1000)
              THEN (epoch_ns((next).cts) - epoch_ns(ts)) // 1000
              ELSE (epoch_ns(ts) - epoch_ns((prev).cts)) // 1000 END AS gap
  FROM win WHERE event_type = 'purchase'
)
SELECT user_id, event_id, ts,
       (cp).cts AS n_ts, (cp).cid AS n_click_id,
       CAST(gap AS BIGINT) AS n_gap
FROM chosen
ORDER BY event_id
"""


@register("tj05_nearest_click", oracle=_TJ05_ORACLE)
def tj05_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the NEAREST same-user click in either
    direction (|Δt| minimized, exact ties prefer the at-or-before
    side) — the bidirectional temporal join tj01's backward-only ASOF
    cannot express, and the shape attribution/sensor-fusion workloads
    actually want ("which click does this purchase belong to" is a
    nearest question, not a latest-before question: a click 2 s AFTER
    the purchase event — clock skew, out-of-order ingestion — beats
    one 2 h before). operators/asof.py asof_join_nearest runs ONE
    union + ONE user-keyed sort serving BOTH directional carries
    (running last for at-or-before, first-over-following for
    strictly-after — two frames, same sort, no second exchange, and
    never a theta join; plan-guarded). The oracle deliberately keeps
    a different derivation — a single-table window over the typed
    event stream — so two formulations cross-check (the w10
    discipline). Gaps are exact integer microseconds (epoch_ns // 1e3
    == unix_micros on this µs-aligned feed, the w09 argument)."""
    from ..operators.asof import asof_join_nearest

    ev = table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("cts"),
        F.col("event_id").alias("cid"),
    )
    out = asof_join_nearest(
        purchases, clicks, ["user_id"], "ts", "cts", ["cid"], prefix="n_"
    )
    return out.select(
        "user_id",
        "event_id",
        "ts",
        F.col("n_cts").alias("n_ts"),
        F.col("n_cid").alias("n_click_id"),
        F.col("n_gap").alias("n_gap"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# tj06 — the as-of join at 100 TB: BOTH sides through bucketed storage
# (q52's layout applied to the temporal join), zero query-time
# Exchange. Registered in OVERFLOW.
# ---------------------------------------------------------------------------


@register("tj06_bucketed_asof", oracle=_TJ01_ORACLE)
def tj06_bucketed_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tj01's EXACT semantics through the shuffle-free physical plan —
    the oracle is tj01's DuckDB ASOF JOIN verbatim, so the hash match
    proves the layout change is semantically invisible (the q52 /
    pipe22 rule: layout is physical, never semantic).

    Both sides land hash-bucketed + sorted on user_id
    (operators/layout.py write_bucketed), then the as-of answer comes
    from an equi-join WITH residual range predicate plus one keyed
    max_by — and NEITHER step shuffles: the sort-merge join reads two
    co-bucketed scans (zero Exchange below it, the q52 property), and
    its output keeps the left side's hash partitioning on user_id,
    which SATISFIES the aggregation's clustering requirement
    (grouping keys include user_id; Spark accepts a subset
    partitioning) — so the whole query-time plan carries ZERO
    hash-partition Exchanges, plan-guarded. Unmatched left rows
    surface NULL prev columns through the left join (their max_by
    ordering struct is all-NULL fields and alone in its group).

    The honest trade vs `asof_join` (union + window, tj01's path):
    this form fans out each event × its user's prior clicks inside
    the join before the max_by collapses it — ZERO shuffles but
    fan-out-DEPENDENT work; the union+window form pays exactly one
    key shuffle but is fan-out-independent. At 100 TB pick by shape:
    recurring as-of joins against a bucketed silver with bounded
    per-key right-side history → this form (the write-time shuffle is
    already amortized, queries touch no network); unbounded histories
    or one-shot joins → the window form. Write cost is the q52
    bucketed_join scenario's amortized story."""
    from ..operators.layout import write_bucketed

    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    clicks = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    write_bucketed(ev, "tj06_ev", ["user_id"], n_buckets=8, sort_cols=["user_id"])
    write_bucketed(
        clicks, "tj06_ck", ["user_id"], n_buckets=8, sort_cols=["user_id"]
    )
    left = spark.table("tj06_ev").alias("l")
    right = spark.table("tj06_ck").alias("r")
    j = left.hint("merge").join(
        right,
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts") < F.col("l.ts")),
        "left",
    )
    pay = F.struct(
        F.col("r.ts").alias("prev_ts"),
        F.col("r.click_id").alias("prev_click_id"),
    )
    order_key = F.struct(F.col("r.ts"), F.col("r.click_id"))
    return (
        j.groupBy(F.col("l.event_id"), F.col("l.user_id"), F.col("l.ts"))
        .agg(F.max_by(pay, order_key).alias("_p"))
        .select(
            F.col("event_id"),
            F.col("user_id"),
            F.col("ts"),
            F.col("_p.prev_ts").alias("prev_ts"),
            F.col("_p.prev_click_id").alias("prev_click_id"),
        )
    )
