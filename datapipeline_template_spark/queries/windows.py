"""Window-function query surface (SURVEY.md §2.2 X4, X5).

Ranking (row_number / dense_rank / ntile / percent_rank), analytic
(lag / first / last), and frame-based (moving aggregate, running
total) windows — the same Spark ``Window`` primitive the reference
uses for its keep-latest dedup
(`/root/reference/src/sdp_etl/transformations/02_silver_processing.py:120-126`),
generalized to a query surface.

Determinism: every ORDER BY inside a window carries a unique
tie-breaker column so ranks and frames agree bit-for-bit with the
DuckDB oracle; money frames aggregate integer cents.

Scale: a window's ``partitionBy`` is one hash shuffle; partitions are
per-key independent so AQE skew splitting applies. Avoid global
(unpartitioned) windows at 100 TB — none are used here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import cents
from . import register

# ---------------------------------------------------------------------------
# w01 — top-k per group via ranking window
# ---------------------------------------------------------------------------

_W01_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
"""


@register("w01_top_orders_per_customer", oracle=_W01_ORACLE)
def w01_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: the reference's dedup pattern
    (rank-then-filter) generalized to top-k."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# ---------------------------------------------------------------------------
# w02 — running total (cumulative frame)
# ---------------------------------------------------------------------------

_W02_ORACLE = """
SELECT user_id, event_id,
       CAST(SUM(CAST(ROUND(value*100) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/100.0
         AS running_value
FROM events
"""


@register("w02_running_user_value", oracle=_W02_ORACLE)
def w02_running_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-user spend: integer-cents prefix sums are
    order-exact, so the running values match any engine."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        (F.sum(cents("value")).over(w).cast("double") / F.lit(100.0)).alias("running_value"),
    )


# ---------------------------------------------------------------------------
# w03 — lag: inter-event gaps
# ---------------------------------------------------------------------------

_W03_ORACLE = """
SELECT user_id, event_id,
       CAST(date_diff('second',
            LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
            ts) AS BIGINT) AS gap_sec
FROM events
"""


@register("w03_event_gaps_lag", oracle=_W03_ORACLE)
def w03_event_gaps_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG analytic window: seconds since the user's previous event
    (NULL for the first event — null semantics preserved)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    gap = (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)).cast("long")
    return ev.select("user_id", "event_id", gap.alias("gap_sec"))


# ---------------------------------------------------------------------------
# w04 — ntile quartiles + dense_rank
# ---------------------------------------------------------------------------

_W04_ORACLE = """
SELECT c_custkey,
       CAST(NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS bal_quartile,
       CAST(DENSE_RANK() OVER (ORDER BY c_mktsegment) AS BIGINT) AS seg_rank
FROM customer
"""


@register("w04_customer_quartiles", oracle=_W04_ORACLE)
def w04_customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE and DENSE_RANK. Note: global (unpartitioned) windows force
    a single-partition sort — fine for a dimension table, never for a
    fact table at scale (documented anti-pattern)."""
    cust = table(spark, sf_dir, "customer")
    w_bal = Window.orderBy(F.col("c_acctbal"), F.col("c_custkey"))
    w_seg = Window.orderBy("c_mktsegment")
    return cust.select(
        "c_custkey",
        F.ntile(4).over(w_bal).cast("long").alias("bal_quartile"),
        F.dense_rank().over(w_seg).cast("long").alias("seg_rank"),
    )


# ---------------------------------------------------------------------------
# w05 — moving aggregate with a bounded row frame
# ---------------------------------------------------------------------------

_W05_ORACLE = """
SELECT user_id, event_id,
       CAST(SUM(CAST(ROUND(value*100) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         / 100.0 AS moving_avg_value
FROM events
"""


@register("w05_moving_avg_value", oracle=_W05_ORACLE)
def w05_moving_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average per user (bounded ROWS frame); exact-int
    numerator over frame count keeps it engine-independent."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    avg = F.sum(cents("value")).over(w).cast("double") / F.count(F.lit(1)).over(w) / F.lit(100.0)
    return ev.select("user_id", "event_id", avg.alias("moving_avg_value"))


# ---------------------------------------------------------------------------
# w06 — first/last value over full partition frame
# ---------------------------------------------------------------------------

_W06_ORACLE = """
SELECT DISTINCT user_id,
       FIRST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_event,
       LAST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event
FROM events
"""


@register("w06_first_last_event", oracle=_W06_ORACLE)
def w06_first_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST/LAST value with an explicit full-partition frame (the
    default frame would make LAST_VALUE see only up to current row)."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_event"),
        F.last("event_type").over(w).alias("last_event"),
    ).distinct()


# ---------------------------------------------------------------------------
# w07 — percent_rank / cume_dist
# ---------------------------------------------------------------------------

_W07_ORACLE = """
SELECT s_suppkey,
       PERCENT_RANK() OVER (ORDER BY s_acctbal, s_suppkey) AS bal_pct_rank,
       CUME_DIST() OVER (ORDER BY s_acctbal, s_suppkey) AS bal_cume_dist
FROM supplier
"""


@register("w07_supplier_percentiles", oracle=_W07_ORACLE)
def w07_supplier_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK / CUME_DIST: rank-derived ratios — exact rational
    numbers of row positions, so doubles agree across engines."""
    supp = table(spark, sf_dir, "supplier")
    w = Window.orderBy(F.col("s_acctbal"), F.col("s_suppkey"))
    return supp.select(
        "s_suppkey",
        F.percent_rank().over(w).alias("bal_pct_rank"),
        F.cume_dist().over(w).alias("bal_cume_dist"),
    )


# ---------------------------------------------------------------------------
# w08 — sessionization via window gaps (batch analog of streaming
#        session windows; see streaming module for the readStream form)
# ---------------------------------------------------------------------------

_W08_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts > COALESCE(
                LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                ts - INTERVAL 100 HOUR) + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT user_id, ts, event_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       CAST(MIN(ts) AS TIMESTAMP) AS session_start,
       CAST(MAX(ts) AS TIMESTAMP) AS session_end
FROM sessions
GROUP BY user_id, session_id
"""


@register("w08_sessionize_events", oracle=_W08_ORACLE)
def w08_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): LAG flags session
    starts, a running SUM assigns session ids, then aggregate. One
    shuffle on user_id serves both windows and the final groupBy."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts").over(w)
    new_session = F.when(
        prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTE")), 1
    ).otherwise(0)
    return (
        ev.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(wcum).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


# ---------------------------------------------------------------------------
# w09 — time-RANGE frame: trailing-hour per-user activity (the one
# frame type w01–w08 didn't exercise as a dedicated surface)
# ---------------------------------------------------------------------------

_W09_ORACLE = """
SELECT user_id, event_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing_hour,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT)
         AS sum_value_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


@register("w09_trailing_hour_range", oracle=_W09_ORACLE)
def w09_trailing_hour_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-hour activity via a time-RANGE window frame
    — the frame type a ROWS frame cannot express (w05's 3-row window
    counts rows; this one counts TIME: every same-user event in
    [ts − 1h, ts], however many there are). Spark needs a numeric
    ORDER BY for rangeBetween, so the frame runs over unix_micros(ts)
    with a ±3.6e9 µs bound — exactly DuckDB's
    `RANGE INTERVAL 1 HOUR PRECEDING` over the nanosecond timestamps
    because the generated events are µs-aligned (ns % 1000 == 0,
    verified; a sub-µs source would need the ns long column this
    repo's catalog exposes for events). RANGE frames include ALL ts
    peers on both engines, so the result is deterministic without an
    event_id tie-break IN THE FRAME (the output is keyed per event).
    Money stays integer cents. One user-keyed shuffle serves the
    window — the w03/w05 plan family."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_trailing_hour"),
        F.sum(cents("value")).over(w).cast("long").alias("sum_value_cents"),
    )


# ---------------------------------------------------------------------------
# w10 — ordered funnel (view → click → purchase): sequential pattern
# matching via cumulative windows, the MATCH_RECOGNIZE-shaped surface
# the window family lacked
# ---------------------------------------------------------------------------

_W10_ORACLE = """
WITH u AS (SELECT DISTINCT user_id FROM events),
v AS (
  SELECT user_id, MIN(ts) AS view_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS click_ts
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.view_ts
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS purchase_ts
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
  GROUP BY e.user_id
)
SELECT u.user_id, v.view_ts, c.click_ts, p.purchase_ts,
       CAST(CASE WHEN v.view_ts IS NULL THEN 0
                 WHEN c.click_ts IS NULL THEN 1
                 WHEN p.purchase_ts IS NULL THEN 2
                 ELSE 3 END AS BIGINT) AS stage
FROM u LEFT JOIN v USING (user_id)
       LEFT JOIN c USING (user_id)
       LEFT JOIN p USING (user_id)
"""


@register("w10_funnel_stages", oracle=_W10_ORACLE)
def w10_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel matching per user — earliest view, earliest
    click strictly AFTER it, earliest purchase strictly after THAT —
    the sequential-pattern surface (MATCH_RECOGNIZE's most common
    production use) expressed as CUMULATIVE WINDOWS instead of the
    oracle's three self-join passes: over one (user, ts, event_id)
    ordering, a running min-view timestamp marks each click that
    qualifies, a running min over THOSE marks each purchase that
    qualifies, and one final per-user aggregate reads the funnel off
    — the running min reaches the stage-k anchor exactly at that
    anchor's own row (rows order by ts, so the min over qualifying
    events IS the first one seen), which makes the window form equal
    the join-form spec row-for-row; the oracle deliberately KEEPS the
    join formulation so the two derivations cross-check each other
    rather than replaying one shape twice. Strict ts inequalities
    make equal-timestamp stages non-qualifying on both engines — no
    tie-break needed. Scale: ONE user-keyed shuffle serves both
    window passes AND the final groupBy (the w08 plan family,
    plan-guarded single exchange); the join form pays three
    user-keyed join shuffles and two extra scans. Stage census at
    sf0.01: all 150 users reach stage 3 (~130 events each — dense
    synthetic streams, so every sequence occurs); the per-user stage
    TIMESTAMPS are the hash-verified content."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    is_type = lambda t: F.col("event_type") == t  # noqa: E731
    run_view = F.min(F.when(is_type("view"), F.col("ts"))).over(w)
    click_cand = F.when(is_type("click") & (F.col("ts") > run_view), F.col("ts"))
    step1 = ev.withColumn("_click_cand", click_cand)
    run_click = F.min("_click_cand").over(w)
    purchase_cand = F.when(
        is_type("purchase") & (F.col("ts") > run_click), F.col("ts")
    )
    agg = (
        step1.withColumn("_purchase_cand", purchase_cand)
        .groupBy("user_id")
        .agg(
            F.min(F.when(is_type("view"), F.col("ts"))).alias("view_ts"),
            F.min("_click_cand").alias("click_ts"),
            F.min("_purchase_cand").alias("purchase_ts"),
        )
    )
    stage = (
        F.when(F.col("view_ts").isNull(), 0)
        .when(F.col("click_ts").isNull(), 1)
        .when(F.col("purchase_ts").isNull(), 2)
        .otherwise(3)
    )
    return agg.select(
        "user_id",
        "view_ts",
        "click_ts",
        "purchase_ts",
        stage.cast("long").alias("stage"),
    )


# ---------------------------------------------------------------------------
# w11 — cohort retention triangle: the classic first-seen × age
# engagement matrix. Registered in OVERFLOW.
# ---------------------------------------------------------------------------

_W11_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_ns(ts) // 86400000000000 AS d
  FROM events WHERE user_id IS NOT NULL
), first_seen AS (
  SELECT user_id, MIN(d) AS cohort_day FROM e GROUP BY user_id
), act AS (
  SELECT DISTINCT e.user_id, f.cohort_day, e.d - f.cohort_day AS age_days
  FROM e JOIN first_seen f USING (user_id)
), cohort_size AS (
  SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS n_cohort FROM first_seen
  GROUP BY cohort_day
)
SELECT a.cohort_day, a.age_days,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       s.n_cohort,
       (CAST(COUNT(*) AS BIGINT) * 1000) // s.n_cohort AS retention_milli
FROM act a JOIN cohort_size s USING (cohort_day)
GROUP BY a.cohort_day, a.age_days, s.n_cohort
ORDER BY cohort_day, age_days
"""


@register("w11_cohort_retention", oracle=_W11_ORACLE)
def w11_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention TRIANGLE — the canonical engagement matrix
    (users bucketed by first-seen day; for each cohort × age-in-days
    cell, how many came back) that every analytics stack ships and
    this catalog was missing: n_active distinct users per
    (cohort_day, age_days) plus retention_milli = active·1000 div
    cohort size, all exact integers (epoch-day buckets via integer
    division of the nanosecond timestamp — the catalog.table
    convention keeps both engines on identical values).

    Plan shape: one per-user MIN aggregation (map-side combined) for
    the cohort assignment, broadcast-joined back onto the (user, day)
    distinct activity set, then one (cohort, age) aggregation — three
    keyed shuffles, no window, no sort beyond the output order. At
    100 TB the (user, day) distinct pre-aggregation is the load-
    bearing stage and it partial-aggregates map-side; cohort sizes
    are a day-cardinality frame that broadcasts."""
    ev = (
        table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.expr("unix_micros(ts) DIV 86400000000").alias("d"),
        )
    )
    first_seen = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    act = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_day",
            (F.col("d") - F.col("cohort_day")).alias("age_days"),
        )
        .distinct()
    )
    cohort_size = first_seen.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("long").alias("n_cohort")
    )
    n_active = F.count(F.lit(1)).cast("long")
    ret = n_active * 1000
    return (
        act.groupBy("cohort_day", "age_days")
        .agg(n_active.alias("n_active"))
        .join(F.broadcast(cohort_size), "cohort_day")
        .select(
            "cohort_day",
            "age_days",
            "n_active",
            "n_cohort",
            F.expr("CAST((n_active * 1000) DIV n_cohort AS BIGINT)").alias(
                "retention_milli"
            ),
        )
        .orderBy("cohort_day", "age_days")
    )


# ---------------------------------------------------------------------------
# w12 — the retention triangle answered from SKETCHES (q44's theta-style
# intersection applied to w11's cells). Registered in OVERFLOW.
# ---------------------------------------------------------------------------

_W12_K = 64


def _w12_oracle() -> str:
    """GENERATED from the operator constants: per-user KMV hash, per-
    cohort and per-day k-min sketches, the theta intersection estimate
    per (cohort, age) cell replaying kmv_intersect_estimate
    integer-for-integer, with w11's exact cells as the rider."""
    from ..operators.sketch import KMV_A, KMV_B, KMV_C, KMV_P

    k, p = _W12_K, KMV_P
    return f"""
WITH ev AS (
  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS d
  FROM events WHERE user_id IS NOT NULL
), fs AS (
  SELECT user_id, MIN(d) AS cohort_day FROM ev GROUP BY user_id
), uh AS (
  SELECT user_id,
         ( ((x0*x0) % {p}) * {KMV_A} % {p}
           + (x0 * {KMV_B}) % {p}
           + {KMV_C} ) % {p} AS h
  FROM (SELECT user_id, ((user_id % {p}) + {p}) % {p} AS x0 FROM fs)
), csk AS (
  SELECT cohort_day, list(h ORDER BY h) AS ck FROM (
    SELECT f.cohort_day, u.h,
           ROW_NUMBER() OVER (PARTITION BY f.cohort_day ORDER BY u.h) AS rn
    FROM fs f JOIN uh u USING (user_id)
  ) WHERE rn <= {k} GROUP BY cohort_day
), ask AS (
  SELECT d, list(h ORDER BY h) AS ak FROM (
    SELECT e.d, u.h,
           ROW_NUMBER() OVER (PARTITION BY e.d ORDER BY u.h) AS rn
    FROM ev e JOIN uh u USING (user_id)
  ) WHERE rn <= {k} GROUP BY d
), cells AS (
  SELECT c.cohort_day, a.d - c.cohort_day AS age_days, c.ck, a.ak
  FROM csk c JOIN ask a ON a.d >= c.cohort_day
), est AS (
  SELECT cohort_day, age_days,
         CAST(CASE WHEN nm < {k} THEN n_ib
              ELSE (below * {p}) // m_k END AS BIGINT) AS est_active
  FROM (
    SELECT cohort_day, age_days,
           len(mg) AS nm, mg[{k}] AS m_k,
           len(ib) AS n_ib,
           COALESCE(len(list_filter(ib, x -> x < mg[{k}])), 0) AS below
    FROM (
      SELECT cohort_day, age_days,
             list_sort(list_distinct(ck || ak))[1:{k}] AS mg,
             list_filter(ck, x -> list_contains(ak, x)) AS ib
      FROM cells
    )
  )
), act AS (
  SELECT f.user_id, f.cohort_day, e.d - f.cohort_day AS age_days
  FROM ev e JOIN fs f USING (user_id)
), ex AS (
  SELECT cohort_day, age_days, CAST(COUNT(*) AS BIGINT) AS n_active
  FROM act GROUP BY cohort_day, age_days
)
SELECT est.cohort_day, est.age_days,
       CAST(COALESCE(ex.n_active, 0) AS BIGINT) AS n_active,
       est.est_active,
       CAST(est.est_active - COALESCE(ex.n_active, 0) AS BIGINT) AS err
FROM est LEFT JOIN ex USING (cohort_day, age_days)
ORDER BY cohort_day, age_days
"""


@register("w12_retention_sketched", oracle=_w12_oracle())
def w12_retention_sketched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w11's cohort-retention triangle answered from O(k) SKETCHES —
    the shape a 100 TB analytics stack actually ships: one KMV sketch
    per cohort (first-seen users) and one per activity day are the
    PERSISTED artifacts (exactly what streaming/kmv.py IncrementalKmv
    maintains per bucket — the q48 pattern one axis up), and every
    (cohort, age) cell is the theta-style intersection estimate of
    two 64-long arrays (operators/sketch.py kmv_intersect_estimate,
    q44's estimator) — raw events are never rescanned per cell, and
    cohort×day cells compose by SKETCH join, not user join. The exact
    triangle rides along (w11's aggregation) for the honest error
    column: integer err = est − exact per cell, both engines
    bit-equal. Small cells sit in the exact regime (merged sketch
    under-full ⇒ err 0 by construction); only cohort∪day unions past
    k = 64 pay the 1/√(J·k) estimating-regime noise — the same
    honesty split q44 documents. MEASURED at sf0.01: 59 cells, 4 in
    the exact regime, max |err| 9 users, mean relative error 8.0 %
    on non-empty cells — inside the ~12.5 % 1/√k envelope.

    Scale shape: the per-user hash is computed once; cohort and day
    sketches are two rank windows over DISTINCT (group, hash) rows;
    the cell stage joins day-count-sized SKETCH frames (a theta join
    over ~days² rows carrying k-long arrays — trivially broadcast),
    never user rows. The exact rider is w11's three keyed shuffles
    and exists for calibration only."""
    from ..operators.sketch import kmv_intersect_estimate, kmv_sketch

    ev = (
        table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.expr("unix_micros(ts) DIV 86400000000").alias("d"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    first_seen = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    csk = kmv_sketch(first_seen, "cohort_day", "user_id", k=_W12_K).select(
        "cohort_day", F.col("kmv").alias("ck")
    )
    ask = kmv_sketch(ev, "d", "user_id", k=_W12_K).select(
        "d", F.col("kmv").alias("ak")
    )
    cells = csk.join(
        F.broadcast(ask), F.col("d") >= F.col("cohort_day")
    ).select(
        "cohort_day",
        (F.col("d") - F.col("cohort_day")).alias("age_days"),
        kmv_intersect_estimate("ck", "ak", _W12_K).alias("est_active"),
    )
    exact = (
        ev.join(first_seen, "user_id")
        .groupBy(
            "cohort_day",
            (F.col("d") - F.col("cohort_day")).alias("age_days"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    return (
        cells.join(exact, ["cohort_day", "age_days"], "left")
        .select(
            "cohort_day",
            "age_days",
            F.coalesce(F.col("n_active"), F.lit(0).cast("long")).alias(
                "n_active"
            ),
            "est_active",
            (
                F.col("est_active")
                - F.coalesce(F.col("n_active"), F.lit(0).cast("long"))
            ).alias("err"),
        )
        .orderBy("cohort_day", "age_days")
    )
