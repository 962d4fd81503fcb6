"""Subquery-shaped relational queries (SURVEY.md §2.2 X1–X5 depth).

The reference has no query layer at all (SURVEY.md §2 scope note —
`/root/reference/src/sdp_etl/transformations/*` contain only the
ingest/dedup pipeline), so this module rounds out the engine's
*decorrelated* query surface: the classic TPC-H subquery shapes
(correlated scalar subquery, EXISTS / NOT EXISTS, scalar-subquery
against an aggregate) expressed the way a Spark engine should run them
— as explicit joins against pre-aggregated small sides, which is
exactly what Catalyst's decorrelation rewrites produce from SQL.

Scale notes (100 TB): every "subquery" side here is an aggregate that
is tiny relative to the fact table (per-part averages, a 1-row MAX /
AVG), so each is broadcast — the fact table never shuffles twice. The
disjunctive-predicate query (q29) exists to prove OR-of-ANDs predicates
still reach the scan and constant-fold; pivot (q27) compiles to a
single hash aggregate with no extra exchange over the groupBy keys.

Determinism: money stays in integer cents until one final division
(functions.cents); percentile interpolation is exact on integer-valued
inputs; every grouped result carries ORDER BY in the oracle only where
LIMIT exists (hash compare is order-insensitive otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import cents
from ..operators.skew import two_phase_distinct
from . import register

# ---------------------------------------------------------------------------
# q23 — correlated scalar subquery (TPC-H Q17 shape): per-part average
# ---------------------------------------------------------------------------

_Q23_ORACLE = """
SELECT
  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/700.0 AS avg_weekly
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT 0.5 * AVG(l2.l_quantity)
    FROM lineitem l2
    WHERE l2.l_partkey = p_partkey
  )
"""


@register("q23_small_qty_revenue", oracle=_Q23_ORACLE)
def q23_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery, decorrelated: the per-part AVG becomes
    a broadcast aggregate joined back on the part key — the same plan
    Catalyst derives from the SQL form, written explicitly.

    l_quantity is integer-valued, so the double AVG is an exact-integer
    sum followed by one IEEE division — order-independent, engine-equal.
    """
    part = table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    li = table(spark, sf_dir, "lineitem")
    # All lineitems of the brand's parts (broadcast the filtered dim).
    li_b = li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
    # Per-part average over those same rows (the correlation is on
    # p_partkey, so rows of other parts can never contribute).
    avgs = li_b.groupBy(F.col("p_partkey").alias("ap_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li_b.join(F.broadcast(avgs), li_b.l_partkey == F.col("ap_partkey"))
        .where(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg((F.sum(cents("l_extendedprice")).cast("double") / F.lit(700.0)).alias("avg_weekly"))
    )


# ---------------------------------------------------------------------------
# q24 — correlated EXISTS (TPC-H Q4 shape): late shipments per priority
# ---------------------------------------------------------------------------

_Q24_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
"""


@register("q24_exists_late_shipments", oracle=_Q24_ORACLE)
def q24_exists_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS decorrelated to a LEFT SEMI join: equi-key on the order
    key plus the non-equi shipped-late predicate evaluated inside the
    join. Semi join short-circuits on first match — no dedup needed."""
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# q25 — scalar subquery over an aggregate (TPC-H Q15): top supplier(s)
# ---------------------------------------------------------------------------

_Q25_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS total_rev_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev_c AS DOUBLE)/10000.0 AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev_c = (SELECT MAX(total_rev_c) FROM revenue)
ORDER BY s_suppkey
"""


@register("q25_top_supplier_revenue", oracle=_Q25_ORACLE)
def q25_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery = 1-row aggregate, realized as a broadcast cross
    join; revenue kept in exact int cents so the MAX-equality predicate
    is float-free. Ties (several suppliers at max) all survive, exactly
    like the SQL."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev_c = F.sum(cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))).alias(
        "total_rev_c"
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(rev_c)
    max_rev = revenue.agg(F.max("total_rev_c").alias("max_rev_c"))
    supplier = table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev))
        .where(F.col("total_rev_c") == F.col("max_rev_c"))
        .join(F.broadcast(supplier), F.col("supplier_no") == supplier.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_rev_c").cast("double") / F.lit(10000.0)).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q26 — exact percentiles (interpolating), grouped
# ---------------------------------------------------------------------------

_Q26_ORACLE = """
SELECT
  l_returnflag,
  quantile_cont(l_quantity, 0.25) AS qty_q1,
  quantile_cont(l_quantity, 0.5)  AS qty_median,
  quantile_cont(l_quantity, 0.75) AS qty_q3,
  quantile_cont(CAST(ROUND(l_extendedprice*100) AS BIGINT), 0.5)/100.0 AS price_median
FROM lineitem
GROUP BY l_returnflag
"""


@register("q26_quantity_quartiles", oracle=_Q26_ORACLE)
def q26_quantity_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolating percentiles (Spark `percentile` ==
    DuckDB `quantile_cont`): on integer-valued inputs the linear
    interpolation at quarter fractions is exact in binary floating
    point, so the engines agree bit-for-bit. Money goes through cents
    first so the interpolated midpoint is a half-integer, also exact.

    Scale: Spark's exact percentile is a single-pass typed aggregate
    with map-side partial combine (sorted-run merge), not a global
    sort; for looser needs swap in approx_percentile (t-digest)."""
    li = table(spark, sf_dir, "lineitem")
    p = F.expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))")
    price_med = F.expr("percentile(CAST(ROUND(l_extendedprice*100) AS BIGINT), 0.5D)")
    return li.groupBy("l_returnflag").agg(
        p.getItem(0).alias("qty_q1"),
        p.getItem(1).alias("qty_median"),
        p.getItem(2).alias("qty_q3"),
        (price_med / F.lit(100.0)).alias("price_median"),
    )


# ---------------------------------------------------------------------------
# q27 — pivot (cross-tab) compiled to one hash aggregate
# ---------------------------------------------------------------------------

_Q27_ORACLE = """
SELECT
  o_orderpriority,
  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS flag_a,
  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS flag_n,
  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS flag_r
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


@register("q27_pivot_returns_by_priority", oracle=_Q27_ORACLE)
def q27_pivot_returns_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`pivot` with explicit values: listing the values skips the extra
    distinct-collection job. Catalyst compiles it as a two-level hash
    aggregate — pre-aggregate on (priority, flag), then pivot on
    priority — so everything after the first partial combine moves
    |priorities|×|flags| rows, not data."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    joined = orders.select("o_orderkey", "o_orderpriority").join(
        li, F.col("o_orderkey") == li.l_orderkey
    )
    return (
        joined.groupBy("o_orderpriority")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .withColumnsRenamed({"A": "flag_a", "N": "flag_n", "R": "flag_r"})
    )


# ---------------------------------------------------------------------------
# q28 — conditional-aggregate ratio (TPC-H Q14 shape): promo revenue %
# ---------------------------------------------------------------------------

_Q28_ORACLE = """
SELECT
  (100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
       THEN CAST(ROUND(l_extendedprice*100) AS BIGINT)
            * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
       ELSE 0 END) AS DOUBLE))
  / CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
       * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS DOUBLE) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
"""


@register("q28_promo_revenue_pct", oracle=_Q28_ORACLE)
def q28_promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-gated aggregate ratio in one pass over the join — both sums
    exact int64, a single double multiply+divide at the end in the same
    association order as the oracle ((100*A)/B)."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc_c = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    promo_c = F.when(F.col("p_type") == "PROMO", disc_c).otherwise(F.lit(0).cast("long"))
    return (
        li.join(F.broadcast(part), li.l_partkey == F.col("p_partkey"))
        .agg(
            (
                (F.lit(100.0) * F.sum(promo_c).cast("double"))
                / F.sum(disc_c).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


# ---------------------------------------------------------------------------
# q29 — disjunctive OR-of-ANDs predicates (TPC-H Q19 shape)
# ---------------------------------------------------------------------------

_Q29_ORACLE = """
SELECT
  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
        * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0 AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


@register("q29_disjunctive_predicates", oracle=_Q29_ORACLE)
def q29_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs across both join sides: Catalyst factors the
    single-side conjuncts out of the disjunction, so the part scan
    still receives a pushed brand/size filter and lineitem a quantity
    range — check PushedFilters in the plan. The residual mixed
    predicate evaluates inside the broadcast join."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return j.where(
        arm("Brand#12", 15, 1, 11) | arm("Brand#23", 25, 10, 20) | arm("Brand#34", 35, 20, 30)
    ).agg(
        (
            F.sum(cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))).cast("double")
            / F.lit(10000.0)
        ).alias("revenue")
    )


# ---------------------------------------------------------------------------
# q30 — NOT EXISTS + scalar AVG threshold (TPC-H Q22 shape)
# ---------------------------------------------------------------------------

_Q30_ORACLE = """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS DOUBLE)/COUNT(*) AS avg_c
  FROM customer
  WHERE c_acctbal > 0.0
)
SELECT c_mktsegment,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS DOUBLE)/100.0 AS totacctbal
FROM customer, avg_bal
WHERE CAST(CAST(ROUND(c_acctbal*100) AS BIGINT) AS DOUBLE) > avg_c
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY c_mktsegment
"""


@register("q30_prospect_segments", oracle=_Q30_ORACLE)
def q30_prospect_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich prospects who never ordered: the AVG threshold is computed
    in exact cents (sum int64, one division — float-deterministic both
    engines), broadcast as a 1-row cross join; NOT EXISTS decorrelates
    to a LEFT ANTI join on the customer key (the subquery's own
    predicate is pushed below the anti join, keeping its build side
    small — and the result non-empty on the test corpus)."""
    cust = table(spark, sf_dir, "customer")
    avg_bal = (
        cust.where(F.col("c_acctbal") > 0.0)
        .agg((F.sum(cents("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_c"))
    )
    orders = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .where(cents("c_acctbal").cast("double") > F.col("avg_c"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(cents("c_acctbal")).cast("double") / F.lit(100.0)).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# q31 — two-phase exact distinct (skew-mitigation operator, driver-proved)
# ---------------------------------------------------------------------------

_Q31_ORACLE = """
SELECT l_suppkey, COUNT(DISTINCT l_orderkey) AS n_distinct
FROM lineitem
GROUP BY l_suppkey
"""


@register("q31_two_phase_distinct", oracle=_Q31_ORACLE)
def q31_two_phase_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators.skew.two_phase_distinct through the driver contract:
    dedup on (key, value) spreads a hot key across the cluster before
    the per-key count — the oracle's plain COUNT(DISTINCT) proves the
    rewrite is semantics-preserving."""
    li = table(spark, sf_dir, "lineitem")
    return two_phase_distinct(li, ["l_suppkey"], "l_orderkey")


# ---------------------------------------------------------------------------
# q32 — unpivot / melt (the inverse reshaping of q27's pivot)
# ---------------------------------------------------------------------------

_Q32_ORACLE = """
WITH base AS (
  SELECT o_orderpriority,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents,
         CAST(MAX(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS max_cents
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM base
UNION ALL
SELECT o_orderpriority, 'total_cents' AS metric, total_cents AS value FROM base
UNION ALL
SELECT o_orderpriority, 'max_cents' AS metric, max_cents AS value FROM base
"""


@register("q32_unpivot_priority_metrics", oracle=_Q32_ORACLE)
def q32_unpivot_priority_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshaping via DataFrame.unpivot (melt): Catalyst's
    Expand node emits the 3 metric rows per input row in one pass —
    no UNION re-scan of the aggregate, which is what the oracle (and
    a naive engine) pays."""
    orders = table(spark, sf_dir, "orders")
    base = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents("o_totalprice")).alias("total_cents"),
        F.max(cents("o_totalprice")).alias("max_cents"),
    )
    return base.unpivot(
        ["o_orderpriority"], ["n_orders", "total_cents", "max_cents"], "metric", "value"
    )


# ---------------------------------------------------------------------------
# q35 — deterministic hash sampling (reproducible training-data splits)
# ---------------------------------------------------------------------------

_Q35_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_sampled,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sampled_cents
FROM orders
WHERE (o_orderkey * 2654435761) % 1000000007 < CAST(0.1 * 1000000007 AS BIGINT)
GROUP BY o_orderpriority
"""


@register("q35_deterministic_sample", oracle=_Q35_ORACLE)
def q35_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% sample of orders by key hash (operators.sampling): unlike
    df.sample(seed), membership depends only on the key, so the split
    survives recompaction/repartitioning and replays in any engine —
    the property a 100 TB training corpus needs from its train/eval
    splits. Pure filter: pushdown-friendly, no shuffle, no RNG."""
    from ..operators.sampling import deterministic_sample

    orders = table(spark, sf_dir, "orders")
    return (
        deterministic_sample(orders, "o_orderkey", 0.1)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(cents("o_totalprice")).alias("sampled_cents"),
        )
    )


@register("q26b_quantiles_multipass", oracle=_Q26_ORACLE)
def q26b_quantiles_multipass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q26's exact quantiles through the 100-TB plan: multipass
    histogram refinement (operators.sketch.exact_grouped_quantiles)
    instead of the value-buffering `percentile` aggregate — counting
    passes over the scan, nothing wide ever shuffles, executor memory
    O(branch) regardless of group size. Registered against the SAME
    oracle as q26, so the hash gate proves the two plans bit-agree
    (the dd03/dd05 twin pattern, applied to quantiles)."""
    from ..operators.sketch import exact_grouped_quantiles

    li = table(spark, sf_dir, "lineitem")
    qty = exact_grouped_quantiles(
        li.select("l_returnflag", F.col("l_quantity").cast("long").alias("v")),
        "l_returnflag", "v", [0.25, 0.5, 0.75],
    )
    price = exact_grouped_quantiles(
        li.select("l_returnflag", cents("l_extendedprice").alias("v")),
        "l_returnflag", "v", [0.5],
    )
    rows = [
        (g, qty[g][0], qty[g][1], qty[g][2], price[g][0] / 100.0)
        for g in sorted(qty)
    ]
    return spark.createDataFrame(
        rows,
        "l_returnflag string, qty_q1 double, qty_median double, "
        "qty_q3 double, price_median double",
    )
