"""Physical-layout and placement tests (R9, R23/R24)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datapipeline_template_spark.config import EntityConfig, PipelineParams
from datapipeline_template_spark.operators.layout import cluster_for_layout
from datapipeline_template_spark.plans.pipeline import Pipeline


def test_layout_clusters_files(spark, sf_dir):
    """Range clustering yields disjoint per-partition key ranges — the
    property that makes parquet footer min/max stats prune files."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    clustered = cluster_for_layout(orders, ["o_custkey"], num_files=4)
    ranges = (
        clustered.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("o_custkey").alias("lo"), F.max("o_custkey").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(ranges) > 1
    for prev, nxt in zip(ranges, ranges[1:]):
        assert prev["hi"] <= nxt["lo"]  # disjoint (boundary overlap allowed)


def test_layout_noop_without_cols(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert cluster_for_layout(orders, []) is orders
    assert cluster_for_layout(orders, ["not_a_col"]) is orders


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Tables bucketed on the join key join with ZERO shuffles — the
    co-located-join layout (write-once shuffle, amortized forever)."""
    from datapipeline_template_spark.operators.layout import write_bucketed

    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "bkt_orders", ["o_orderkey"], n_buckets=8)
    write_bucketed(li, "bkt_lineitem", ["l_orderkey"], n_buckets=8)

    # At toy scale the planner prefers broadcasting the small side;
    # force the sort-merge strategy the layout exists for (at 100 TB
    # neither side broadcasts).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bkt_lineitem").join(
            spark.table("bkt_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:800]}"
        # And it computes the right thing.
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_same_key_name_resolves(spark, sf_dir):
    """The natural co-bucketed case joins two tables bucketed on the
    SAME column name; qualified references keep the condition
    unambiguous (unqualified F.col(key) on both sides raised
    AnalysisException) and the join stays Exchange-free."""
    from datapipeline_template_spark.operators.layout import (
        bucketed_fact_join,
    )

    ev = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.col("o_custkey").alias("user_id"), "o_totalprice")
    )
    cu = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_fact_join(
            spark, ev, cu, "user_id", "user_id", "bkt_same", n_buckets=4
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan.split("SortMergeJoin", 1)[1]
        assert joined.count() == ev.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in ("bkt_same_l", "bkt_same_r"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_write_bucketed_refuses_unsafe_names(spark, sf_dir):
    """write_bucketed manages <warehouse>/<name> on disk — qualified or
    path-like names would rmtree the wrong directory; they refuse."""
    import pytest

    from datapipeline_template_spark.operators.layout import write_bucketed

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    for bad in ("../escape", "a/b", "a b", "a.b.c", "db.", ".tbl"):
        with pytest.raises(ValueError, match="unsafe table name"):
            write_bucketed(orders, bad, ["o_orderkey"], n_buckets=4)


def test_external_location_tables(spark, tmp_path):
    """R9: with external_location set, table data lives under
    {ext}/{bronze|silver}/{entity}/ instead of the warehouse."""
    import datetime as dt

    from pyspark.sql import Row
    from pyspark.sql import types as T

    spark.sql("DROP DATABASE IF EXISTS ext_bronze CASCADE")
    spark.sql("DROP DATABASE IF EXISTS ext_silver CASCADE")
    src = tmp_path / "raw" / "things"
    src.mkdir(parents=True)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    spark.createDataFrame(
        [Row(id=1, op="I", ts=dt.datetime(2024, 1, 1))], schema
    ).coalesce(1).write.mode("append").parquet(str(src))

    ext = tmp_path / "external"
    params = PipelineParams(
        source_location=str(tmp_path / "raw"),
        catalog="ext",
        external_location=str(ext),
    )
    pipe = Pipeline(spark, params, [EntityConfig(name="things")], streaming=False)
    pipe.run()

    assert (ext / "bronze" / "things").exists()
    assert (ext / "silver" / "things").exists()
    assert spark.read.table("ext_silver.silver_things").count() == 1


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-style partitioned layout: a filter on the partition column
    becomes a PartitionFilter (directory pruning) — at 100 TB the scan
    never lists, let alone reads, the out-of-range partitions."""
    from datapipeline_template_spark.catalog import table as cat_table

    ev = cat_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    out = str(tmp_path / "events_by_day")
    ev.write.partitionBy("day").mode("overwrite").parquet(out)

    days = sorted(r["day"] for r in spark.read.parquet(out).select("day").distinct().collect())
    assert len(days) > 1
    pick = days[0]
    filtered = spark.read.parquet(out).where(F.col("day") == F.lit(pick))
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters", 1)[1][:200]
    # Count parity with an unpartitioned filter on the same predicate.
    expected = ev.where(F.to_date("ts") == F.lit(pick)).count()
    assert filtered.count() == expected


def test_zorder_tightens_second_dimension(spark, sf_dir):
    """Z-order layout: per-file ranges must be tight on BOTH columns.
    Lexicographic clustering leaves the second column's per-file span
    near the full domain; the Morton layout shrinks it decisively."""
    from datapipeline_template_spark.operators.layout import (
        cluster_for_layout,
        zorder_for_layout,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderkey"
    )

    def avg_span(df, col):
        spans = (
            df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg((F.max(col) - F.min(col)).alias("span"))
            .agg(F.avg("span"))
            .collect()[0][0]
        )
        return float(spans)

    lex = cluster_for_layout(orders, ["o_custkey", "o_orderkey"], num_files=16)
    zed = zorder_for_layout(orders, ["o_custkey", "o_orderkey"], num_files=16)
    # Both layouts keep the first column clustered...
    assert avg_span(zed, "o_custkey") < avg_span(orders.repartition(16), "o_custkey")
    # ...but only z-order tightens the second column's per-file span.
    lex_span = avg_span(lex, "o_orderkey")
    z_span = avg_span(zed, "o_orderkey")
    assert z_span < 0.7 * lex_span, f"z {z_span} vs lex {lex_span}"
    # Layout is a pure reorder: same rows.
    assert zed.count() == orders.count()


def test_zorder_rejects_unknown_column_and_survives_degenerate_input(spark, sf_dir):
    """A typo'd column must raise (silent drop degraded the layout with
    no signal — round-2 advice); empty and all-NULL inputs must lay
    out without TypeError on float(None) min/max stats."""
    import pytest

    from datapipeline_template_spark.operators.layout import zorder_for_layout

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderkey"
    )
    with pytest.raises(ValueError, match="unknown column"):
        zorder_for_layout(orders, ["o_custkey", "o_orderkye"], num_files=4)
    empty = orders.where(F.lit(False))
    assert zorder_for_layout(empty, ["o_custkey", "o_orderkey"], num_files=4).count() == 0
    nulls = orders.limit(10).withColumn("o_custkey", F.lit(None).cast("long"))
    assert zorder_for_layout(nulls, ["o_custkey", "o_orderkey"], num_files=4).count() == 10
