"""Catalog robustness: events dtype branching and view registration."""

from __future__ import annotations

import pytest

from datapipeline_template_spark.catalog import register_views, table


def test_events_ts_is_tz_independent(spark, sf_dir):
    """The NTZ→timestamp conversion must be pure wall-clock arithmetic:
    flipping the session timezone AFTER table() returns (the driver
    owns its session) must not shift values. Round-4 review finding: a
    bare cast("timestamp") resolves against the session tz at analysis
    time."""
    from pyspark.sql import functions as F

    prior = spark.conf.get("spark.sql.session.timeZone")
    df = table(spark, sf_dir, "events")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        shifted = df.select(F.unix_micros("ts").alias("m")).orderBy("m").first()["m"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)
    utc = (
        table(spark, sf_dir, "events")
        .select(F.unix_micros("ts").alias("m"))
        .orderBy("m")
        .first()["m"]
    )
    assert shifted == utc


def test_register_views_drops_stale_view_on_skip(spark, sf_dir, tmp_path):
    """Skip-and-warn must not leave a stale same-named view serving the
    PREVIOUS sf_dir's data — the view is dropped so later SQL fails
    loudly instead of silently returning wrong-scale rows."""
    register_views(spark, sf_dir)
    try:
        assert spark.sql("SELECT count(*) FROM region").first()[0] > 0
        # Re-register against a directory with no parquet: every table
        # fails, and the old views must be gone.
        register_views(spark, str(tmp_path))
        with pytest.raises(Exception, match="TABLE_OR_VIEW_NOT_FOUND|cannot be found"):
            spark.sql("SELECT count(*) FROM region").first()
    finally:
        # Restore the session views even if an assertion failed — later
        # tests in the shared session depend on them.
        register_views(spark, sf_dir)


def test_register_views_only_raises_on_failure(spark, tmp_path):
    """With an explicit only= list the caller asked for those tables:
    failure must raise, not warn."""
    with pytest.raises(Exception):
        register_views(spark, str(tmp_path), only=("region",))
