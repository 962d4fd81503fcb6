"""Temporal-join queries (tj*) — as-of join over the events feed.

The as-of join is the canonical time-series operator the reference
family exposes (DuckDB ASOF JOIN is the oracle's native spelling);
`operators/asof.py` re-expresses it Spark-first as union + window
carry (one key shuffle, no theta join, fan-out independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.asof import asof_join
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
