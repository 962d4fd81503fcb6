"""Streaming-operator queries (X8), validated in batch mode.

`F.window` / `F.session_window` evaluate identically over batch and
streaming DataFrames, so each query here runs the exact expression the
streaming module ships, on the static `events` table, where the DuckDB
oracle can replay it (tumbling = time_bucket; session = gap logic).
The genuinely-streaming execution paths (watermarks, AvailableNow,
stateful applyInPandasWithState) are exercised in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..streaming.windows import session_stats, sliding_counts, tumbling_counts
from . import register

# ---------------------------------------------------------------------------
# st01 — tumbling windows
# ---------------------------------------------------------------------------

_ST01_ORACLE = """
SELECT CAST(time_bucket(INTERVAL 10 MINUTE, ts) AS TIMESTAMP) AS window_start,
       CAST(time_bucket(INTERVAL 10 MINUTE, ts) + INTERVAL 10 MINUTE AS TIMESTAMP) AS window_end,
       event_type,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2, 3
"""


@register("st01_tumbling_counts", oracle=_ST01_ORACLE)
def st01_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling windows per event type — same expression the
    stream runs with a watermark."""
    ev = table(spark, sf_dir, "events")
    return tumbling_counts(ev, "ts", "event_type", width="10 minutes")


# ---------------------------------------------------------------------------
# st02 — sliding (hopping) windows
# ---------------------------------------------------------------------------

_ST02_ORACLE = """
WITH hops AS (
  SELECT event_type, ts,
         CAST(time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL 5 MINUTE * h AS TIMESTAMP)
           AS window_start
  FROM events, unnest(range(0, 2)) AS u(h)
)
SELECT window_start,
       CAST(window_start + INTERVAL 10 MINUTE AS TIMESTAMP) AS window_end,
       event_type, COUNT(*) AS n
FROM hops
WHERE ts >= window_start AND ts < window_start + INTERVAL 10 MINUTE
GROUP BY 1, 2, 3
"""


@register("st02_sliding_counts", oracle=_ST02_ORACLE)
def st02_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-min windows hopping every 5 min: each event lands in 2
    windows (Spark expands internally — no self-join)."""
    ev = table(spark, sf_dir, "events")
    return sliding_counts(ev, "ts", "event_type", width="10 minutes", slide="5 minutes")


# ---------------------------------------------------------------------------
# st03 — session windows (30-min gap)
# ---------------------------------------------------------------------------

_ST03_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts >= COALESCE(
                LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                ts - INTERVAL 100 HOUR) + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged
)
SELECT user_id, CAST(MIN(ts) AS TIMESTAMP) AS session_start, COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
"""


@register("st03_session_windows", oracle=_ST03_ORACLE)
def st03_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`F.session_window` gap-merge semantics (events < 30 min apart
    merge). Oracle replays it as LAG-gap + running-sum session ids —
    the classic SQL equivalent. NOTE Spark closes a session when the
    next event is >= gap after the PREVIOUS event; the oracle flags a
    new session with the same >= comparison."""
    ev = table(spark, sf_dir, "events")
    return session_stats(ev, "ts", "user_id", gap="30 minutes")
