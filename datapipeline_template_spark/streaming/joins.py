"""Streaming joins (X8): stream-static enrichment and watermarked
stream-stream interval joins.

The reference never joins streams (its bronze flows are single-source
per-file maps — `/root/reference/src/sdp_etl/transformations/
01_bronze_ingestion.py:100-121`), but any event pipeline feeding it
needs both shapes, so the engine provides them first-class.

State-size story (the thing that kills stream-stream joins at scale):
Spark buffers both sides' unmatched rows in state; the watermark plus
the time-interval join condition are what let it evict. Without BOTH,
state grows unboundedly — so ``interval_join`` refuses to build a
stream-stream join without watermarks. The equi-key in the condition
keeps the state store partitioned by key (no broadcast of a stream).

Stream-static joins need none of that: the static side is a plain
batch relation re-resolved per micro-batch (picking up dim updates),
and only the stream side flows — Catalyst plans it like any batch
join, typically broadcasting the dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_static_enrich", "interval_join"]


def stream_static_enrich(
    stream: DataFrame, dim: DataFrame, keys: list[str], how: str = "left"
) -> DataFrame:
    """Enrich a stream against a static dimension (re-read each
    micro-batch). Left join keeps events whose dim row is missing —
    the common choice for late-arriving dimension data."""
    if dim.isStreaming:
        raise ValueError("dim must be a static (batch) DataFrame")
    return stream.join(dim, keys, how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    watermark: str,
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: equi-keys plus the event-time band
    ``left_ts - lower <= right_ts <= left_ts + upper``.

    Both sides get the same watermark ``delay``; combined with the
    band, Spark derives state-eviction bounds for each side. ``how``
    supports inner and the watermark-gated outer joins
    (left_outer/right_outer/full_outer emit unmatched rows only once
    the watermark passes the band's far edge).

    Batch DataFrames run through the identical expression (no
    watermark needed) — which is how the batch oracle validates the
    join's semantics (q17's time-band pair join is the batch twin).
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    lcol, rcol = F.col(left_ts), F.col(right_ts)
    cond = (
        (rcol >= lcol - F.expr(f"INTERVAL {lower}"))
        & (rcol <= lcol + F.expr(f"INTERVAL {upper}"))
    )
    for k in keys:
        cond = (left[k] == right[k]) & cond
    return left.join(right, cond, how)
