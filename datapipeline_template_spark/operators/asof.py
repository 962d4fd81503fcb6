"""As-of (temporal) join — attach to each left row the LATEST right
row at-or-before (or strictly-before) its timestamp, per key.

The reference engine family exposes this as ASOF JOIN (DuckDB syntax
`FROM l ASOF JOIN r ON l.k = r.k AND l.ts >= r.ts`); Spark has no
native operator. The naive encoding — an inequality (theta) join plus
a per-left-row max — explodes to |L|·|matching R| intermediate rows.

Spark-first shape used here instead: UNION both sides tagged with a
side flag, ONE window sorted by (ts, side, payload) per key, and a
`last(payload, ignorenulls=true)` running carry — every left row picks
up the payload of the nearest preceding right row. Cost: one shuffle
on the key columns + one sort within partitions, independent of match
fan-out. This is the standard streaming/time-series pattern (Flink
temporal join, kdb aj) expressed in DataFrame ops.

Determinism: right rows sharing the exact same (key, ts) are resolved
by the payload struct's own ordering (last = max payload tuple), so
results are stable under any partitioning. Ties between engines agree
when the right side is unique per (key, ts) — pre-aggregate if not.

Skew: a hot key's full history sorts in one partition. At 100 TB,
pre-bucket by (key, coarse time range) and run the carry per bucket
seeded with the previous bucket's last payload (two passes); the
single-window form here is the right default until a key's history
exceeds a partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]

_SIDE = "_asof_side"
_TS = "_asof_ts"
_PAYLOAD = "_asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    how: str = "left",
    strict: bool = False,
    prefix: str = "r_",
) -> DataFrame:
    """For each left row, the latest right row with equal ``keys`` and
    ``right_ts <= left_ts`` (``strict=True``: ``<``).

    Returns all left columns plus ``{prefix}{right_ts}`` and
    ``{prefix}{c}`` for each of ``value_cols`` (NULL when no right row
    qualifies; ``how="inner"`` drops those lefts instead).

    Key columns must share names across both sides (rename first).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join supports how='left'|'inner', got {how!r}")
    missing = [k for k in keys if k not in left.columns or k not in right.columns]
    if missing:
        raise ValueError(f"asof_join: key column(s) {missing} must exist on BOTH sides")

    payload = F.struct(
        F.col(right_ts).alias(right_ts), *[F.col(c) for c in value_cols]
    )
    payload_type = right.select(payload.alias(_PAYLOAD)).schema[0].dataType

    # Side ordering at equal ts decides the boundary semantics: for
    # `<=` the right row must sort BEFORE the left row (so the carry
    # sees it); for strict `<` it must sort after.
    l_side, r_side = (0, 1) if strict else (1, 0)

    lcols = left.columns
    l_part = left.select(
        *lcols,
        F.col(left_ts).alias(_TS),
        F.lit(l_side).alias(_SIDE),
        F.lit(None).cast(payload_type).alias(_PAYLOAD),
    )
    null_left = [
        F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in keys else F.col(c)
        for c in lcols
    ]
    r_part = right.select(
        *null_left,
        F.col(right_ts).alias(_TS),
        F.lit(r_side).alias(_SIDE),
        payload.alias(_PAYLOAD),
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(_TS, _SIDE, _PAYLOAD)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_part.unionByName(r_part).withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    )
    out = carried.where(F.col(_SIDE) == l_side).select(
        *lcols,
        F.col(_PAYLOAD).getField(right_ts).alias(f"{prefix}{right_ts}"),
        *[F.col(_PAYLOAD).getField(c).alias(f"{prefix}{c}") for c in value_cols],
    )
    if how == "inner":
        out = out.where(F.col(f"{prefix}{right_ts}").isNotNull())
    return out
