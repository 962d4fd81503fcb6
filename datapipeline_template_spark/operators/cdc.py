"""CDC soft-delete semantics (reference R17, R11).

The reference's contract: rows carry an ``op`` column where ``'D'``
marks deletes. With ``soft_deletes != 'Y'`` the silver build drops
deleted rows inline
(`/root/reference/src/sdp_etl/transformations/02_silver_processing.py:131-135`);
with ``soft_deletes == 'Y'`` they stay in silver and a per-entity
``_active`` SQL view filters them out
(`03_active_views.py:57-64`).

Semantics trap preserved deliberately: ``op != 'D'`` is null-rejecting
— rows with ``op IS NULL`` are ALSO dropped (standard SQL three-valued
logic). Tests pin this behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["drop_soft_deleted", "create_active_view", "ACTIVE_SUFFIX"]

ACTIVE_SUFFIX = "_active"


def drop_soft_deleted(df: DataFrame, op_col: str = "op") -> DataFrame:
    """Remove soft-deleted (and null-op) rows; no-op if the entity has
    no op column (non-CDC sources)."""
    if op_col not in df.columns:
        return df
    return df.where(F.col(op_col) != F.lit("D"))


def create_active_view(
    spark: SparkSession,
    silver_db: str,
    entity: str,
    op_col: str = "op",
) -> str:
    """CREATE OR REPLACE VIEW {silver_db}_active.{entity}_active
    filtering soft-deleted rows — mirrors the reference's view DDL
    (`03_active_views.py:49-64`), flattened to Spark's 2-level
    namespace (SURVEY.md §1.4)."""
    active_db = f"{silver_db}{ACTIVE_SUFFIX}"
    view_fqn = f"{active_db}.silver_{entity}{ACTIVE_SUFFIX}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {active_db}")
    spark.sql(
        f"CREATE OR REPLACE VIEW {view_fqn} AS "
        f"SELECT * FROM {silver_db}.silver_{entity} WHERE {op_col} != 'D'"
    )
    return view_fqn


def scd2_history(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    op_col: str | None = None,
    delete_value: str = "D",
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 from a CDC change feed — the
    history-preserving big sibling of keep-latest (R19): every change
    becomes a VERSION row with its validity interval instead of
    overwriting the key.

    For each key, changes are totally ordered by ``order_cols``; a
    version's interval runs from its own order values to the NEXT
    change's (``lead`` per order column, NULL = still open). A
    ``delete_value`` op closes the previous version's interval but
    emits no version itself (the key simply has no current row); any
    other op — including NULL — is a version. ``is_current`` marks
    open intervals, and a trailing delete leaves the key with zero
    current rows (the lead is computed BEFORE the delete filter,
    which is the whole trick).

    One ``lead`` window per order column sharing a single (keys)
    partitioning — exactly one hash shuffle of the feed, same cost as
    keep-latest's window form. Per-key history is change-cardinality
    small, so the window partition is never a skew hazard. Appended
    columns: ``<order_col>_end`` per order column + ``is_current``.
    """
    from pyspark.sql import Window

    for c in order_cols:
        if f"{c}_end" in df.columns:
            raise ValueError(f"column {c}_end already exists")
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order_cols])
    out = df
    for c in order_cols:
        out = out.withColumn(f"{c}_end", F.lead(c).over(w))
    # Open interval = no later change in ANY order column (lead of the
    # first order col is NULL iff the row is last in its key).
    out = out.withColumn(
        "is_current", F.col(f"{order_cols[0]}_end").isNull()
    )
    if op_col is not None:
        # Deletes close intervals (they were visible to lead) but are
        # not versions. NULL op is a version here — unlike the
        # null-rejecting ACTIVE filter, history keeps unknown ops.
        out = out.where(
            F.col(op_col).isNull() | (F.col(op_col) != F.lit(delete_value))
        )
    return out
