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
