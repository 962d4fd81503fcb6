"""Column-level projection operators.

Reference parity:
- ``upcast_int_to_bigint`` — the reference casts every Integer/Short
  column to bigint to prevent 32-bit overflow
  (`/root/reference/src/sdp_etl/transformations/00_config_loader.py:46-55`,
  duplicated at `01_bronze_ingestion.py:56-61`). The reference loops
  ``withColumn``; we emit ONE select projection — a single Project
  node instead of N stacked ones, which keeps the analyzed plan small
  for wide tables (hundreds of columns at 100 TB scale).
- ``add_audit_columns`` — `_ingested_at`, `_source_file`,
  `_file_modification_time` (`01_bronze_ingestion.py:113-121`), using
  the OSS `_metadata` file-source struct (same fields Auto Loader
  exposes; available on batch and streaming file scans since 3.2).
- ``apply_renames`` — the reference declares `renamed_columns` in its
  config but never implements it (`/root/reference/README.md:100`);
  we implement it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["upcast_int_to_bigint", "add_audit_columns", "apply_renames", "AUDIT_COLUMNS"]

AUDIT_COLUMNS = ("_ingested_at", "_source_file", "_file_modification_time")

_NARROW_INTS = (T.IntegerType, T.ShortType, T.ByteType)


def upcast_int_to_bigint(df: DataFrame) -> DataFrame:
    """Cast every 8/16/32-bit integer column to bigint, in one Project."""
    cols: list[Column] = []
    changed = False
    for field in df.schema.fields:
        if isinstance(field.dataType, _NARROW_INTS):
            cols.append(F.col(field.name).cast("bigint").alias(field.name))
            changed = True
        else:
            cols.append(F.col(field.name))
    return df.select(*cols) if changed else df


def add_audit_columns(df: DataFrame, has_file_metadata: bool = True) -> DataFrame:
    """Stamp ingestion audit columns.

    ``_metadata`` is the hidden file-source struct — it must be
    selected explicitly before the relation is projected away, hence
    this runs directly on the scan DataFrame.
    """
    out = df.withColumn("_ingested_at", F.current_timestamp())
    if has_file_metadata:
        out = out.withColumn("_source_file", F.col("_metadata.file_path")).withColumn(
            "_file_modification_time", F.col("_metadata.file_modification_time")
        )
    else:
        out = out.withColumn("_source_file", F.lit(None).cast("string")).withColumn(
            "_file_modification_time", F.lit(None).cast("timestamp")
        )
    return out


def apply_renames(df: DataFrame, renames: dict[str, str] | None) -> DataFrame:
    """Rename columns per config mapping {old: new}; missing olds are a
    config error (fail fast rather than silently ignore)."""
    if not renames:
        return df
    missing = [c for c in renames if c not in df.columns]
    if missing:
        raise ValueError(f"renamed_columns refers to missing columns: {missing}")
    return df.withColumnsRenamed(renames)
