"""Batch file sources.

The reference ingests raw files per entity in one of
parquet/json/csv/avro (format list `/root/reference/README.md:96`,
default parquet `01_bronze_ingestion.py:75`) with inferred column
types (`cloudFiles.inferColumnTypes=true`, `01:104`). Batch reads map
directly onto ``spark.read`` with per-format inference options.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["SUPPORTED_FORMATS", "read_batch", "infer_schema"]

SUPPORTED_FORMATS = ("parquet", "json", "csv", "avro", "orc", "text")


def _reader(spark: SparkSession, fmt: str, infer: bool = True):
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported raw_file_format {fmt!r}; one of {SUPPORTED_FORMATS}")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", str(infer).lower())
    if fmt in ("parquet", "orc") and infer:
        # Union the schema across ALL files: a single footer would miss
        # columns that only newer files carry (schema evolution, R4).
        reader = reader.option("mergeSchema", "true")
    # json/avro infer types natively across the file set.
    return reader


def read_batch(
    spark: SparkSession, fmt: str, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Read raw entity files as a batch DataFrame with type inference
    (or an explicit schema when the caller already inferred one)."""
    reader = _reader(spark, fmt, infer=schema is None)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def infer_schema(spark: SparkSession, fmt: str, path: str) -> T.StructType:
    """Infer a schema from the files currently at ``path``.

    This is the Auto-Loader-gap shim (SURVEY.md §7.4): OSS streaming
    file sources require an explicit schema, so we batch-infer from
    the current file set and hand the result to ``readStream``. On a
    100 TB feed, point this at a bounded sample directory or rely on
    parquet/orc footer-only inference (no data scan).
    """
    return read_batch(spark, fmt, path).schema
