"""Test-table catalog: lazy access to the driver-generated parquet.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``{sf_dir}/{name}.parquet``.

All access is via ``spark.read.parquet`` so Catalyst sees a plain file
relation: predicate pushdown, column pruning and partition pruning all
apply (verify with ``df.explain()`` → ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["TABLES", "table", "register_views", "default_sf_dir"]

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one catalog table as a DataFrame (plain parquet scan).

    ``events.ts`` is physically TIMESTAMP(NANOS), which vanilla Spark
    rejects; we read nanos as int64 (legacy conf) and truncate to
    microseconds with exact integer division — same ns→µs truncation
    DuckDB applies, and no double-rounding (ns values exceed 2^53).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # Defensive: queries may run in a caller-owned SparkSession (the
    # round driver builds its own); pin the confs correctness depends
    # on. Session timezone decides the wall-clock of collected
    # timestamps — anything but UTC breaks oracle comparison.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F

        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every catalog table as a temp view for spark.sql use."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
