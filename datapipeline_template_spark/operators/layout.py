"""Physical layout operators (reference R23/R24 analogs).

The reference relies on Databricks Liquid Clustering + Delta
data-skipping stats (`02_silver_processing.py:82-92`, `02:148`). On
OSS Spark with parquet tables, the equivalent levers are:

- **range-cluster the files** on the configured clustering columns:
  ``repartitionByRange(cols).sortWithinPartitions(cols)`` before the
  write. Each output file then covers a narrow range of the cluster
  key, so parquet row-group min/max stats (always collected) give the
  same file/row-group skipping Liquid Clustering buys — any engine
  reading the table prunes on the footer stats.
- **file sizing**: range partitioning also fixes the small-file
  problem the reference addresses with optimizeWrite/autoCompact.

At 100 TB: repartitionByRange samples the key distribution, so skewed
keys still yield balanced files; the shuffle it introduces replaces —
not adds to — the write's round-robin shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["cluster_for_layout", "write_bucketed"]


def cluster_for_layout(
    df: DataFrame, cluster_cols: list[str] | None, num_files: int | None = None
) -> DataFrame:
    """Range-partition + sort so data files are clustered on
    ``cluster_cols`` (data-skipping layout). No-op without columns."""
    if not cluster_cols:
        return df
    cols = [c for c in cluster_cols if c in df.columns]
    if not cols:
        return df
    if num_files:
        out = df.repartitionByRange(num_files, *cols)
    else:
        out = df.repartitionByRange(*cols)
    return out.sortWithinPartitions(*cols)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist a table hash-bucketed (and optionally sorted) on its
    join key — the co-located-join layout for repeated big joins.

    Two tables bucketed on the same key with the same bucket count
    join WITHOUT any Exchange: every bucket pair is already
    co-partitioned, so a 100 TB fact-fact join skips its dominant
    shuffle entirely (verified by plan inspection in tests). This is
    the OSS equivalent of pre-clustering both sides of a recurring
    join — pay one shuffle at write time, amortized over every
    subsequent join.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
