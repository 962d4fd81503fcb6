"""Multimodal-column queries (X12): binary media columns with typed
metadata. The testdata has no media blobs, so the query materializes
binary columns from document text (UTF-8 encode) — the Spark-side
plumbing (binary type, octet arithmetic, metadata struct, Arrow-batched
decode) is identical to real media; only the bytes are textual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.multimodal import attach_media_meta, media_byte_stats
from . import register

# ---------------------------------------------------------------------------
# mm01 — binary byte stats per group
# ---------------------------------------------------------------------------

_MM01_ORACLE = """
SELECT source AS grp,
       COUNT(*) AS n,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(SUM(octet_length(encode(text))) AS DOUBLE)/COUNT(*) AS avg_bytes
FROM documents
GROUP BY source
"""


@register("mm01_media_byte_stats", oracle=_MM01_ORACLE)
def mm01_media_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary byte statistics per source — octet_length over a
    binary column, grouped; the same aggregation shape used for real
    media partitioning decisions (skew by blob size)."""
    docs = table(spark, sf_dir, "documents").withColumn(
        "blob", F.encode(F.col("text"), "UTF-8")
    )
    stats = media_byte_stats(docs, "blob", "source")
    return stats.select(F.col("source").alias("grp"), "n", "total_bytes", "avg_bytes")


# ---------------------------------------------------------------------------
# mm02 — metadata struct projection
# ---------------------------------------------------------------------------

_MM02_ORACLE = """
SELECT doc_id,
       'image' AS media_type,
       'png' AS format,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
"""


@register("mm02_media_meta", oracle=_MM02_ORACLE)
def mm02_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed media-metadata struct beside the blob, projected to its
    deterministic fields (type/format literals + byte length). The
    struct itself can't enter the flat oracle hash, but this
    projection replays exactly in SQL — so the metadata VALUES are
    oracle-pinned, not just row-counted (was rows-only through
    round 5)."""
    docs = table(spark, sf_dir, "documents").withColumn(
        "blob", F.encode(F.col("text"), "UTF-8")
    )
    with_meta = attach_media_meta(docs, "blob", media_type="image", fmt="png")
    return with_meta.select(
        "doc_id",
        F.col("media_meta.media_type").alias("media_type"),
        F.col("media_meta.format").alias("format"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
    )


# ---------------------------------------------------------------------------
# mm03 — frame-sampling manifest. Registered in the registry OVERFLOW
# section.
# ---------------------------------------------------------------------------

_MM03_ORACLE = """
SELECT doc_id AS media_id,
       CAST(off // 64 AS BIGINT) AS frame_idx,
       CAST(off AS BIGINT) AS byte_offset
FROM documents, UNNEST(range(0, GREATEST(octet_length(encode(text)), 1), 64)) AS t(off)
WHERE doc_id % 50 = 0
"""


@register("mm03_frame_manifest", oracle=_MM03_ORACLE)
def mm03_frame_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling manifest: one row per sampled offset of each
    blob (every 64 bytes) — the executor-side posexplode shape video
    frame extraction uses (offsets computed in-plan, decode happens in
    a downstream Arrow kernel; no driver involvement). Offsets are
    pure arithmetic, so the manifest is exactly oracle-replayable."""
    from ..operators.multimodal import sample_frames

    docs = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 50 == 0)
        .withColumn("blob", F.encode(F.col("text"), "UTF-8"))
    )
    out = sample_frames(docs, "doc_id", "blob", every_n_bytes=64)
    return out.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.col("byte_offset").cast("long").alias("byte_offset"),
    )
