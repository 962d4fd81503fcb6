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


# ---------------------------------------------------------------------------
# mm04 — feature extraction over binary blobs (Arrow-batched).
# Registered in the registry OVERFLOW section.
# ---------------------------------------------------------------------------

_MM04_P = 1_000_000_007

# sf_dirs whose single-byte-corpus assumption has been verified this app.
_MM04_VERIFIED_DIRS: set = set()


def _ensure_single_byte_corpus(spark, docs, sf_dir: str, who: str) -> None:
    """The mm04/mm05 oracles replay BYTE computations over CHARACTERS
    (substring/ascii SQL) — parity holds only on a single-byte corpus.
    Enforce that assumption instead of assuming it: a multi-byte
    character after a testdata regen must fail HERE with a named
    cause, not as an opaque driver hash mismatch. Memoized per
    (application, sf_dir) — the corpus is immutable per dir, so
    repeated invocations (bench best-of-N) pay one scan."""
    probe_key = (spark.sparkContext.applicationId, sf_dir)
    if probe_key in _MM04_VERIFIED_DIRS:
        return
    bad = docs.where(
        F.octet_length("text") != F.length("text")
    ).limit(1).count()
    if bad:
        raise ValueError(
            f"{who} oracle parity requires a single-byte (ASCII) corpus: "
            "found a document whose UTF-8 byte length differs from its "
            "character length — re-derive the oracle with byte-accurate "
            "SQL or exclude multi-byte documents."
        )
    _MM04_VERIFIED_DIRS.add(probe_key)

_MM04_ORACLE = f"""
WITH b AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n,
         (octet_length(encode(text)) + 7) // 8 AS step
  FROM documents
), per_chunk AS (
  SELECT doc_id, n, t.i AS i,
         COALESCE(list_sum(list_transform(
           string_split(substring(text, CAST(t.i * step + 1 AS INT),
                                  CAST(step AS INT)), ''),
           ch -> CAST(ascii(ch) AS BIGINT))), 0) AS s
  FROM b, UNNEST(range(0, 8)) AS t(i)
), vecs AS (
  SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_bytes,
         list(s ORDER BY i) AS fs
  FROM per_chunk GROUP BY doc_id
)
SELECT doc_id, n_bytes,
       fs[1] AS f0, fs[4] AS f3, fs[8] AS f7,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
         list_transform(fs, x -> x % {_MM04_P})),
         (acc, x) -> (acc * 131 + x) % {_MM04_P}) AS checksum
FROM vecs
ORDER BY doc_id
"""


@register("mm04_byte_chunk_features", oracle=_MM04_ORACLE)
def mm04_byte_chunk_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-from-media featurization with the Spark plumbing
    real: blobs (documents.text UTF-8-encoded, the mm-family binary
    stand-in) flow through an Arrow-batched pandas_udf that emits an
    8-dim exact-int chunk-sum feature vector per blob
    (operators/multimodal.byte_chunk_features — a production encoder
    swaps only the numpy body). The DuckDB oracle replays the byte
    chunking over the same single-byte corpus, pinning every feature
    via two probe dims + a poly-fold checksum (the ss07 scalarization
    convention). Map-only: no shuffle anywhere before the ORDER BY."""
    from ..functions import POLY_P
    from ..operators.multimodal import byte_chunk_features

    docs = table(spark, sf_dir, "documents").withColumn(
        "blob", F.encode(F.col("text"), "UTF-8")
    )
    _ensure_single_byte_corpus(spark, docs, sf_dir, "mm04")
    feats = byte_chunk_features(docs, "blob", n_chunks=8)
    vals = F.transform(F.col("_feat"), lambda x: x % POLY_P)
    checksum = F.aggregate(
        vals,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(131) + x) % F.lit(POLY_P),
    )
    return feats.select(
        "doc_id",
        F.octet_length("blob").cast("long").alias("n_bytes"),
        F.element_at("_feat", 1).alias("f0"),
        F.element_at("_feat", 4).alias("f3"),
        F.element_at("_feat", 8).alias("f7"),
        checksum.alias("checksum"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# mm05 — media near-dup pairs: byte-k-gram SimHash over blobs.
# Registered in the registry OVERFLOW section.
# ---------------------------------------------------------------------------

_MM05_K, _MM05_BITS, _MM05_HAMMING = 4, 30, 4

_MM05_ORACLE = f"""
WITH v AS (
  SELECT doc_id, source,
         list_transform(string_split(text, ''),
                        ch -> CAST(ascii(ch) AS BIGINT)) AS v
  FROM documents
), g AS (
  SELECT doc_id, source,
         CAST(greatest(len(v) - {_MM05_K - 1}, 1) AS BIGINT) AS m,
         list_transform(range(1, greatest(len(v) - {_MM05_K - 1}, 1) + 1),
           i -> (((((COALESCE(v[i], 0) * 131 + COALESCE(v[i+1], 0))
                    % {_MM04_P}) * 131 + COALESCE(v[i+2], 0))
                    % {_MM04_P} * 131 + COALESCE(v[i+3], 0))
                    % {_MM04_P})) AS grams
  FROM v
), hs AS (
  SELECT doc_id, source,
         CAST(list_sum(list_transform(range(0, {_MM05_BITS}),
           j -> CASE WHEN 2 * list_sum(list_transform(grams,
                       h -> (h >> CAST(j AS BIGINT)) & 1)) > m
                THEN (CAST(1 AS BIGINT) << CAST(j AS BIGINT))
                ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS simhash
  FROM g
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM hs a JOIN hs b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {_MM05_HAMMING}
"""


@register("mm05_media_simhash_pairs", oracle=_MM05_ORACLE)
def mm05_media_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media NEAR-dup candidates — the fingerprint exact content-hash
    dedup can't provide (one changed byte defeats it): each blob's
    byte-4-gram SimHash (operators/multimodal.byte_simhash — raw
    bytes, no tokenizer, the form real image/audio blobs use
    unchanged), then pairs within hamming ≤ 4 of 30 bits inside a
    source block. The Arrow kernel is the featurizer stand-in shape
    (swap the numpy body, keep batching/schema); pair generation is
    Catalyst XOR+popcount inside the blocked equi-join — whole-stage
    codegen, no Python in the quadratic stage. Honest signal note: on
    this synthetic text-as-bytes corpus the hamming histogram starts
    at 4 (490 pairs at sf0.01) because every doc shares English-ish
    byte statistics — real media near-dups (re-encodes, crops,
    truncations) separate far more sharply; the machinery, blocking
    and thresholds are what this row pins. The oracle replays grams,
    majority bits, XOR and popcount over characters — byte-identical
    on the single-byte corpus, which is PROBED, not assumed.

    Scale shape: fingerprinting is map-only and linear in blob bytes;
    the pair stage is quadratic ONLY within a block (at 100 TB block
    on perceptual prefixes or simhash bands, exactly like dd03's
    banding — the source block here stands in for that key)."""
    from ..operators.multimodal import byte_simhash

    docs = table(spark, sf_dir, "documents").withColumn(
        "blob", F.encode(F.col("text"), "UTF-8")
    )
    _ensure_single_byte_corpus(spark, docs, sf_dir, "mm05")
    # Eager checkpoint: the self-join reads hs TWICE — without it each
    # side re-runs the Arrow fingerprint pass over every blob.
    hs = (
        byte_simhash(docs, "blob", k=_MM05_K, bits=_MM05_BITS)
        .select("doc_id", "source", "simhash")
        .localCheckpoint(eager=True)
    )
    a, b = hs.alias("a"), hs.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .where(F.col("hamming") <= _MM05_HAMMING)
    )
