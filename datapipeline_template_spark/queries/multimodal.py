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


# ---------------------------------------------------------------------------
# mm06 — perceptual (DCT-grid pHash) media near-dup: re-encoded twins.
# Registered in the registry OVERFLOW section.
# ---------------------------------------------------------------------------

_MM06_HAMMING = 3
_MM06_TWIN_OFFSET = 1_000_000


def _mm06_oracle() -> str:
    """Generated oracle: the integer pHash replayed in SQL. The DCT
    basis is SINGLE-SOURCED from operators.multimodal.PHASH_DCT_1024
    (the ss29 sign-matrix rule — plan and oracle can never disagree on
    the matrix); T = D·G·Dᵀ expands to 64 cells of 64 constant-weight
    terms over the row-major grid list."""
    from ..operators.multimodal import PHASH_DCT_1024 as D

    cells = []
    for u in range(8):
        for v in range(8):
            terms = " + ".join(
                f"({D[u][x] * D[v][y]})*g[{x * 8 + y + 1}]"
                for x in range(8)
                for y in range(8)
            )
            cells.append(f"({terms})")
    tv = ",\n    ".join(cells)
    return f"""
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_MM06_TWIN_OFFSET} AS doc_id, replace(text, 'e', 'f') AS text
  FROM documents WHERE doc_id % 10 = 0
), b AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n,
         (octet_length(encode(text)) + 63) // 64 AS step
  FROM base
), cells AS (
  SELECT doc_id, t.i AS i,
         COALESCE(list_sum(list_transform(
           string_split(substring(text, CAST(t.i * step + 1 AS INT),
                                  CAST(step AS INT)), ''),
           ch -> CAST(ascii(ch) AS BIGINT))), 0) AS s
  FROM b, UNNEST(range(0, 64)) AS t(i)
), grid AS (
  SELECT doc_id, list(s ORDER BY i) AS g FROM cells GROUP BY doc_id
), dct AS (
  SELECT doc_id, [
    {tv}
  ] AS tv FROM grid
), f AS (
  SELECT doc_id, list_slice(tv, 2, 64) AS f FROM dct
), med AS (
  SELECT doc_id, f, list_sort(f)[32] AS med FROM f
), ph AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, 63),
           i -> CASE WHEN f[CAST(i + 1 AS INT)] > med
                THEN (CAST(1 AS BIGINT) << CAST(i AS BIGINT))
                ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS phash
  FROM med
), bands AS (
  SELECT doc_id, CAST(bb AS BIGINT) AS band,
         (phash >> CAST(16 * bb AS BIGINT)) & 65535 AS key
  FROM ph, UNNEST(range(0, 4)) AS u(bb)
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       CAST(bit_count(xor(pa.phash, pb.phash)) AS BIGINT) AS hamming,
       (c.id_b = c.id_a + {_MM06_TWIN_OFFSET}) AS is_twin
FROM cand c
JOIN ph pa ON pa.doc_id = c.id_a
JOIN ph pb ON pb.doc_id = c.id_b
WHERE bit_count(xor(pa.phash, pb.phash)) <= {_MM06_HAMMING}
ORDER BY c.id_a, c.id_b
"""


@register("mm06_media_phash_pairs", oracle=_mm06_oracle())
def mm06_media_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual media near-dup via integer DCT-grid pHash
    (operators/multimodal.byte_phash64) — the RE-ENCODE catcher mm05's
    byte-4-gram SimHash misses: re-encoding rewrites byte k-grams but
    preserves low-frequency structure. The fixture bakes its own
    truth: every 10th doc gets a "re-encoded" twin (same content,
    every 'e'→'f' — small in-place amplitude noise, the grid-sum
    analog of a JPEG quality bump) at id + 1e6; the query fingerprints
    the mixed corpus, bands the 63-bit hashes into 4×16-bit segments
    (pigeonhole: ANY pair within hamming ≤ 3 shares an intact band —
    recall 1.0 by construction at the verify threshold), equi-joins on
    (band, key), and verifies popcount(xor) ≤ 3 in codegen.

    MEASURED at sf0.01: twins sit at hamming 0 (44/50) or 2 (6/50);
    the closest CONTROL pair sits at hamming 4 — the output is
    exactly the 50 twins, zero false positives, pinned by is_twin in
    the hash-compared result. mm05's SimHash on the same fixture
    would score twins ~unchanged too (in-place noise preserves most
    4-grams); the discriminating case is LENGTH-changing re-encodes,
    where gram sets diverge but the stride grid re-normalizes —
    byte_phash64's docstring carries that contract.

    Scale shape: fingerprinting is map-only Arrow; candidates are a
    banded equi-join (the dd03 shape — never all-pairs); verification
    touches candidates only."""
    from ..operators.multimodal import byte_phash64

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    _ensure_single_byte_corpus(spark, docs, sf_dir, "mm06")
    twins = (
        docs.where(F.col("doc_id") % 10 == 0)
        .select(
            (F.col("doc_id") + _MM06_TWIN_OFFSET).alias("doc_id"),
            F.translate("text", "e", "f").alias("text"),
        )
    )
    blobs = docs.unionByName(twins).withColumn(
        "blob", F.encode("text", "UTF-8")
    )
    ph = (
        byte_phash64(blobs, "blob")
        .select("doc_id", "phash")
        .localCheckpoint(eager=True)
    )
    bands = ph.select(
        "doc_id",
        "phash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
    ).select(
        "doc_id",
        "band",
        F.expr("shiftright(phash, CAST(band * 16 AS INT))")
        .bitwiseAND(F.lit(65535))
        .alias("key"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    pa = ph.select(F.col("doc_id").alias("id_a"), F.col("phash").alias("_pa"))
    pb = ph.select(F.col("doc_id").alias("id_b"), F.col("phash").alias("_pb"))
    hamming = F.bit_count(F.col("_pa").bitwiseXOR(F.col("_pb"))).cast("long")
    return (
        cand.join(pa, "id_a")
        .join(pb, "id_b")
        .withColumn("hamming", hamming)
        .where(F.col("hamming") <= _MM06_HAMMING)
        .select(
            "id_a",
            "id_b",
            "hamming",
            (F.col("id_b") == F.col("id_a") + _MM06_TWIN_OFFSET).alias(
                "is_twin"
            ),
        )
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# mm07 — CDC-chunk media near-dup: the LENGTH-CHANGING edit catcher.
# Registered in the registry OVERFLOW section.
# ---------------------------------------------------------------------------

_MM07_DIVISOR = 3
_MM07_CUT = 40  # leading bytes removed by the "retag" edit
_MM07_MIN_CHARS = 250  # twins only for blobs where the cut is a minor edit
_MM07_T = 500

_MM07_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_MM06_TWIN_OFFSET} AS doc_id,
         substring(text, {_MM07_CUT + 1}) AS text
  FROM documents WHERE doc_id % 10 = 0 AND n_chars >= {_MM07_MIN_CHARS}
), tk AS (
  SELECT doc_id, string_split(text, ' ') AS ts,
         list_transform(string_split(text, ' '),
           t -> list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                    list_transform(string_split(t, ''),
                                   ch -> CAST(ascii(ch) AS BIGINT))),
                  (acc, x) -> (acc * 131 + x) % 1000000007)) AS th
  FROM base
), tok AS (
  SELECT doc_id, i, ts[i] AS tok,
         CASE WHEN th[i] % {_MM07_DIVISOR} = 0 THEN 1 ELSE 0 END AS b
  FROM tk, LATERAL (SELECT unnest(range(1, len(ts) + 1)) AS i) g
), cid AS (
  SELECT doc_id, i, tok,
         COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cno
  FROM tok
), chunks AS (
  SELECT doc_id, cno,
         array_to_string(list(tok ORDER BY i), ' ') AS chunk
  FROM cid GROUP BY doc_id, cno
), ch AS (
  SELECT doc_id, cno,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(chunk, ''),
                            c -> CAST(ascii(c) AS BIGINT))),
           (acc, x) -> (acc * 131 + x) % 1000000007) AS h
  FROM chunks
), cs AS (
  SELECT doc_id, list_distinct(list(h)) AS cset FROM ch GROUP BY doc_id
), csf AS (
  SELECT doc_id, cset FROM cs WHERE len(cset) > 0
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(len(list_filter(a.cset, x -> list_contains(b.cset, x)))
            AS BIGINT) AS inter_n,
       CAST(len(a.cset) + len(b.cset)
            - len(list_filter(a.cset, x -> list_contains(b.cset, x)))
            AS BIGINT) AS union_n,
       CAST((len(list_filter(a.cset, x -> list_contains(b.cset, x))) * 1000)
            // (len(a.cset) + len(b.cset)
                - len(list_filter(a.cset, x -> list_contains(b.cset, x))))
            AS BIGINT) AS jac_milli,
       (b.doc_id = a.doc_id + {_MM06_TWIN_OFFSET}) AS is_twin
FROM csf a JOIN csf b ON a.doc_id < b.doc_id
WHERE len(list_filter(a.cset, x -> list_contains(b.cset, x))) * 1000
      >= {_MM07_T} * (len(a.cset) + len(b.cset)
                      - len(list_filter(a.cset, x -> list_contains(b.cset, x))))
ORDER BY id_a, id_b
"""


@register("mm07_media_chunk_dedup", oracle=_MM07_ORACLE)
def mm07_media_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level media near-dup — the LENGTH-CHANGING edit catcher
    that completes the media-dedup triad: exact content hash catches
    bit-identical copies, byte-k-gram SimHash (mm05) catches in-place
    noise, DCT-grid pHash (mm06) catches re-encodes that preserve
    length — but a TRUNCATION or retag edit (drop the first 40 bytes:
    a stripped header, a trimmed intro) shifts every byte offset, so
    both the k-gram stream and mm06's stride grid de-align. CONTENT-
    DEFINED chunking (tx18's gear-hash operator, the FastCDC idea)
    re-synchronizes after the edit because boundaries are functions of
    local content only: the twins share every chunk past the cut
    neighborhood, and exact set Jaccard over chunk hashes (dd21's
    prefix-filter join — recall 1.0 by the lemma, never all-pairs)
    finds them.

    Fixture bakes its own truth: every 10th doc of ≥ 250 chars gets a
    40-byte-prefix-cut twin at id + 1e6 (shorter docs are excluded —
    cutting 40 of 54 bytes is a destructive edit, not a near-dup, and
    the first fixture cut measured exactly that: 100-byte cuts on
    170-char docs legitimately fell below J = 0.5). MEASURED at
    sf0.01 (divisor 3, J ≥ 0.5): all 27/27 eligible twins found at
    jac_milli 687–952, plus 25 original-original pairs — the corpus's
    OWN near-dups, the same structure dd21's 3-shingle join surfaces
    — and 3 original-to-foreign-twin pairs implied by them. Zero
    misses, nothing spurious.

    Scale shape: chunking is a map-only per-doc fold; chunk-hash sets
    are the prefix-filter join's input (rare-chunk blocking, verify
    on candidates only — the dd21 plan, plan-guarded there). Oracle
    replays boundaries, chunk hashes, and the brute-force set join in
    SQL."""
    from ..functions import poly_hash
    from ..operators.dedup import content_defined_chunks, prefix_filter_pairs

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )
    twins = docs.where(
        (F.col("doc_id") % 10 == 0) & (F.col("n_chars") >= _MM07_MIN_CHARS)
    ).select(
        (F.col("doc_id") + _MM06_TWIN_OFFSET).alias("doc_id"),
        F.expr(f"substring(text, {_MM07_CUT + 1}, 2147483647)").alias("text"),
    )
    base = docs.select("doc_id", "text").unionByName(twins)
    cset = F.array_distinct(
        F.transform(
            content_defined_chunks("text", divisor=_MM07_DIVISOR),
            lambda c: poly_hash(c),
        )
    )
    df = base.select("doc_id", cset.alias("cs")).where(F.size("cs") > 0)
    return (
        prefix_filter_pairs(df, "doc_id", "cs", _MM07_T)
        .withColumn(
            "is_twin", F.col("id_b") == F.col("id_a") + _MM06_TWIN_OFFSET
        )
        .orderBy("id_a", "id_b")
    )
