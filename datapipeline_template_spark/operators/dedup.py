"""Deduplication operators — the engine's core semantic (reference
R19) plus the LLM-pipeline fuzzy-dedup family (X9/X10).

Reference parity: the silver layer keeps the newest version of each
primary key — ``ROW_NUMBER() OVER (PARTITION BY pk ORDER BY
_ingested_at DESC)`` then ``_row_num == 1``
(`/root/reference/src/sdp_etl/transformations/02_silver_processing.py:120-129`).

Scale design (100 TB): the window form sorts every partition's full
row set. ``keep_latest`` instead uses ``max_by(struct(*), order_key)``
— an aggregate with a map-side partial combine, so each input
partition first reduces to ≤ |distinct keys in partition| rows before
the shuffle. Same result, typically far less shuffle I/O on
high-duplication CDC feeds. The window variant is kept for parity and
for when callers need the rank itself. Ties: the reference's ordering
is nondeterministic on equal ``_ingested_at``; we append tiebreaker
columns to make results reproducible (documented divergence,
SURVEY.md §7.3).

Fuzzy dedup lives here as composable candidate-pair generators:
MinHash-LSH, SimHash, n-gram Jaccard; embedding-cosine near-dup is in
``similarity``. All are pure DataFrame ops (no Python UDFs): shingle
→ hash → band → self-join on band bucket. Hashes are polynomial mod-p
(functions.poly_hash) so results are engine-portable and the DuckDB
oracle can replay them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import POLY_BASE, POLY_P

__all__ = [
    "keep_latest",
    "keep_latest_window",
    "exact_dedup",
    "shingle_tokens",
    "minhash_signature",
    "lsh_candidate_pairs",
    "simhash64",
    "ngram_jaccard_pairs",
]


# ---------------------------------------------------------------------------
# Keep-latest CDC dedup (R19)
# ---------------------------------------------------------------------------


def keep_latest(df: DataFrame, keys: list[str], order_cols: list[str]) -> DataFrame:
    """One row per key — the one with the greatest ``order_cols`` tuple.

    Aggregate form: ``max_by(struct(all_cols), struct(order_cols))``.
    Partial aggregation collapses duplicates map-side before the
    shuffle; with heavy CDC duplication this is the scalable plan
    (the window form shuffles every row). Include a unique column at
    the end of ``order_cols`` for deterministic ties.
    """
    payload = F.struct(*[F.col(c) for c in df.columns])
    order_key = F.struct(*[F.col(c) for c in order_cols])
    latest = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.max_by(payload, order_key).alias("_latest")
    )
    return latest.select("_latest.*")


def keep_latest_window(
    df: DataFrame, keys: list[str], order_cols: list[str], keep_rank: bool = False
) -> DataFrame:
    """Reference-shaped variant: row_number window, keep rank 1
    (`02_silver_processing.py:120-129`); ``_row_num`` dropped before
    returning unless requested (reference drops it too, `02:129`)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
    out = df.withColumn("_row_num", F.row_number().over(w)).where(F.col("_row_num") == 1)
    return out if keep_rank else out.drop("_row_num")


def exact_dedup(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Exact duplicate removal — hash-aggregate distinct on the subset
    (or all columns). Map-side combine makes this shuffle-light."""
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()


# ---------------------------------------------------------------------------
# Shingling + MinHash-LSH (X10)
# ---------------------------------------------------------------------------


def shingle_tokens(tokens: Column, k: int = 3, p: int = POLY_P, base: int = POLY_BASE) -> Column:
    """k-word shingles of an array<string>, each hashed to int64.

    Shingle hash = polynomial hash of the joined shingle text
    (words joined by a single space), mod p — reproducible in any
    engine, unlike xxhash64. Documents shorter than k words produce
    one shingle covering the whole document.
    """
    n = F.size(tokens)
    upper = F.greatest(n - F.lit(k - 1), F.lit(1))
    idx = F.sequence(F.lit(1), upper)
    shingle_text = lambda i: F.concat_ws(" ", F.slice(tokens, i, k))  # noqa: E731
    return F.transform(
        idx,
        lambda i: F.aggregate(
            F.filter(F.split(shingle_text(i), ""), lambda ch: ch != F.lit("")),
            F.lit(0).cast("long"),
            lambda acc, ch: (acc * F.lit(base) + F.ascii(ch)) % F.lit(p),
        ),
    )


def minhash_signature(shingle_hashes: Column, num_hashes: int = 32, p: int = POLY_P) -> Column:
    """MinHash signature: h_i(x) = (a_i*x + b_i) mod p, minimized over
    the shingle set, for i in [0, num_hashes).

    (a_i, b_i) are fixed odd/offset constants derived from i — no RNG,
    so signatures are deterministic and replayable in SQL. Max
    intermediate: a_i < 2^21, x < p ≈ 2^30 → product < 2^51 < int64.
    """
    # NB: one-arg lambdas only — PySpark passes the element index to
    # any extra lambda parameter (even defaulted ones).
    def _hash_fn(a: int, b: int):
        return lambda x: (x * F.lit(a) + F.lit(b)) % F.lit(p)

    sigs = []
    for i in range(num_hashes):
        a = 2 * i + 1_234_567  # odd multipliers, fixed schedule
        b = 9_876_543 + 31 * i
        sigs.append(F.array_min(F.transform(shingle_hashes, _hash_fn(a, b))))
    return F.array(*sigs)


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    signature_col: str,
    bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` bands of
    ``rows_per_band`` values; docs sharing ANY band land in the same
    bucket. Returns distinct candidate pairs (id_a < id_b).

    Scale: explode to (band_idx, band_hash) — the self-join is an
    equi-join on the bucket key, so Spark hash-partitions buckets
    across executors; no all-pairs blowup. Giant buckets (degenerate
    near-identical corpora) are the skew case — AQE skew-join splits
    them.
    """
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    banded = df.select(
        F.col(id_col).alias("_id"),
        F.explode(band_idx).alias("_band"),
        F.col(signature_col).alias("_sig"),
    ).select(
        "_id",
        "_band",
        F.concat_ws(
            "_", F.transform(F.slice("_sig", F.col("_band") * rows_per_band + 1, rows_per_band), lambda v: v.cast("string"))
        ).alias("_bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bucket") == F.col("b._bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash (X10)
# ---------------------------------------------------------------------------


def simhash64(token_hashes: Column, bits: int = 62) -> Column:
    """SimHash from per-token int64 hashes (default 62 usable bits —
    staying under the sign bit keeps the value positive in every
    engine's int64, which matters for oracle parity).

    For each bit position j, count tokens whose hash has bit j set;
    the simhash has bit j set iff that count exceeds half the tokens.
    Expressed as `bits` aggregate counts over the token array — stays
    in codegen, no UDF. Near-duplicates differ in few bits (compare
    with popcount of XOR ≤ k).
    """
    n = F.size(token_hashes)

    def _bit_counter(j: int):
        return lambda acc, h: acc + F.shiftright(h, j).bitwiseAND(F.lit(1))

    parts = []
    for j in range(bits):
        cnt = F.aggregate(token_hashes, F.lit(0).cast("long"), _bit_counter(j))
        parts.append(
            F.when(cnt * 2 > n, F.lit(2**j).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard pairs (X10) — the verification step after LSH
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    shingles_col: str,
    threshold: float,
    block_cols: list[str] | None = None,
) -> DataFrame:
    """Exact Jaccard similarity over shingle sets for pairs within the
    same block (blocking keeps the join from going quadratic; pass the
    LSH candidate pairs or a cheap key like (lang, length-bucket)).

    Jaccard computed set-wise: |A∩B| / |A∪B| with distinct shingle
    arrays. Returns (id_a, id_b, jaccard) for pairs ≥ threshold.
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(F.col(shingles_col)).alias("_sh"),
        *[F.col(c).alias(f"_blk_{i}") for i, c in enumerate(block_cols or [])],
    )
    a = base.alias("a")
    b = base.alias("b")
    cond = F.col("a._id") < F.col("b._id")
    for i in range(len(block_cols or [])):
        cond = cond & (F.col(f"a._blk_{i}") == F.col(f"b._blk_{i}"))
    inter = F.size(F.array_intersect(F.col("a._sh"), F.col("b._sh")))
    union = F.size(F.array_union(F.col("a._sh"), F.col("b._sh")))
    jac = inter.cast("double") / union.cast("double")
    return (
        a.join(b, cond)
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            jac.alias("jaccard"),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
    )
