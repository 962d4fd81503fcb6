"""Training-layout operators: deterministic corpus shuffle, sharding,
and token-budget sequence packing.

The last step of every LLM data pipeline: documents leave the engine
as N shards of fixed-token-budget training sequences in a pseudorandom
but REPRODUCIBLE order. Three properties matter at 100 TB:

- **Determinism.** The shuffle key is the engine-portable polynomial
  hash (`functions.poly_hash`) of ``salt + ":" + id`` — re-running the
  pipeline, recompacting inputs, or changing partitioning cannot change
  the layout (unlike ``df.orderBy(rand(seed))``, whose sample depends
  on partition boundaries). A new salt is a fresh epoch-level reshuffle.
- **No global sort.** shard = hash % n_shards distributes documents
  uniformly; ordering + packing happen per shard inside ONE window
  (one hash shuffle, no range exchange, no driver involvement). Pick
  n_shards so a shard's rows fit a partition's sort budget — at 100 TB
  that's just a bigger n_shards, the plan is unchanged.
- **Packing is a running sum**, not a bin-packing search: documents are
  laid head-to-tail in shuffle order and a sequence boundary falls
  every ``budget`` tokens. ``seq_in_shard`` is the sequence where the
  document STARTS; ``offset_in_seq`` its start offset inside it —
  exactly the contiguous-concat packing GPT-style training uses (docs
  spill across sequence boundaries; the tokenizer consumer splits at
  token granularity).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import POLY_P, poly_hash
from .sampling import sample_hash_bucket

__all__ = [
    "pack_sequences",
    "pack_sequences_nosplit",
    "whitespace_token_count",
    "mix_sources",
    "train_split",
    "length_bucket",
]


def whitespace_token_count(text_col: Column | str) -> Column:
    """Whitespace token count, NULL-safe (NULL/empty text → 0)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n = F.size(F.filter(F.split(c, " "), lambda t: t != F.lit("")))
    return F.when(n > 0, n).otherwise(F.lit(0)).cast("long")


def pack_sequences(
    df: DataFrame,
    id_col: str,
    weight: Column,
    n_shards: int,
    budget: int,
    salt: str = "",
) -> DataFrame:
    """Assign every row a (shard, seq_in_shard, offset_in_seq) training
    position. ``weight`` is the row's token (or char) count; ``budget``
    the tokens per training sequence; ``salt`` the reshuffle epoch."""
    if n_shards <= 0 or budget <= 0:
        raise ValueError("n_shards and budget must be positive")
    skey = poly_hash(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    w = (
        Window.partitionBy("shard")
        .orderBy("_skey", id_col)  # id tiebreak: total order under collisions
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok = weight.cast("long").alias("_tok")
    out = (
        df.select(F.col(id_col), skey.alias("_skey"), tok)
        .withColumn("shard", (F.col("_skey") % n_shards).cast("int"))
        .withColumn("_cum", F.sum("_tok").over(w))
        .select(
            id_col,
            "shard",
            # Integer DIV, not floor(double /): at 100 TB a shard's
            # cumulative token count can pass 2^53, where double
            # division silently loses exactness.
            F.expr(f"(_cum - _tok) DIV {int(budget)}").alias("seq_in_shard"),
            ((F.col("_cum") - F.col("_tok")) % budget).alias("offset_in_seq"),
            F.col("_tok").alias("n_tokens"),
        )
    )
    return out


def train_split(key: Column | str, fractions: dict[str, float]) -> Column:
    """Deterministic train/val/test assignment from a stable key hash.

    The held-out split is THE thing a training pipeline must never
    recompute differently: a seed-based ``randomSplit`` changes
    membership when the corpus is recompacted or repartitioned, which
    silently leaks eval docs into training. Here membership is a pure
    function of the row's key — `sample_hash_bucket` (Knuth
    multiplicative mod the poly prime), split by cumulative integer
    thresholds — so the same doc lands in the same split across runs,
    partitionings, and engines (oracle-replayable in plain SQL).

    ``fractions`` maps split name -> fraction; they must sum to ~1.
    Scalar CASE expression: no shuffle, pushdown-friendly.
    """
    total = sum(fractions.values())
    if not fractions or abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bad = {n: f for n, f in fractions.items() if not 0.0 < f <= 1.0}
    if bad:
        # A negative or >1 fraction still sums to 1 with the others but
        # produces an empty or overlapping split — the silent eval-leak
        # this operator exists to prevent.
        raise ValueError(f"each split fraction must be in (0, 1], got {bad}")
    bucket = sample_hash_bucket(key)
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        # Thresholds are computed driver-side and inlined as int64
        # literals, so both engines compare against the identical
        # constant — no in-engine float->int edge to disagree on.
        thresh = F.lit(int(cum * POLY_P))
        cond = bucket < thresh
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    return (expr.otherwise(last) if expr is not None else last).alias("split")


def length_bucket(weight: Column, caps: list[int]) -> Column:
    """Smallest training context length >= the row's token count.

    Training batches pad every sequence to a fixed context length, so
    the choice of length buckets decides padding waste — the first
    accounting question a data pipeline answers before packing. Buckets
    are EXPLICIT integer boundaries (e.g. 128/256/512/1024), compared
    with exact integer predicates — not ``2^ceil(log2(n))``, whose
    float log is engine-dependent at exact powers of two. Rows longer
    than the largest cap get bucket -1 ("chunked": such docs are split,
    not padded). Scalar CASE: map-only, pushdown-friendly.
    """
    if not caps or sorted(caps) != list(caps) or len(set(caps)) != len(caps):
        raise ValueError("caps must be strictly increasing and non-empty")
    w = weight.cast("long")
    expr = None
    for cap in caps:
        cond = w <= F.lit(cap)
        expr = F.when(cond, F.lit(cap)) if expr is None else expr.when(cond, F.lit(cap))
    return expr.otherwise(F.lit(-1)).cast("long").alias("bucket_cap")


def mix_sources(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    epochs: dict[str, float],
    default_epochs: float = 1.0,
) -> DataFrame:
    """Dataset mixing by epoch weights — the LLaMA-style data schedule
    where source s is seen ``epochs[s]`` times per training pass
    (2.5 = two full repeats plus a deterministic 50% subset; 0.4 = a
    40% subset; 0 = source excluded).

    Each kept copy carries an ``epoch`` tag (0-based) so downstream
    packing can interleave repeats. The fractional epoch's membership
    uses the same stable key-hash as ``deterministic_sample`` —
    reproducible across runs, partitionings, and engines, and the
    whole operator is a generator + scalar filter: no shuffle, no RNG
    state, flatMap-shaped at 100 TB (output ≈ Σ epochs·|stratum|).
    """
    expr = None
    for s, e in epochs.items():
        if e < 0:
            raise ValueError(f"negative epochs for stratum {s!r}")
        cond = F.col(stratum_col) == F.lit(s)
        expr = F.when(cond, F.lit(float(e))) if expr is None else expr.when(cond, F.lit(float(e)))
    e_col = (
        expr.otherwise(F.lit(float(default_epochs)))
        if expr is not None
        else F.lit(float(default_epochs))
    )
    # floor() on BOTH the repeat count and the fractional threshold:
    # double->long CAST truncates in Spark but rounds in DuckDB, so the
    # oracle would diverge on exactly-half thresholds without it.
    k = F.floor(e_col).cast("long")
    frac_thresh = F.floor((e_col - F.floor(e_col)) * F.lit(POLY_P)).cast("long")
    bucket = sample_hash_bucket(key_col)
    return (
        df.withColumn("_k", k)
        .withColumn("_ft", frac_thresh)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0).cast("long"), F.col("_k"))))
        .where((F.col("epoch") < F.col("_k")) | (bucket < F.col("_ft")))
        .drop("_k", "_ft")
    )


def pack_sequences_nosplit(
    df: DataFrame,
    id_col: str,
    weight: Column,
    n_shards: int,
    budget: int,
    salt: str = "",
) -> DataFrame:
    """NO-SPLIT packing: the pack_sequences layout (same poly-hash
    shuffle key, same shard assignment, same per-shard order) but a
    document never crosses a sequence boundary — when the current
    sequence lacks room, the doc opens a fresh one at offset 0 (the
    shelf/greedy bin packing every instruction-tuning pipeline uses,
    where splitting an example mid-document corrupts it; contrast
    pretraining's contiguous-concat pack_sequences). An oversize doc
    (weight > budget) still gets placed, alone, at offset 0 of its own
    overflowing sequence; the NEXT doc always opens a new one. The
    price of whole documents is padding: (budget - fill) dead tokens
    wherever a boundary forces a break — pk08 accounts for it.

    Placement is inherently SEQUENTIAL within a shard (each doc's
    offset depends on every prior doc's), so this is the sanctioned
    Arrow path: one ``applyInPandas`` over the shard — the PARALLEL
    grain stays the shard exactly as in pack_sequences (at 100 TB you
    raise n_shards, not the per-task algorithm; a shard's rows already
    had to fit one task's window sort there). The recurrence itself is
    an interpreted per-row Python loop — unavoidable, it IS the
    sequential dependency — over numpy in/out arrays; size n_shards so
    a shard's row count keeps that loop's share of task time small.
    DuckDB replays it with a recursive CTE stepping row-rank in
    lockstep across shards (pk08's oracle), so the layout stays
    engine-portable despite being non-window SQL."""
    import pandas as pd

    if n_shards <= 0 or budget <= 0:
        raise ValueError("n_shards and budget must be positive")
    skey = poly_hash(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    staged = (
        df.select(F.col(id_col), skey.alias("_skey"), weight.cast("long").alias("_tok"))
        .withColumn("shard", (F.col("_skey") % n_shards).cast("int"))
    )

    schema = (
        f"{id_col} long, shard int, seq_in_shard long, "
        "offset_in_seq long, n_tokens long"
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_skey", id_col], kind="mergesort")
        toks = pdf["_tok"].to_numpy()
        seqs = np.empty(len(toks), dtype=np.int64)
        offs = np.empty(len(toks), dtype=np.int64)
        seq, cum = 0, 0
        for i, t in enumerate(toks):
            if cum > 0 and cum + t > budget:
                seq, cum = seq + 1, 0
            seqs[i] = seq
            offs[i] = cum
            cum += t
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                "shard": pdf["shard"].to_numpy(),
                "seq_in_shard": seqs,
                "offset_in_seq": offs,
                "n_tokens": toks,
            }
        )

    return staged.groupBy("shard").applyInPandas(_pack, schema)
