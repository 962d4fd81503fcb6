"""Property-based tests (SURVEY.md §5 item 4): hypothesis-generated
CDC event sequences → engine invariants."""

from __future__ import annotations

import pytest
import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datapipeline_template_spark.operators.cdc import drop_soft_deleted
from datapipeline_template_spark.operators.dedup import keep_latest, keep_latest_window

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("payload", T.LongType()),
    ]
)

events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # id (few keys → collisions)
        st.sampled_from(["I", "U", "D", None]),  # op incl. NULL
        st.integers(min_value=0, max_value=10_000),  # payload
    ),
    min_size=1,
    max_size=30,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, seq):
    rows = [
        Row(id=i, op=op, seq=n, payload=p) for n, (i, op, p) in enumerate(seq)
    ]
    return spark.createDataFrame(rows, SCHEMA)


@given(seq=events)
@settings(**_SETTINGS)
def test_silver_pk_uniqueness_and_latest_wins(spark, seq):
    df = _df(spark, seq)
    silver = keep_latest(df, ["id"], ["seq"])
    got = {r["id"]: r for r in silver.collect()}
    # invariant 1: exactly one row per key
    assert len(got) == len({i for i, _, _ in seq})
    # invariant 2: the surviving row is the highest-seq version
    last = {}
    for n, (i, op, p) in enumerate(seq):
        last[i] = (n, op, p)
    for i, (n, op, p) in last.items():
        assert got[i]["seq"] == n and got[i]["payload"] == p


@given(seq=events)
@settings(**_SETTINGS)
def test_window_and_aggregate_dedup_agree(spark, seq):
    df = _df(spark, seq)
    a = sorted(map(tuple, keep_latest(df, ["id"], ["seq"]).collect()))
    b = sorted(map(tuple, keep_latest_window(df, ["id"], ["seq"]).collect()))
    assert a == b


@given(seq=events)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_soft_delete_partition(spark, seq):
    """deleted ∪ active == silver and deleted ∩ active == ∅ (the
    reference's _active-view contract, with NULL op counting deleted)."""
    df = _df(spark, seq)
    silver = keep_latest(df, ["id"], ["seq"])
    active = drop_soft_deleted(silver)
    deleted = silver.where(~(F.col("op") != F.lit("D")) | F.col("op").isNull())
    n_silver = silver.count()
    assert active.count() + deleted.count() == n_silver
    both = active.select("id").intersect(deleted.select("id"))
    assert both.count() == 0


@given(seq=events)
@settings(**_SETTINGS)
def test_dedup_idempotent(spark, seq):
    df = _df(spark, seq)
    once = keep_latest(df, ["id"], ["seq"])
    twice = keep_latest(once, ["id"], ["seq"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


# ---------------------------------------------------------------------------
# MinHash kernel ≡ Catalyst form on adversarial corpora (ASCII + unicode)
# ---------------------------------------------------------------------------

ascii_texts = st.lists(
    st.text(
        # incl. space runs + punct + non-ASCII code points (é, 中, 😀 —
        # the emoji is an astral char: exercises the code-point-vs-
        # UTF-16/UTF-8-unit distinction in both engines)
        alphabet=st.sampled_from(list("ab z.!7") + ["é", "中", "😀"]),
        min_size=0,
        max_size=40,
    ),
    min_size=1,
    max_size=12,
)


@given(texts=ascii_texts, k=st.sampled_from([1, 2, 3, 5, 13]))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_minhash_kernel_matches_catalyst(spark, texts, k):
    """The vectorized numpy signature kernel must bit-agree with the
    Catalyst HOF pipeline on ANY corpus — including empty texts,
    leading/trailing/consecutive spaces (empty tokens hash to 0),
    docs shorter than the shingle width, and non-ASCII code points
    (the kernel folds UTF-32 code points to match F.ascii) — at EVERY
    shingle width (k spans unigram through GPT-3-style 13-gram)."""
    from datapipeline_template_spark.operators.dedup import (
        minhash_signatures,
        minhash_signatures_kernel,
        shingle_tokens,
    )
    from datapipeline_template_spark.operators.text import tokenize

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        T.StructType(
            [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
        ),
    )
    jvm = minhash_signatures(
        df.select("doc_id", shingle_tokens(tokenize("text"), k=k).alias("sh")),
        "doc_id",
        "sh",
    ).collect()
    knl = minhash_signatures_kernel(df, "doc_id", "text", k=k).collect()
    assert sorted((r[0], tuple(r[1])) for r in jvm) == sorted((r[0], tuple(r[1])) for r in knl)


def test_minhash_kernel_drops_null_text_like_catalyst(spark):
    """A NULL text row must be silently dropped by BOTH forms (the
    Catalyst size()>0 filter rejects null shingles; the kernel used to
    crash the whole job on `\" \".join([None, ...])`)."""
    from datapipeline_template_spark.operators.dedup import (
        minhash_signatures,
        minhash_signatures_kernel,
        shingle_tokens,
    )
    from datapipeline_template_spark.operators.text import tokenize

    df = spark.createDataFrame(
        [Row(doc_id=0, text="a clean doc"), Row(doc_id=1, text=None), Row(doc_id=2, text="another doc")],
        T.StructType(
            [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
        ),
    )
    jvm = minhash_signatures(
        df.select("doc_id", shingle_tokens(tokenize("text")).alias("sh")), "doc_id", "sh"
    ).collect()
    knl = minhash_signatures_kernel(df, "doc_id", "text").collect()
    assert sorted(r[0] for r in knl) == [0, 2]
    assert sorted((r[0], tuple(r[1])) for r in jvm) == sorted((r[0], tuple(r[1])) for r in knl)


# ---------------------------------------------------------------------------
# Snapshot-table log replay vs a pure-python model: any interleaving of
# append/overwrite/optimize must leave every version's visible rows
# equal to the model's, and vacuum must only break pre-tombstone reads.
# ---------------------------------------------------------------------------

snapshot_ops = st.lists(
    st.tuples(
        st.sampled_from(["append", "overwrite", "optimize"]),
        st.integers(min_value=1, max_value=5),  # rows in this write
    ),
    min_size=1,
    max_size=6,
)


@given(ops=snapshot_ops)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_snapshot_log_replay_matches_model(spark, ops):
    import shutil
    import tempfile

    from datapipeline_template_spark.plans.snapshots import SnapshotTable

    root = tempfile.mkdtemp(prefix="snapprop-")
    try:
        t = SnapshotTable(spark, root, checkpoint_interval=2)
        model: list[set[int]] = []  # per committed version: visible ids
        next_id = 0
        for kind, n in ops:
            if kind == "optimize":
                if not model:
                    continue
                v = t.optimize(target_file_bytes=512 * 1024 * 1024)
                if v is not None:
                    model.append(model[-1])
                continue
            ids = set(range(next_id, next_id + n))
            next_id += n
            df = spark.createDataFrame([(i,) for i in sorted(ids)], "x long").coalesce(1)
            t.write(df, mode=kind if kind == "overwrite" else "append")
            model.append(ids | (model[-1] if (model and kind == "append") else set()))
        if not model:
            return
        for v, want in enumerate(model):
            got = {r["x"] for r in t.read(version=v).collect()}
            assert got == want, f"version {v}"
        # Vacuum far in the future: the CURRENT version always survives.
        t.vacuum("interval 1 second",
                 now_ms=t._read_manifest(t.latest_version())["timestamp_ms"] + 10**10)
        assert {r["x"] for r in t.read().collect()} == model[-1]
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Round-4 training-layout operators: hypothesis invariants
# ---------------------------------------------------------------------------

layout_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # doc_id (dups possible)
        st.sampled_from(["a", "b", "c"]),            # stratum
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@given(rows=layout_rows)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_train_split_is_exhaustive_partition(spark, rows):
    """Every row lands in exactly one split, membership is a pure
    function of the key (stable under repartitioning), and the splits
    reunite to the input."""
    from datapipeline_template_spark.operators.packing import train_split

    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = df.select("doc_id", train_split("doc_id", {"train": 0.8, "val": 0.2}))
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(got) == len(rows)
    assert set(got.values()) <= {"train", "val"}
    out2 = df.repartition(5).select(
        "doc_id", train_split("doc_id", {"train": 0.8, "val": 0.2})
    )
    assert {r["doc_id"]: r["split"] for r in out2.collect()} == got


@given(rows=layout_rows, q=st.integers(min_value=0, max_value=12))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_quota_sample_size_law(spark, rows, q):
    """|sample ∩ stratum| == min(quota, |stratum|), for every stratum,
    at any quota."""
    from collections import Counter

    from datapipeline_template_spark.operators.sampling import quota_sample

    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = quota_sample(df, "doc_id", "src", {}, default_quota=q)
    sizes = Counter(r["src"] for r in out.collect())
    truth = Counter(s for _, s in rows)
    for stratum, n in truth.items():
        assert sizes.get(stratum, 0) == min(q, n), (stratum, q, n)


@given(rows=layout_rows, q=st.integers(min_value=0, max_value=12))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_quota_sample_prefilter_equals_window(spark, rows, q):
    """The threshold-prefilter path must pick EXACTLY the rows the
    single-reducer window form picks — bit-identical sample."""
    from datapipeline_template_spark.operators.sampling import quota_sample

    df = spark.createDataFrame(rows, "doc_id long, src string")
    fast = {(r["doc_id"], r["src"]) for r in
            quota_sample(df, "doc_id", "src", {}, default_quota=q).collect()}
    slow = {(r["doc_id"], r["src"]) for r in
            quota_sample(df, "doc_id", "src", {}, default_quota=q,
                         prefilter=False).collect()}
    assert fast == slow


def test_quota_sample_prefilter_bounds_window_input(spark):
    """On a 90%-skew stratum the pre-filter must shrink the window's
    input to ~slack*quota rows, not the whole stratum — the property
    that kills the 100 TB single-task sort."""
    from datapipeline_template_spark.operators.sampling import (
        _quota_window,
        quota_sample,
        sample_hash_bucket,
    )

    n = 20_000
    df = spark.range(n).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 10 = 0 THEN concat('rare', id % 3) ELSE 'big' END AS src",
    )
    q = 25
    out = quota_sample(df, "doc_id", "src", {}, default_quota=q)
    from collections import Counter

    sizes = Counter(r["src"] for r in out.select("src").collect())
    assert sizes["big"] == q and all(v == q for v in sizes.values())
    # Reconstruct the survivor predicate quota_sample built and check
    # the window input is bounded far under the stratum size.
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan  # threshold predicate made it into the plan
    # The big stratum is 18k rows; slack*q + margin = 164 expected
    # survivors. Allow generous randomness headroom, but require at
    # least a 10x reduction.
    from pyspark.sql import functions as F  # noqa: N812

    # Count rows passing the same prefilter quota_sample used by
    # rerunning it with an instrumented copy: survivors == rows whose
    # bucket < p*(slack*q+margin)/n_s for their stratum.
    POLY_P = 1_000_000_007
    big_n = n - n // 10
    thresh = int(POLY_P * (4.0 * q + 64) / big_n) + 1
    surv = df.where(
        (F.col("src") == "big")
        & (sample_hash_bucket("doc_id") < F.lit(thresh))
    ).count()
    assert q <= surv < big_n / 10, surv


def test_temperature_allocation_invariants():
    """Budget always fully allocated, leftover bumps < #strata, sqrt
    temperature flattens the head, zero-count strata dropped."""
    from datapipeline_template_spark.operators.sampling import temperature_allocation

    counts = {"en": 218, "zh": 75, "es": 73, "de": 70, "fr": 64}
    a = temperature_allocation(counts, 200)
    assert sum(a.values()) == 200
    # Head share shrinks vs proportional; tail share grows.
    assert a["en"] / 200 < counts["en"] / sum(counts.values())
    assert a["fr"] / 200 > counts["fr"] / sum(counts.values())
    # Deterministic: same input -> same dict.
    assert a == temperature_allocation(counts, 200)
    # Degenerate cases.
    assert temperature_allocation({}, 100) == {}
    assert temperature_allocation({"x": 0}, 100) == {}
    one = temperature_allocation({"x": 7}, 13)
    assert one == {"x": 13}
    # Exactness across a sweep of budgets (largest remainder never
    # over/under-allocates).
    for total in (0, 1, 7, 19, 101):
        assert sum(temperature_allocation(counts, total).values()) == total


# ---------------------------------------------------------------------------
# Round-5 operators: chunk dedup and interval join vs brute-force models
# ---------------------------------------------------------------------------

corpus_texts = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]),  # tiny vocab -> dup chunks
        min_size=1,
        max_size=17,
    ).map(" ".join),
    min_size=1,
    max_size=12,
)


@pytest.mark.slow
@given(texts=corpus_texts, chunk_tokens=st.sampled_from([2, 3, 5]))
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_chunk_dedup_matches_python_model(spark, texts, chunk_tokens):
    """chunk_dedup == the obvious sequential model: walk docs in id
    order, keep a chunk only the first time its value is seen."""
    from datapipeline_template_spark.operators.dedup import chunk_dedup

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_chunks"], r["n_dropped"])
        for r in chunk_dedup(df, "doc_id", "text", chunk_tokens=chunk_tokens).collect()
    }

    seen: set[str] = set()
    want = {}
    for i, t in rows:
        toks = t.split(" ")
        chunks = [
            " ".join(toks[j : j + chunk_tokens])
            for j in range(0, len(toks), chunk_tokens)
        ]
        kept = []
        dropped = 0
        for ch in chunks:
            if ch in seen:
                dropped += 1
            else:
                seen.add(ch)
                kept.append(ch)
        want[i] = (" ".join(kept), len(chunks), dropped)
    assert got == want


intervals_points = st.tuples(
    st.lists(st.integers(min_value=0, max_value=2000), min_size=1, max_size=25),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2000),
            st.integers(min_value=0, max_value=900),
        ),
        min_size=1,
        max_size=15,
    ),
)


@given(data=intervals_points, bin_width_s=st.sampled_from([60, 300, 600]))
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_interval_point_join_matches_brute_force(spark, data, bin_width_s):
    """Bin-bucketed interval join == the quadratic model, for every bin
    width (including widths much smaller than interval lengths →
    many-bin fan-out; exactly-once per qualifying pair)."""
    import datetime as dtm

    from datapipeline_template_spark.operators.interval import interval_point_join

    secs, ivals = data
    t0 = dtm.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dtm.timedelta(seconds=s)

    points = spark.createDataFrame(
        [(i, ts(s)) for i, s in enumerate(secs)], "pid long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(j, ts(lo), ts(lo + length)) for j, (lo, length) in enumerate(ivals)],
        "iid long, lo timestamp, hi timestamp",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_point_join(
            points, intervals, "ts", "lo", "hi", bin_width_s=bin_width_s
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, s in enumerate(secs)
        for j, (lo, length) in enumerate(ivals)
        if lo <= s <= lo + length
    )
    assert got == want


@given(texts=corpus_texts)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_dup_span_stats_matches_python_model(spark, texts):
    """dd12's duplicated-span coverage == the brute-force model:
    overlapping K-token windows, a window is dup iff its TOKEN TUPLE
    occurs >1 times corpus-wide, coverage = union of dup windows."""
    import duckdb  # noqa: F401 - keep import parity with parity tests

    from datapipeline_template_spark.queries import load_all

    K = 10
    rows = [(i, t) for i, t in enumerate(texts)]
    # Inline the dd12 pipeline on a temp view-free frame: reuse the
    # operator composition by calling the registered query's building
    # blocks directly.
    from pyspark.sql import functions as F

    from datapipeline_template_spark.operators.dedup import shingle_tokens
    from datapipeline_template_spark.operators.text import tokenize

    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = df.select(
        "doc_id", F.posexplode(shingle_tokens(tokenize("text"), k=K)).alias("pos", "h")
    )
    dup = sh.groupBy("h").count().where(F.col("count") > 1).select("h")
    cov = (
        sh.join(dup, "h")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(K - 1))).alias(
                "tokpos"
            ),
        )
        .groupBy("doc_id")
        .agg(F.countDistinct("tokpos").alias("n_dup_positions"))
    )
    got = {r["doc_id"]: r["n_dup_positions"] for r in cov.collect()}

    # Python model on token tuples (collision-free ground truth; the
    # poly hash is injective in practice on these tiny vocabularies).
    from collections import Counter

    wins = {}
    for i, t in rows:
        toks = t.split(" ")
        n = len(toks)
        idxs = range(max(n - K + 1, 1))
        wins[i] = [tuple((toks + [None] * K)[j : j + K]) for j in idxs]
    counts = Counter(w for ws in wins.values() for w in ws)
    want = {}
    for i, ws in wins.items():
        covered = set()
        for j, w in enumerate(ws):
            if counts[w] > 1:
                covered.update(range(j, j + K))
        if covered:
            want[i] = len(covered)
    assert got == want


# ---------------------------------------------------------------------------
# k-means assignment: kernel/Catalyst bit-parity on adversarial ints
# ---------------------------------------------------------------------------

# Quantized-range values incl. negatives and exact duplicates (ties).
_qvals = st.integers(min_value=-10_000, max_value=10_000)
_vecs = st.lists(
    st.lists(_qvals, min_size=4, max_size=4), min_size=3, max_size=10
)


@given(vecs=_vecs, k=st.sampled_from([1, 2, 3]))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_kmeans_assignment_kernel_catalyst_parity_property(spark, vecs, k):
    """The Arrow kernel and the Catalyst HOF assignment must agree on
    ARBITRARY int vectors — including duplicate vectors (argmin ties,
    which both must break toward the smallest cluster id) and
    negative coordinates. Centroids are drawn from the data itself so
    exact-tie distances actually occur."""
    from pyspark.sql import functions as F

    from datapipeline_template_spark.operators.clustering import (
        kmeans_assign,
        kmeans_assign_catalyst,
    )

    centroids = [vecs[i % len(vecs)] for i in range(k)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id long, qv array<long>"
    )
    a = sorted(
        map(tuple, kmeans_assign(df, "qv", centroids)
            .select("id", "cluster", "dist").collect())
    )
    b = sorted(
        map(tuple, kmeans_assign_catalyst(df, "qv", centroids)
            .select("id", "cluster", "dist").collect())
    )
    assert a == b


# ---------------------------------------------------------------------------
# BPE merge learning (tx20): the PINNED contract is the two-pass
# literal replace itself (shared verbatim with the DuckDB oracle);
# it equals canonical LTR merging for x != y, diverges on x == y
# runs >= 5 (order at 5, multiset at 6 — pinned below), and the
# learned merge table must be prefix-stable as rounds grow.
# ---------------------------------------------------------------------------


def _ltr_merge(symbols: list[str], x: str, y: str) -> list[str]:
    """Canonical Sennrich left-to-right non-overlapping BPE merge."""
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == x and symbols[i + 1] == y:
            out.append(x + y)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def _two_pass_merge(symbols: list[str], x: str, y: str) -> list[str]:
    """Python reference for the ACTUAL pinned spec: two single-scan
    left-to-right non-overlapping literal replaces on the sentinel
    string — str.replace has the same scan semantics as JVM
    ``F.replace`` and DuckDB ``replace``."""
    pat, rpl = f" {x} {y} ", f" {x}{y} "
    s = " " + " ".join(symbols) + " "
    return s.replace(pat, rpl).replace(pat, rpl).strip().split(" ")


@given(
    words=st.lists(
        st.lists(st.sampled_from(["a", "b", "ab", "ba", "c"]), min_size=1, max_size=8),
        min_size=1,
        max_size=6,
    ),
    pair=st.tuples(
        st.sampled_from(["a", "b", "ab", "c"]), st.sampled_from(["a", "b", "ab", "c"])
    ),
)
@settings(**_SETTINGS)
def test_bpe_double_replace_matches_python_reference(spark, words, pair):
    """bpe_merge_word == the Python two-pass reference (the pinned
    contract) on FULLY adversarial inputs: self-pairs (x == y),
    overlapping runs of any length up to 8, and symbols that are
    concatenations of others (ab vs a,b)."""
    from datapipeline_template_spark.operators.text import bpe_merge_word

    x, y = pair
    df = spark.createDataFrame(
        [(" " + " ".join(w) + " ",) for w in words], "rep string"
    )
    got = [
        r["out"].strip().split(" ")
        for r in df.select(
            bpe_merge_word(F.col("rep"), x, y).alias("out")
        ).collect()
    ]
    want = [_two_pass_merge(w, x, y) for w in words]
    assert got == want


@given(
    words=st.lists(
        st.lists(st.sampled_from(["a", "b", "ab", "ba", "c"]), min_size=1, max_size=8),
        min_size=1,
        max_size=6,
    ),
    pair=st.tuples(
        st.sampled_from(["a", "b", "ab", "c"]), st.sampled_from(["a", "b", "ab", "c"])
    ).filter(lambda p: p[0] != p[1]),
)
@settings(**_SETTINGS)
def test_bpe_double_replace_equals_ltr_for_distinct_pairs(spark, words, pair):
    """Under the documented precondition x != y, the two-pass replace
    equals canonical LTR merging (the bpe_merge_word guarantee)."""
    from datapipeline_template_spark.operators.text import bpe_merge_word

    x, y = pair
    df = spark.createDataFrame(
        [(" " + " ".join(w) + " ",) for w in words], "rep string"
    )
    got = [
        r["out"].strip().split(" ")
        for r in df.select(
            bpe_merge_word(F.col("rep"), x, y).alias("out")
        ).collect()
    ]
    want = [_ltr_merge(w, x, y) for w in words]
    assert got == want


def test_bpe_self_pair_run_divergence_pinned(spark):
    """The documented x == y divergence from canonical LTR, pinned
    exactly: runs < 5 agree; run 5 diverges in ORDER only (same token
    multiset); run 6 diverges in MULTISET (two-pass strands singles
    that LTR would pair). This is the counterexample family that
    makes the two-pass form a distinct (but self-consistent,
    oracle-shared) spec rather than Sennrich LTR."""
    from datapipeline_template_spark.operators.text import bpe_merge_word

    runs = {n: ["a"] * n for n in range(1, 7)}
    df = spark.createDataFrame(
        [(n, " " + " ".join(w) + " ") for n, w in runs.items()], "n int, rep string"
    )
    got = {
        r["n"]: r["out"].strip().split(" ")
        for r in df.select(
            "n", bpe_merge_word(F.col("rep"), "a", "a").alias("out")
        ).collect()
    }
    for n in (1, 2, 3, 4):
        assert got[n] == _ltr_merge(runs[n], "a", "a"), n
        assert got[n] == _two_pass_merge(runs[n], "a", "a"), n
    assert got[5] == ["aa", "a", "aa"]
    assert _ltr_merge(runs[5], "a", "a") == ["aa", "aa", "a"]
    assert sorted(got[5]) == sorted(_ltr_merge(runs[5], "a", "a"))
    assert got[6] == ["aa", "a", "aa", "a"]
    assert _ltr_merge(runs[6], "a", "a") == ["aa", "aa", "aa"]
    assert sorted(got[6]) != sorted(_ltr_merge(runs[6], "a", "a"))


def test_bpe_merge_table_prefix_stable(spark):
    """Learning N merges then N+2 merges must agree on the first N —
    each round's argmax depends only on prior rounds (the iterative
    contract tx20's unrolled oracle replays)."""
    from datapipeline_template_spark.operators.text import bpe_train

    rows = [
        (" " + " ".join("banana") + " ", 5),
        (" " + " ".join("bandana") + " ", 3),
        (" " + " ".join("cabana") + " ", 2),
        (" " + " ".join("an") + " ", 7),
    ]
    vocab = spark.createDataFrame(rows, "rep string, freq long")
    m4, _ = bpe_train(vocab, "rep", "freq", n_merges=4)
    m6, _ = bpe_train(vocab, "rep", "freq", n_merges=6)
    assert m6[:4] == m4
    assert len(m4) == 4


@given(
    weights=st.lists(
        st.integers(min_value=0, max_value=40), min_size=1, max_size=25
    ),
    budget=st.integers(min_value=1, max_value=16),
    n_shards=st.integers(min_value=1, max_value=4),
)
@settings(**_SETTINGS)
def test_nosplit_packing_matches_python_model(spark, weights, budget, n_shards):
    """pack_sequences_nosplit == the sequential shelf recurrence,
    replayed per shard in the operator's own (skey, id) order, over
    adversarial weights (zeros, oversize docs, budget-exact fits).
    Structural invariants: a fitting doc never crosses its sequence
    boundary; an oversize doc sits alone at offset 0."""
    from datapipeline_template_spark.functions import POLY_BASE, POLY_P
    from datapipeline_template_spark.operators.packing import (
        pack_sequences_nosplit,
    )

    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {
        r["doc_id"]: (
            r["shard"], r["seq_in_shard"], r["offset_in_seq"], r["n_tokens"]
        )
        for r in pack_sequences_nosplit(
            df, "doc_id", F.col("w"), n_shards=n_shards, budget=budget,
            salt="p",
        ).collect()
    }

    def ph(text):
        acc = 0
        for ch in text:
            acc = (acc * POLY_BASE + ord(ch)) % POLY_P
        return acc

    expect = {}
    for shard in range(n_shards):
        members = sorted(
            (d for d, _ in rows if ph(f"p:{d}") % n_shards == shard),
            key=lambda d: (ph(f"p:{d}"), d),
        )
        seq = cum = 0
        for d in members:
            t = weights[d]
            if cum > 0 and cum + t > budget:
                seq, cum = seq + 1, 0
            expect[d] = (shard, seq, cum, t)
            cum += t
    assert got == expect
    for _, (_, _, off, t) in got.items():
        if t <= budget:
            assert off + t <= budget
        else:
            assert off == 0


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        max_size=15,
    ),
    n_docs=st.integers(min_value=13, max_value=20),
)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_duplicate_discount_weights_properties(spark, edges, n_docs):
    """Over arbitrary candidate graphs: every doc appears exactly once,
    weights are exactly 1/cluster_size, and sum(weight) == number of
    clusters (singletons included) — the effective-corpus-size
    identity soft dedup exists to provide."""
    from datapipeline_template_spark.operators.dedup import (
        connected_components,
        duplicate_discount_weights,
    )

    edges = [(a, b) for a, b in edges if a != b]
    docs = spark.createDataFrame(
        [(i,) for i in range(n_docs)], "doc_id long"
    )
    if edges:
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        comp = connected_components(pairs, "id_a", "id_b")
    else:
        comp = spark.createDataFrame([], "node long, component long")
    rows = duplicate_discount_weights(docs, comp, "doc_id").collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(n_docs))
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append(r)
    for members in by_comp.values():
        for r in members:
            assert r["cluster_size"] == len(members)
            assert r["weight"] == 1.0 / len(members)
    assert abs(sum(r["weight"] for r in rows) - len(by_comp)) < 1e-9


# ---------------------------------------------------------------------------
# milli_log2 + KMV sketch properties
# ---------------------------------------------------------------------------


@settings(**_SETTINGS)
@given(
    xs=st.lists(
        st.integers(min_value=1, max_value=(1 << 54) - 1),
        min_size=1,
        max_size=12,
        unique=True,
    )
)
def test_milli_log2_exact_powers_monotone_and_bounded(spark, xs):
    """milli_log2 is exact at powers of two (1000·f), monotone
    nondecreasing, and under-approximates true log2 by less than
    87.2 mb (chord ≤ 86.07 + integer floor; exhaustively measured sup
    87.08 over x < 2^21) across the whole documented domain."""
    import math

    from datapipeline_template_spark.functions import milli_log2

    xs = sorted(xs)
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    got = {
        r["x"]: r["m"] for r in df.select("x", milli_log2("x").alias("m")).collect()
    }
    vals = [got[x] for x in xs]
    assert vals == sorted(vals)  # monotone over sorted distinct inputs
    for x in xs:
        true_mb = 1000 * math.log2(x)
        assert true_mb - 87.2 <= got[x] <= true_mb + 1e-6
        if x & (x - 1) == 0:  # power of two -> exact
            assert got[x] == 1000 * (x.bit_length() - 1)


@settings(**_SETTINGS)
@given(
    vals=st.lists(st.integers(min_value=-(10**12), max_value=10**12), min_size=1, max_size=40),
    cut=st.integers(min_value=0, max_value=39),
    k=st.integers(min_value=1, max_value=8),
)
@pytest.mark.slow
def test_kmv_merge_equals_union_sketch_property(spark, vals, cut, k):
    """For ANY split of ANY value multiset, merging the parts' KMV
    sketches equals the sketch of the union (k-min-of-union identity),
    and the estimate is exact whenever distinct hashes < k."""
    from datapipeline_template_spark.operators.sketch import (
        KMV_P,
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )

    cut = min(cut, len(vals) - 1)
    a, b = vals[: cut + 1], vals[cut + 1 :] or [vals[0]]

    def sk(part):
        df = spark.createDataFrame([("g", v) for v in part], "grp string, v long")
        return kmv_sketch(df, "grp", "v", k=k).collect()[0]["kmv"]

    whole = sk(a + b)
    sa, sb = sk(a), sk(b)
    merged = (
        spark.createDataFrame([(sa, sb)], "a array<long>, b array<long>")
        .select(kmv_merge("a", "b", k).alias("m"))
        .collect()[0]["m"]
    )
    assert merged == whole
    # Python reference of the hash keeps the estimator honest.
    def h(x):
        x0 = ((x % KMV_P) + KMV_P) % KMV_P
        return ((x0 * x0) % KMV_P * 1_000_003 + x0 * 998_244_353 + 12_345) % KMV_P

    distinct_h = sorted({h(v) for v in a + b})
    assert whole == distinct_h[:k]
    est = (
        spark.createDataFrame([(whole,)], "s array<long>")
        .select(kmv_estimate("s", k).alias("e"))
        .collect()[0]["e"]
    )
    if len(distinct_h) < k:
        assert est == len(distinct_h)


def test_dsir_logratio_direction_and_python_reference(spark):
    """DSIR scores a target-vocab doc above a non-target doc, and the
    per-doc sums match a Python reference of the exact operator spec
    (add-one target LM over raw vocab, unsmoothed raw LM, milli_log2
    interpolated integer log)."""
    from datapipeline_template_spark.operators.text import dsir_logratio

    rows = [
        (0, "alpha beta alpha", "tgt"),
        (1, "alpha beta gamma", "other"),
        (2, "delta delta epsilon zeta", "other"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["sum_mb"])
        for r in dsir_logratio(docs, "tgt").collect()
    }

    def ml(x: int) -> int:
        f = x.bit_length() - 1
        p = 1 << f
        return 1000 * f + ((x - p) * 1000) // p

    toks = {0: "alpha beta alpha", 1: "alpha beta gamma", 2: "delta delta epsilon zeta"}
    allw = [w for t in toks.values() for w in t.split(" ")]
    c = {w: allw.count(w) for w in set(allw)}
    tw = toks[0].split(" ")
    ct = {w: tw.count(w) for w in set(allw)}
    t, tt, v = len(allw), len(tw), len(set(allw))
    g = {
        w: (ml(ct.get(w, 0) + 1) - ml(tt + v)) - (ml(c[w]) - ml(t))
        for w in set(allw)
    }
    for did, text in toks.items():
        ws = text.split(" ")
        assert got[did] == (len(ws), sum(g[w] for w in ws)), did
    # The target doc outranks the disjoint-vocab doc on mean ratio.
    assert got[0][1] / got[0][0] > got[2][1] / got[2][0]


@settings(max_examples=20, deadline=None)
@given(
    vals=st.lists(st.integers(min_value=1, max_value=2**40 - 1),
                  min_size=1, max_size=40),
)
def test_log_hist_upper_edge_bounds_property(spark, vals):
    """The histogram estimate is a guaranteed OVERestimate with the
    documented ratio bound: for every value v, the upper edge of v's
    bin satisfies v < edge ≤ v · 2^((100 + 87.2)/1000) (bin width +
    milli_log2's chord underestimate), verified against a Python
    reference of the exact integer edge math."""
    from datapipeline_template_spark.operators.sketch import (
        HIST_MILLIBIN,
        log_hist_bins,
        log_hist_upper,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    rows = (
        log_hist_bins(df, "g", "v")
        .select("bin", log_hist_upper("bin").alias("edge"))
        .collect()
    )

    def ml(x: int) -> int:
        f = x.bit_length() - 1
        p = 1 << f
        return 1000 * f + ((x - p) * 1000) // p

    edges = {r["bin"]: r["edge"] for r in rows}
    bound = 2 ** ((HIST_MILLIBIN + 87.2) / 1000)
    for v in vals:
        b = ml(v) // HIST_MILLIBIN
        # Python reference of the edge math.
        t = (b + 1) * HIST_MILLIBIN
        p = 1 << (t // 1000)
        ref = p + -(-((t % 1000) * p) // 1000)
        assert edges[b] == ref
        assert v < edges[b] <= v * bound + 1  # +1: integer ceil slack
