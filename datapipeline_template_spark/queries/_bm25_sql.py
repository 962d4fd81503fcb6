"""Shared BM25 / integer-log SQL fragments — a standalone module (the
_kmeans_sql.py precedent) so BOTH queries/text.py (tx23/tx24/tx27
oracles) and queries/dedup.py (dd19's gate-audit oracle) can import
them without creating a text⇄dedup import cycle, which would also
reorder query registration and silently shift the driver's pinned
50-entry sweep window (tests/test_registry.py pins it by name).

Generated from the operator constants next to their users — the
milli_log2 twin mirrors functions.milli_log2, the BM25 fragments
mirror operators/text.py bm25_index / bm25_scores_from_index."""

from __future__ import annotations


def _milli_log2_sql(x: str) -> str:
    """DuckDB twin of functions.milli_log2, GENERATED next to its user
    so the two integer-log specs cannot drift: 1000·⌊log2 x⌋ from the
    binary-string length plus the interpolated fraction via << and //."""
    f = f"(length(printf('%b', {x})) - 1)"
    p = f"(1::BIGINT << {f})"
    return f"(1000*{f} + (({x} - {p}) * 1000) // {p})"


def _bm25_index_sql(max_df_num: int = 1, max_df_den: int = 2) -> str:
    """The BM25 INDEX CTE chain (d/dl/stats/tok/tf/dfreq/idf) —
    GENERATED from the operator constants (the millibit idf via
    _milli_log2_sql, df·2 ≤ N stopword prune). Shared by tx27's
    ranked oracle and dd19's gate-audit oracle so the index spec is
    single-sourced."""
    ml = _milli_log2_sql
    return f"""d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM d),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS n_toks
  FROM dl
),
tok AS (SELECT doc_id, unnest(t) AS tok FROM d),
tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
),
dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
idf AS (
  SELECT tok, ({ml('s.n_docs')} - {ml('f.df')}) AS idf_mb
  FROM dfreq f, stats s WHERE f.df * {max_df_den} <= s.n_docs * {max_df_num}
)"""


def _bm25_contrib_sql() -> str:
    """The per-(term, doc) integer BM25 contribution over aliases
    q (query terms), i (idf), c (tf), l (dl), s (stats) — the exact
    DIV chain bm25_scores_from_index evaluates."""
    from ..operators.text import BM25_B_M, BM25_K1_M

    k1, b = BM25_K1_M, BM25_B_M
    return (
        f"(i.idf_mb * c.tf * {1000 + k1}) // "
        f"(c.tf * 1000 + ({k1} * ((1000 - {b}) + "
        f"({b} * ((l.dl * 1000000) // ((s.n_toks * 1000) // s.n_docs))) // 1000)) // 1000)"
    )


def _race_sql(key: str, weight: str) -> str:
    """DuckDB twin of operators/sampling.py weighted_race_key,
    GENERATED from the operator constants: quadratic kmv hash of
    ``key`` → millibit exponential variate (milli_log2(P) −
    milli_log2(h+1)) → integer microbit division by ``weight``.
    Shared by pk10's and ss37's oracles so the race spec is
    single-sourced."""
    from ..operators.sampling import _ml2
    from ..operators.sketch import KMV_A, KMV_B, KMV_C, KMV_P

    p = KMV_P
    x0 = f"(((CAST(({key}) AS BIGINT)) % {p}) + {p}) % {p}"
    h = (
        f"(((({x0}) * ({x0})) % {p}) * {KMV_A} % {p}"
        f" + (({x0}) * {KMV_B}) % {p} + {KMV_C}) % {p}"
    )
    e_mb = f"({_ml2(KMV_P)} - {_milli_log2_sql(f'(({h}) + 1)')})"
    return f"(({e_mb} * 1000000) // ({weight}))"
