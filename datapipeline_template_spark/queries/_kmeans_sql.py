"""DuckDB oracle SQL for the deterministic k-means family (ss13/dd15).

Generates the unrolled-iteration CTE chain that replays
``operators.clustering.kmeans_fit`` exactly in ANSI-ish SQL:
lowest-id init, exact int64 squared distances, ROW_NUMBER tie-break
(dist, cid), trunc-toward-zero centroid division (DuckDB ``//``),
empty-cluster COALESCE. Shared by the ss13 stats oracle and the dd15
SemDeDup oracle so both verify the same iteration replay.
"""

from __future__ import annotations

P = 1_000_000_007

# Exact-int quantization of the corpus + id-ranked centroid init
# (rows [offset, offset+k) by vec_id — offset 0 is the default
# lowest-id init; nonzero offsets give the INDEPENDENT deterministic
# clusterings the ss18 OR-union builds on).
_HEAD = """{p}qv AS (
  SELECT vec_id, list_transform(embedding,
    x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
  FROM embeddings
), {p}c0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
         qv AS cv
  FROM (SELECT vec_id, qv FROM {p}qv ORDER BY vec_id LIMIT {k} OFFSET {off})
)"""

# One assignment pass against centroids c{i}.
_ASSIGN = """, {p}sc{i} AS (
  SELECT v.vec_id, v.qv, c.cid,
         list_sum(list_transform(list_zip(v.qv, c.cv),
           s -> (s[1] - s[2]) * (s[1] - s[2]))) AS dist
  FROM {p}qv v CROSS JOIN {p}c{i} c
), {p}a{i} AS (
  SELECT vec_id, qv, cid, dist FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dist, cid) AS rn
    FROM {p}sc{i}) WHERE rn = 1
)"""

# Centroid update from assignment a{i}: per-dim trunc-div means;
# clusters with no members keep their previous centroid.
_UPDATE = """, {p}up{i} AS (
  SELECT cid, t.i AS dim, SUM(qv[t.i]) AS s, COUNT(*) AS c
  FROM {p}a{i}, UNNEST(generate_series(1, {dim})) AS t(i)
  GROUP BY cid, t.i
), {p}nc{i} AS (
  SELECT cid, list(s // c ORDER BY dim) AS cv FROM {p}up{i} GROUP BY cid
), {p}c{inext} AS (
  SELECT c.cid, COALESCE(n.cv, c.cv) AS cv
  FROM {p}c{i} c LEFT JOIN {p}nc{i} n USING (cid)
)"""


def kmeans_ctes(
    k: int = 8,
    n_iter: int = 4,
    dim: int = 64,
    prefix: str = "",
    init_offset: int = 0,
) -> str:
    """CTE chain ending in centroids ``{prefix}c{n_iter}`` and the
    final assignment ``{prefix}a{n_iter}`` (computed against those
    centroids). ``prefix`` namespaces the chain so several independent
    clusterings can coexist in one oracle (ss18); ``init_offset``
    selects the id-ranked init window (must mirror the Spark call's
    ``kmeans_fit(init_offset=...)``)."""
    parts = [_HEAD.format(k=k, p=prefix, off=init_offset)]
    for i in range(n_iter + 1):
        parts.append(_ASSIGN.format(i=i, p=prefix))
        if i < n_iter:
            parts.append(_UPDATE.format(i=i, inext=i + 1, dim=dim, p=prefix))
    return "".join(parts)


def cos_sql(a: str, b: str) -> str:
    """Cosine over two already-quantized int64 list columns — the same
    exact-int dot/norms + one double divide as operators.clustering."""
    dot = f"list_sum(list_transform(list_zip({a}, {b}), s -> s[1] * s[2]))"
    na = f"list_sum(list_transform({a}, x -> x * x))"
    nb = f"list_sum(list_transform({b}, x -> x * x))"
    return (
        f"CAST({dot} AS DOUBLE) / "
        f"(sqrt(CAST({na} AS DOUBLE)) * sqrt(CAST({nb} AS DOUBLE)))"
    )


def checksum_sql(list_col: str) -> str:
    """Poly-fold checksum of an int64 list (the ss07 convention)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({list_col}, v -> ((v % {P}) + {P}) % {P})), "
        f"(acc, x) -> (acc * 131 + x) % {P})"
    )
