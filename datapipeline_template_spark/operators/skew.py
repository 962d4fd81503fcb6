"""Skew-mitigation operators (SURVEY.md §7.3 "hard parts").

The reference delegates every physical concern to the Databricks
runtime (`/root/reference/resources/sdp_pipeline.pipeline.yml:34`
`photon: true`; no skew handling anywhere in `src/`). This engine's
first line of defense is the same delegation — AQE skew-join splitting
is on by default (session.DEFAULT_CONFS) and covers sort-merge joins.

What AQE does NOT cover, these operators do:

* ``salted_join`` — broadcast-infeasible joins where one side's key
  distribution is pathological (a handful of keys hold most rows) and
  the join is NOT sort-merge (e.g. a shuffled hash join Spark picked,
  or a non-equi residual preventing AQE's split). Salting spreads each
  hot key across ``salt`` reducer partitions by appending a salt
  column derived from a high-cardinality column of the big side, and
  replicating the small side ``salt`` times. Correctness is unchanged
  for inner/left joins keyed on the original keys.

* ``two_phase_distinct`` — exact COUNT(DISTINCT v) per key when a few
  keys own most of the distinct values. The single-key shuffle routes
  every (hot key) row to one reducer; the two-phase form first
  deduplicates on (key, v) — hash partitioning on BOTH columns spreads
  the hot key across the cluster — then counts per key, so no reducer
  ever sees more than the deduplicated row set. This is the classic
  rewrite Catalyst itself applies for a single COUNT(DISTINCT); the
  operator exists for pipelines that need the intermediate (e.g. to
  cache the deduplicated pair set across several downstream aggs).

Both are pure DataFrame rewrites — the optimizer still sees
everything, and results are bit-identical to the unsalted forms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "two_phase_distinct"]

_SALT = "_skew_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    how: str = "inner",
    salt: int = 16,
    spread_col: str | None = None,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``keys`` with hot-key salting.

    The big side gets a deterministic salt in [0, salt) hashed from
    ``spread_col`` (any reasonably distinct column — a line number, an
    id; defaults to the whole row struct), so rows of one hot key fan
    out over ``salt`` partitions. The small side is replicated ×salt
    via a 1-level explode, so every (key, salt) bucket finds its match.

    Cost model: small side shuffle volume ×salt — only worth it when
    the hot key's single-reducer time exceeds that. Supports
    inner/left joins (the replicated side must be the lookup side;
    right/full would duplicate unmatched small rows across salts).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    if salt < 2:
        return big.join(small, keys, how)
    spread: Column = F.struct(*big.columns) if spread_col is None else F.col(spread_col)
    big_s = big.withColumn(_SALT, F.pmod(F.hash(spread), F.lit(salt)))
    small_s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return big_s.join(small_s, [*keys, _SALT], how).drop(_SALT)


def two_phase_distinct(
    df: DataFrame, keys: list[str], value_col: str, out_col: str = "n_distinct"
) -> DataFrame:
    """Exact per-key distinct count that survives hot keys.

    Phase 1 shuffles on (keys..., value) — the hot key's rows spread
    over the full cluster and collapse to unique pairs with map-side
    combine. Phase 2 counts pairs per key; its input is at most one
    row per distinct value, already skew-bounded.

    NULL semantics match COUNT(DISTINCT) exactly: phase 2 counts the
    value column itself (count(col) skips NULLs), so a key's lone NULL
    pair contributes 0 — but the key row itself survives, including
    keys whose values are ALL null (count 0), just like SQL GROUP BY.
    A count(lit(1)) here would be off by one per key with any NULL
    value; a pre-filter on non-null would drop all-null keys entirely.
    """
    pairs = df.select(*keys, value_col).dropDuplicates([*keys, value_col])
    return pairs.groupBy(*keys).agg(F.count(F.col(value_col)).alias(out_col))
