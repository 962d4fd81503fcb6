"""Graph-centrality operators over edge lists.

The near-dup family walks graphs for CONNECTIVITY (operators/dedup.py
connected_components / connected_components_star); this module walks
them for IMPORTANCE. PageRank over the mutual-kNN semantic graph
(ss14) is the data-curation reading: a document whose neighbors are
themselves well-connected sits in the dense core of a semantic region
(keep, or sample as the region's representative), while a low-rank
node is peripheral — the graph-walk counterpart of dd15/dd16's
distance-to-centroid pruning signals.

Determinism: the classic damped iteration runs in exact integer
MICRO-rank units so every engine and every run produces bit-identical
scores — r_0 = 1e6 per node, and each round is

    r'(v) = ((1000 − d_m) · 1e6) div 1000
          + (d_m · Σ_{u→v} (r(u) div deg(u))) div 1000

with d_m the damping in milli (850 = 0.85) and every division an
explicit truncating integer div (operands are non-negative, so Spark
DIV and DuckDB // agree). Truncation loses < 1 micro-rank per term —
total mass drifts by < |V| + |E| micro per round, documented rather
than corrected (a float implementation drifts too, just
irreproducibly). A FIXED iteration count unrolls in the DuckDB oracle
round-for-round (the kmeans/BPE materialized-rounds precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank_integer"]


def _idiv(a, b):
    """Truncating integer division of non-negative int64 columns —
    identical in Spark and DuckDB (`//`)."""
    return ((a - (a % b)) / b).cast("long")


def pagerank_integer(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping_milli: int = 850,
    r0: int = 1_000_000,
    deg: DataFrame | None = None,
) -> DataFrame:
    """Integer PageRank over a DIRECTED edge list; returns
    ``(node, deg, rank_micro)`` for every node with at least one
    out-edge. Feed both orientations for an undirected graph (the
    mutual-kNN case) — then every node has deg ≥ 1 and there is no
    dangling mass to redistribute (dangling nodes are out of scope;
    callers with true sinks should self-loop them explicitly).

    Scale shape: per round, ONE equi-join of the edge list onto the
    current rank vector (|E| rows, key-partitioned) and one
    map-side-combined groupBy on dst — the textbook distributed
    PageRank plan; no collect, no driver loop over nodes. Plans are
    localCheckpoint-bounded per round (the connected-components
    lesson: persist does NOT stop iterative plan growth). ``iters``
    is a fixed unroll — rank ordering on kNN graphs stabilizes in a
    handful of rounds, and a fixed count is what makes the result
    oracle-replayable; convergence detection would trade determinism
    for a stopping rule we don't need at fixed depth.

    ``deg``: optional precomputed out-degrees as ``(_src, deg)`` —
    the streaming maintainer (streaming/pagerank.py) merges additive
    per-batch degree partials and passes them here instead of paying
    the edge-list groupBy again; must equal the recomputed degrees
    (the maintainer's merge is sum-per-key, so it does by
    construction — equivalence test-pinned)."""
    if iters < 1:
        raise ValueError("need iters >= 1")
    if not 0 <= damping_milli <= 1000:
        raise ValueError("damping_milli must be in [0, 1000]")
    # A NULL endpoint would become a phantom "NULL node" absorbing and
    # emitting rank mass — raise instead of silently grouping it.
    def _nn(c):
        return F.when(F.col(c).isNotNull(), F.col(c)).otherwise(
            F.raise_error(
                F.lit("pagerank_integer needs non-null edge endpoints")
            ).cast("long")
        )

    # Checkpoint the edge list ONCE: the caller's edge derivation is
    # typically the expensive object (a kNN self-join), and deg / the
    # per-round sends would otherwise re-evaluate it — deg and nodes
    # each triggered their own kNN pass before this landed (A/B'd).
    e = edges.select(
        _nn(src).alias("_src"), _nn(dst).alias("_dst")
    ).localCheckpoint(eager=True)
    if deg is None:
        deg = e.groupBy("_src").agg(
            F.count(F.lit(1)).cast("long").alias("deg")
        )
    else:
        deg = deg.select(F.col("_src").cast("long"), F.col("deg").cast("long"))
    base = ((1000 - damping_milli) * r0) // 1000
    # The rank frame CARRIES deg (the CC `_old`-column trick, r13
    # verdict item 4): each round is then ONE edge⋈ranks equi-join +
    # ONE node-keyed aggregate. The old loop additionally paid an
    # e⋈deg join and a nodes-left-join every round — two node-keyed
    # Exchanges per round for values the rank frame already knows.
    # Every node contributes one zero-mass row carrying its deg, so
    # the aggregate re-emits ALL nodes (the left join's job) and
    # max(+deg) survives the groupBy (sends carry a NULL deg); the
    # summed mass is identical (Σ in-contributions + 0).
    ranks = deg.select(
        F.col("_src").alias("node"), "deg", F.lit(r0).cast("long").alias("r")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        sends = e.join(
            ranks, e["_src"] == ranks["node"], "inner"
        ).select(
            F.col("_dst").alias("node"),
            _idiv(F.col("r"), F.col("deg")).alias("c"),
            F.lit(None).cast("long").alias("dg"),
        )
        zero = ranks.select(
            "node",
            F.lit(0).cast("long").alias("c"),
            F.col("deg").alias("dg"),
        )
        ranks = (
            sends.unionByName(zero)
            .groupBy("node")
            .agg(
                F.max("dg").alias("deg"),
                (
                    F.lit(base).cast("long")
                    + _idiv(
                        F.lit(damping_milli) * F.sum("c").cast("long"),
                        F.lit(1000).cast("long"),
                    )
                ).alias("r"),
            )
            # Mass sent to a DANGLING dst (no out-edge, so no zero row
            # → NULL deg) must not surface a new node — the old form's
            # nodes-left-join dropped those rows; this filter keeps the
            # "every node with at least one out-edge" contract exact.
            .where(F.col("deg").isNotNull())
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", "deg", F.col("r").alias("rank_micro"))
