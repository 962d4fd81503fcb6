#!/usr/bin/env python
"""Regenerate PLANS.md: physical-plan evidence for the engine's scale
claims, extracted from `.explain` output at sf0.1.

Usage: python tools/gen_plans.py > PLANS.md
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipeline_template_spark.queries import load_all
from datapipeline_template_spark.session import get_spark


def main() -> None:
    spark = get_spark(app_name="plans", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    print("# PLANS — physical-plan evidence (generated from `.explain` at sf0.1)")
    print()
    print("Regenerate: `python tools/gen_plans.py > PLANS.md`.")
    print()

    def section(name, title, greps):
        df = reg[name].fn(spark, sf)
        s = df._jdf.queryExecution().toString()
        print(f"## {name} — {title}\n")
        for label, pat in greps:
            hits = []
            for h in re.findall(pat, s):
                if h not in hits:
                    hits.append(h)
            if hits:
                print(f"- **{label}:** " + "; ".join(f"`{h[:160]}`" for h in hits[:4]))
        print()

    section(
        "q01_pricing_summary",
        "filter pushdown + column pruning reach the parquet scan",
        [
            ("PushedFilters", r"PushedFilters: \[[^\]]*\]"),
            ("ReadSchema (pruned)", r"ReadSchema: struct<[^>]{0,120}"),
            ("Partial aggregation", r"HashAggregate\(keys=\[[^\]]*\], functions=\[partial_[a-z_]+"),
        ],
    )
    section(
        "q02_top_revenue_orders",
        "dimension joins broadcast, no unnecessary shuffle",
        [
            ("Join strategies", r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"),
            ("PushedFilters", r"PushedFilters: \[[^\]]{5,}\]"),
        ],
    )
    section(
        "q03_regional_volume",
        "all five dims broadcast around the fact scan",
        [("Join strategies", r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)")],
    )
    section(
        "pipe01_cdc_keep_latest",
        "keep-latest dedup as max_by with map-side partial combine",
        [
            ("Partial max_by", r"partial_max_by\([^)]{0,80}"),
            ("Single exchange", r"Exchange hashpartitioning\([^)]{0,60}"),
        ],
    )
    section(
        "dd03_minhash_lsh_candidates",
        "LSH candidate join is an equi-join on (band, bucket)",
        [
            ("Join strategies", r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"),
            ("Bucket join keys", r"hashpartitioning\(_band[^)]{0,60}"),
        ],
    )
    section(
        "q29_disjunctive_predicates",
        "OR-of-ANDs still pushes single-side conjuncts to both scans",
        [
            ("PushedFilters", r"PushedFilters: \[[^\]]{5,}\]"),
            ("Join strategies", r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"),
        ],
    )
    section(
        "q27_pivot_returns_by_priority",
        "pivot = two-level hash aggregate over pre-combined (5x3) rows",
        [
            ("Aggregates", r"HashAggregate\(keys=\[o_orderpriority[^\]]{0,40}"),
            ("Exchanges", r"Exchange hashpartitioning\([^)]{0,50}"),
        ],
    )
    section(
        "q23_small_qty_revenue",
        "correlated scalar subquery decorrelated to broadcast aggregate",
        [("Join strategies", r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)")],
    )
    section(
        "dd05_minhash_lsh_kernel",
        "numpy signature kernel: ArrowEvalPython feeds the same band join",
        [
            ("Python stage", r"(MapInPandas|ArrowEvalPython)[^\n]{0,40}"),
            ("Bucket join keys", r"hashpartitioning\(_band[^)]{0,60}"),
        ],
    )
    section(
        "q17b_event_pairs_window",
        "time-band pair count as a RANGE-frame window: no join at all",
        [
            ("Window frame", r"windowspecdefinition\([^)]{0,90}"),
            ("Exchanges", r"Exchange hashpartitioning\([^)]{0,50}"),
        ],
    )
    section(
        "w08_sessionize_events",
        "one shuffle serves both windows and the final groupBy",
        [
            ("Exchanges", r"Exchange hashpartitioning\([^)]{0,50}"),
            ("Window", r"Window \[[^\]]{0,80}"),
        ],
    )
    section(
        "tj01_asof_prev_click",
        "as-of join as union + window carry: joinless, fan-out independent",
        [
            ("PushedFilters (right scan)", r"PushedFilters: \[[^\]]{5,}\]"),
            ("Window carry", r"last\(_asof_payload[^)]{0,60}"),
            ("Exchanges", r"Exchange hashpartitioning\([^)]{0,50}"),
        ],
    )
    section(
        "pk01_sequence_packing",
        "training layout: ONE hash exchange on shard, per-shard window, "
        "no global sort",
        [
            ("Exchanges", r"Exchange (?:hash|range)partitioning\([^)]{0,50}"),
            ("Window", r"Window \[[^\]]{0,70}"),
        ],
    )
    section(
        "tj02_cascade_rollup",
        "continuous-aggregate cascade: raw scanned once, coarse levels "
        "re-aggregate fine ones (chain of partial hash aggregates)",
        [
            ("Raw scans (want exactly one)", r"FileScan parquet[^\n]{0,60}"),
            ("Aggregate chain", r"HashAggregate\(keys=\[[^\]]{0,70}"),
            ("Exchanges", r"Exchange hashpartitioning\([^)]{0,50}"),
        ],
    )
    section(
        "dd11_chunk_dedup",
        "chunk dedup: first-occurrence window fed by the contested-value "
        "join, rebuild is a map-only array filter (no doc shuffle)",
        [
            ("Window over contested join", r"Window \[[^\]]{0,80}"),
            ("Join strategies", r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"),
            ("Exchanges", r"Exchange hashpartitioning\([^)]{0,50}"),
        ],
    )
    section(
        "tj03_interval_join",
        "interval-overlap join as bin-bucketed HASH join (never "
        "BroadcastNestedLoopJoin)",
        [
            ("Join strategies", r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)"),
            ("Bin keys", r"hashpartitioning\(_bin[^)]{0,50}"),
        ],
    )
    section(
        "q42_bloom_semi_join",
        "Bloom runtime filter: fact scan filtered by xxhash64 bitmap "
        "probes BEFORE the semi-join exchange",
        [
            ("Probe predicate (pre-join filter)", r"Filter [^\n]{0,60}xxhash64[^\n]{0,40}"),
            ("Join strategies", r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"),
            ("Bitmap build agg", r"(bit_or|partial_bit_or)\([^)]{0,40}"),
        ],
    )


if __name__ == "__main__":
    main()
