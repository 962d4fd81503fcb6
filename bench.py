#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + collect-to-count).
A warmup pass on the smallest table absorbs JVM/codegen startup so the
numbers measure the queries, not session bootstrap.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from datapipeline_template_spark.catalog import table  # noqa: E402
from datapipeline_template_spark.queries import load_all  # noqa: E402
from datapipeline_template_spark.session import get_spark  # noqa: E402

# Headline set: exercised operator families, heaviest plans first-class.
HEADLINE = [
    "q01_pricing_summary",
    "q02_top_revenue_orders",
    "q03_regional_volume",
    "q06_customer_order_stats",
    "q07_priority_stats",
    "q17_event_pairs_within_hour",
    "w01_top_orders_per_customer",
    "w02_running_user_value",
    "dd01_exact_dedup_documents",
    "dd03_minhash_lsh_candidates",
    "tx01_token_stats",
    "ss01_cosine_topk",
    "pipe01_cdc_keep_latest",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    registry = load_all()
    names = [n for n in HEADLINE if n in registry]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: touch the JVM + parquet reader paths once.
    table(spark, sf_dir, "region").count()

    timings: dict[str, float] = {}
    for name in names:
        fn = registry[name].fn
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.count()  # full execution without driver-side row transfer
        timings[name] = round(time.perf_counter() - t0, 4)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
