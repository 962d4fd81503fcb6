#!/usr/bin/env python
"""Empty-result audit: run every registered query at sf0.01 and flag
any that return zero rows.

An oracle-matched query can pass the driver's hash gate trivially on
an EMPTY result set (both engines agree on nothing) — this audit is
the guard. Run after adding or re-thresholding any filtered query:

    python tools/audit_rowcounts.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipeline_template_spark.queries import load_all
from datapipeline_template_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="rowcount-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    empty = []
    for name, q in sorted(load_all().items()):
        n = q.fn(spark, sf_dir).count()
        print(f"{name:40s} {n}")
        if n == 0:
            empty.append(name)
    if empty:
        print(f"\nEMPTY RESULTS (fix or justify): {empty}")
        return 1
    print("\nOK: every query returns rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
