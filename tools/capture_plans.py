#!/usr/bin/env python
"""Capture .explain('formatted') output for named registry queries to
plans/<outdir>/<name>_<tag>.txt — the optimization-round evidence files
(guide §1: record the plan shape before and after each change).

Usage: python tools/capture_plans.py <outdir> <tag> [name ...]
With no names: the bench HEADLINE set plus the expensive SECONDARY rows.
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from datapipeline_template_spark.queries import load_all  # noqa: E402
from datapipeline_template_spark.session import get_spark  # noqa: E402


def main() -> None:
    if len(sys.argv) < 3:
        print(
            "usage: python tools/capture_plans.py <outdir> <tag> [name ...]",
            file=sys.stderr,
        )
        sys.exit(2)
    outdir, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    registry = load_all()
    if not names:
        import bench

        names = list(bench.HEADLINE) + [
            n
            for n in bench.SECONDARY
            if n in registry
        ]
    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        if name not in registry:
            print(f"skip (not registered): {name}", file=sys.stderr)
            continue
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        try:
            spark.sparkContext.setJobDescription(f"plan: {name}")
            df = registry[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — capture what we can
            plan = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}"
            print(f"FAILED {name}: {exc}", file=sys.stderr)
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
