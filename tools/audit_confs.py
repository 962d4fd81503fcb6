#!/usr/bin/env python
"""Version-fragile conf audit.

``spark.sql.legacy.*`` confs are removal candidates on every Spark
major bump — round 3 died because ``parquet.nanosAsLong`` silently
became a no-op on Spark 4.1 and the code trusted the conf instead of
the data. This audit greps the package for legacy-conf usages and
fails unless each usage site carries a dtype-probe fallback (the file
must branch on an ACTUAL runtime dtype/schema, not the conf).

    python tools/audit_confs.py
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCAN_DIRS = ("datapipeline_template_spark", "tools")
SCAN_FILES = ("__spark_entry__.py", "bench.py")

LEGACY = re.compile(r"spark\.sql\.legacy\.[\w.]+")
# Evidence of a runtime probe: the file inspects an actual dtype/schema
# instead of trusting the conf to have taken effect.
PROBE = re.compile(r"\.schema\[|\.dataType|dtypes|typeName\(")


def iter_sources():
    for d in SCAN_DIRS:
        for root, _dirs, files in os.walk(os.path.join(REPO, d)):
            for f in files:
                if f.endswith(".py"):
                    yield os.path.join(root, f)
    for f in SCAN_FILES:
        p = os.path.join(REPO, f)
        if os.path.exists(p):
            yield p


# A probe only counts if it appears NEAR the conf usage: a file-wide
# match would let an unrelated `.dataType` elsewhere in a big module
# silence the guard for a newly added legacy conf.
PROBE_WINDOW = 30


def main() -> int:
    bad = []
    for path in iter_sources():
        with open(path, encoding="utf-8") as fh:
            lines = fh.readlines()
        for i, line in enumerate(lines):
            confs = sorted(set(LEGACY.findall(line)))
            if not confs:
                continue
            lo = max(0, i - PROBE_WINDOW)
            hi = min(len(lines), i + PROBE_WINDOW + 1)
            window = "".join(lines[lo:hi])
            if not PROBE.search(window):
                rel = os.path.relpath(path, REPO)
                bad.append((rel, i + 1, confs))
    if bad:
        for rel, lineno, confs in bad:
            print(
                f"FRAGILE: {rel}:{lineno} sets {confs} without a runtime "
                f"dtype probe within {PROBE_WINDOW} lines — branch on the "
                "actual schema, not the conf",
                file=sys.stderr,
            )
        return 1
    print("conf audit: OK (every legacy-conf usage has a nearby dtype probe)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
