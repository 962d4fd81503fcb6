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

import ast
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


# A probe only counts if it appears in the SAME enclosing function as
# the conf usage (AST spans): a file-wide — or even merely NEARBY —
# match would let an unrelated `.dataType` in an adjacent function
# silence the guard for a newly added legacy conf. Module-level usages
# (no enclosing function) fall back to a ±30-line window.
PROBE_WINDOW = 30


def _function_spans(source: str) -> list[tuple[int, int]]:
    """(start, end) 1-based line spans of every (async) function def,
    innermost-last so the tightest enclosing span wins."""
    try:
        tree = ast.parse(source)
    except SyntaxError:
        return []
    spans = [
        (node.lineno, node.end_lineno or node.lineno)
        for node in ast.walk(tree)
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
    ]
    return sorted(spans, key=lambda s: s[1] - s[0], reverse=True)


def main() -> int:
    bad = []
    for path in iter_sources():
        with open(path, encoding="utf-8") as fh:
            source = fh.read()
        lines = source.splitlines(keepends=True)
        spans = _function_spans(source)
        for i, line in enumerate(lines):
            confs = sorted(set(LEGACY.findall(line)))
            if not confs:
                continue
            lineno = i + 1
            enclosing = [s for s in spans if s[0] <= lineno <= s[1]]
            if enclosing:
                lo, hi = enclosing[-1]  # innermost function
                window = "".join(lines[lo - 1 : hi])
            else:
                window = "".join(
                    lines[max(0, i - PROBE_WINDOW) : i + PROBE_WINDOW + 1]
                )
            if not PROBE.search(window):
                rel = os.path.relpath(path, REPO)
                bad.append((rel, lineno, confs))
    if bad:
        for rel, lineno, confs in bad:
            print(
                f"FRAGILE: {rel}:{lineno} sets {confs} without a runtime "
                "dtype probe in the same function — branch on the "
                "actual schema, not the conf",
                file=sys.stderr,
            )
        return 1
    print("conf audit: OK (every legacy-conf usage has a same-function dtype probe)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
