"""CI guard: no version-fragile legacy conf without a dtype probe."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_legacy_confs_have_dtype_probes():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "audit_confs.py")],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert proc.returncode == 0, proc.stderr
