"""The physical-plan properties the scale story depends on, as a pytest gate:
runs tools/plan_audit.py (which also regenerates PLANS.md) and fails if any
asserted plan property regressed — pruning, partial aggregation, broadcast
joins, no cartesian products, map-only IVF assignment."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_physical_plan_properties_hold():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "plan_audit.py")],
        capture_output=True, text=True, cwd=REPO, timeout=560,
    )
    report = "\n".join(
        ln for ln in out.stdout.splitlines() if ln.startswith(("PASS", "FAIL"))
    )
    assert out.returncode == 0, f"plan audit failed:\n{report}\n{out.stderr[-2000:]}"
    assert "FAIL" not in report and report.count("PASS") >= 14, report
