"""The macro-F1 parity runbook (tools/run_parity.py) must keep working:
the day a data-bearing TPU VM is available it is the ONE command that
produces the BASELINE.md parity table (VERDICT r3 item 5). This validates
the synthetic plumbing path for a representative subset — the supervised
row (row 1, the plain trainer path) and the EZBM row (row 5, the
trainer_override + capsule-schema path); the full 5-row synthetic run is
exercised out-of-band (all five rows passed on 2026-08-18, see
BASELINE.md)."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.slow


def test_run_parity_synthetic_subset(tmp_path):
    out = tmp_path / "table.md"
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "run_parity.py"),
         "--synthetic", "--rows", "1,5",
         "--work-dir", str(tmp_path / "work"), "--out", str(out)],
        cwd=str(REPO), capture_output=True, text=True, timeout=1200,
        env=dict(os.environ, ETPU_PLATFORM="cpu"))
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    table = out.read_text()
    assert "| 1 | supervised_resnet50 |" in table
    assert "| 5 | capsule_ezbm |" in table
    # each selected row must carry a numeric best-F1 cell (not n/a)
    for line in table.splitlines():
        if line.startswith("| 1 |") or line.startswith("| 5 |"):
            f1_cell = line.split("|")[5].strip()
            assert f1_cell != "n/a"
            assert 0.0 <= float(f1_cell) <= 1.0
