"""PARITY.md self-check: the documented test counts must track reality.

VERDICT r4 weak #6: the "Test tiers" counts drifted twice in one round.
This test re-collects the suite in a subprocess and asserts the numbers
PARITY.md claims are within +/-2 of what `pytest --collect-only` reports,
so the doc cannot silently rot. Tolerance +/-2 lets a commit add a couple
of tests without a same-commit doc edit; anything larger is real drift.
"""
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _collect_count(extra_args):
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q", "-p", "no:cacheprovider"]
        + extra_args,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    # Summary line is either "N tests collected in ..." or
    # "K/N tests collected (M deselected) in ...".
    m = re.search(r"(?:(\d+)/)?(\d+) tests? collected", out.stdout)
    assert m, f"could not parse collect-only output:\n{out.stdout[-2000:]}"
    return int(m.group(1) or m.group(2)), int(m.group(2))


def test_parity_md_test_counts_match_collection():
    text = (REPO / "PARITY.md").read_text()
    m = re.search(r"for (\d+) tests on the 1-core host \((\d+) collected overall", text)
    assert m, "PARITY.md 'Test tiers' count sentence not found (format changed?)"
    doc_fast, doc_total = int(m.group(1)), int(m.group(2))

    # One collection gives both numbers: "K/N tests collected (M deselected)".
    fast, total = _collect_count(["-m", "not slow"])

    assert abs(doc_fast - fast) <= 2, (
        f"PARITY.md claims {doc_fast} fast-tier tests; collection finds {fast}. "
        "Update the 'Test tiers' paragraph."
    )
    assert abs(doc_total - total) <= 2, (
        f"PARITY.md claims {doc_total} collected tests; collection finds {total}. "
        "Update the 'Test tiers' paragraph."
    )
