"""bench.py row functions are the driver's round-end artifact (BENCH_r*.json
/ BENCH_TABLE.md); a bit-rotted row silently drops a measured path. Smoke
each row builder at tiny dims on the CPU mesh: finite positive img/s and a
working cost-analysis tuple shape.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_row_fixmatch_tiny():
    from bench import row_fixmatch

    out = row_fixmatch("resnet_tiny", 32, 8, 1, k=2, calls=1, with_cost=True)
    ips, step_ms, flops, bts = out
    assert np.isfinite(ips) and ips > 0 and step_ms > 0
    # cost analysis may be backend-dependent; when present it must be sane
    if flops is not None:
        assert flops > 0 and bts > 0


def test_row_comatch_tiny():
    from bench import row_comatch

    ips = row_comatch("resnet_tiny", 32, 8, 1, k=2, calls=1)
    assert np.isfinite(ips) and ips > 0


def test_row_supervised_tiny():
    from bench import row_supervised

    ips = row_supervised("resnet_tiny", 32, 8, k=2, calls=1)
    assert np.isfinite(ips) and ips > 0


def test_row_triplet_tiny():
    from bench import row_triplet

    ips = row_triplet("resnet_tiny", 32, 8, k=2, calls=1)
    assert np.isfinite(ips) and ips > 0


def test_table_rows_cover_reference_backbone_families():
    """Every default backbone family in the reference configs has a bench
    row (resnet50, conformer, swin, densenet161, efficientnet_b1 — grep
    NAME /root/reference/code/configs/*.yaml), plus the triplet path."""
    from bench import TABLE_ROWS

    names = " ".join(name for name, _, _ in TABLE_ROWS)
    for family in ("resnet50", "conformer", "swin", "densenet161",
                   "efficientnet_b1", "triplet"):
        assert family in names, f"no bench row for {family}"
