"""Shared xplane trace parsing: per-HLO device-time ranking.

Used by profile_roofline.py (full-step traces) and profile_224_residual.py
(core-step traces, VERDICT r4 item 3) so both tools rank HLOs identically.
"""
from __future__ import annotations

import glob


def aggregate_device_events(trace_dir: str,
                            line_name: str = "XLA Ops") -> dict[str, int]:
    """Sum device-plane event durations (ns) by event name for the newest
    xplane protobuf under ``trace_dir``.

    Only the ``line_name`` line is aggregated (default 'XLA Ops': the
    synchronous leaf compute ops). The device plane also carries nested
    wrappers ('XLA Modules', the scan while-op) and overlapping async DMA
    spans ('Async XLA Ops' copy-start windows, which measure wait-until-
    copy-done, not occupancy) — summing those double-counts wildly."""
    from jax.profiler import ProfileData

    pb = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.xplane.pb"))[-1]
    prof = ProfileData.from_serialized_xspace(open(pb, "rb").read())
    agg: dict[str, int] = {}
    for plane in prof.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != line_name:
                continue
            for ev in line.events:
                agg[ev.name] = agg.get(ev.name, 0) + (ev.duration_ns or 0)
    return agg


def print_top_hlos(trace_dir: str, k: int = 25, label: str = "") -> None:
    agg = aggregate_device_events(trace_dir)
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:k]
    tot = sum(agg.values())
    print(f"top HLOs by device time{label} "
          f"(total {tot / 1e6:.1f} ms traced):", flush=True)
    for name, ns in top:
        print(f"  {ns / 1e6:8.2f} ms  {100 * ns / max(tot, 1):5.1f}%  "
              f"{name[:100]}", flush=True)
