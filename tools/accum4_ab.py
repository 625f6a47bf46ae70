"""One-off A/B: does GRAD_ACCUM=4 beat the shipped accum=2 on the two
HBM-pressure-bound 224px rows? (PERF.md round 5: accum=2 recovered +10.6%
FixMatch / +32.6% SemiFormer; the B=16 proof-by-batch suggested ~x1.05 was
already near the floor, so this measures whether a 4-way split buys more
or just re-reads weights.) Prints img/s for each leg; run on a free chip.

Run with NO external timeout (a SIGTERMed tunnel-attached client wedges
the relay for every later client — tools/relay_watch.sh header); the
deadline below is an in-process watchdog that os._exit()s instead.
"""
import os
import sys
import threading

sys.path.insert(0, ".")

from bench import _backend_watchdog, row_fixmatch, row_semiformer  # noqa: E402

_backend_watchdog(600)


def _deadline(seconds: int) -> None:
    def bark():
        print(f"accum4_ab: no progress for {seconds}s — relay wedged? "
              "os._exit instead of hanging/getting signal-killed.",
              flush=True)
        os._exit(19)
    t = threading.Timer(seconds, bark)
    t.daemon = True
    t.start()
    _deadline.timer = t  # type: ignore[attr-defined]


def _progress() -> None:
    _deadline.timer.cancel()  # type: ignore[attr-defined]
    _deadline(900)


_deadline(900)  # per-leg budget: build ~190s + compile ~300s + measure

for accum in (2, 4):
    ips = row_fixmatch("resnet50", 224, 32, 7, k=4, calls=4, accum=accum)
    print(f"fixmatch_resnet50_224 accum={accum}: {ips:.1f} img/s/chip",
          flush=True)
    _progress()
for accum in (2, 4):
    ips = row_semiformer(224, 32, 6, accum=accum)
    print(f"semiformer_conformer_224 accum={accum}: {ips:.1f} img/s/chip",
          flush=True)
    _progress()
