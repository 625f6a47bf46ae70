"""One-off A/B: does GRAD_ACCUM=4 beat the shipped accum=2 on the two
HBM-pressure-bound 224px rows? (PERF.md round 5: accum=2 recovered +10.6%
FixMatch / +32.6% SemiFormer; the B=16 proof-by-batch suggested ~x1.05 was
already near the floor, so this measures whether a 4-way split buys more
or just re-reads weights.) Prints img/s for each leg; run on a free chip."""
import sys

sys.path.insert(0, ".")

from bench import _backend_watchdog, row_fixmatch, row_semiformer  # noqa: E402

_backend_watchdog(600)

for accum in (2, 4):
    ips = row_fixmatch("resnet50", 224, 32, 7, k=4, calls=4, accum=accum)
    print(f"fixmatch_resnet50_224 accum={accum}: {ips:.1f} img/s/chip",
          flush=True)
for accum in (2, 4):
    ips = row_semiformer(224, 32, 6, accum=accum)
    print(f"semiformer_conformer_224 accum={accum}: {ips:.1f} img/s/chip",
          flush=True)
