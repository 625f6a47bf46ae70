"""Measured HBM/MXU roofline for the flagship FixMatch step (VERDICT r3 #1).

Two instruments, both on the REAL compiled program (not hand estimates):

1. ``Compiled.cost_analysis()`` — XLA's own bytes-accessed / flops for the
   exact HLO the chip runs. bytes / 819 GB/s (v5e) = the HBM floor; flops /
   197 TFLOP/s (bf16) = the MXU floor. The step's speed-of-light is
   max(floors); measured/SoL is the headroom multiple. Cost analysis runs on
   the SINGLE-step program (the lax.scan body of the production multi-step
   program is this exact step; tracing the k=8 scan for AOT costs ~15 min of
   host CPU on this 1-core box, the single step ~1 min).
2. ``jax.profiler.trace`` — device xplane with per-HLO wall times, parsed
   via jax.profiler.ProfileData (top-k table).

Step time itself is measured on the production multi-step program with the
bench harness semantics (evolving state, host-fetch barrier).

Usage: python tools/profile_roofline.py [--img 112|224] [--trace]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

# repo root on sys.path regardless of CWD (run_parity.py pattern)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# single source of truth for hardware constants + cost-analysis extraction
from bench import V5E_BF16_TFLOPS, V5E_HBM_GBPS, _cost_per_step  # noqa: E402


def build(img: int):
    import jax
    import jax.numpy as jnp

    from bench import _mk_cfg, _canonical_batches
    from endoscopy_tpu.models import build_model
    from endoscopy_tpu.train.fixmatch import FixMatch

    cfg = _mk_cfg("resnet50", img, 32, 7, "FixMatch")
    trainer = FixMatch(model=build_model(cfg), opt_func="Adam")
    trainer.train_dl = trainer.valid_dl = None
    trainer.get_config(cfg, labeled_targets=np.arange(cfg.MODEL.NUM_CLASSES))
    weights = jnp.ones(cfg.MODEL.NUM_CLASSES, jnp.float32)
    k = 8
    xk, tk, uk = _canonical_batches(cfg, k)
    sharded = trainer._shard_stacked(xk, tk, uk)
    return trainer, sharded, weights, k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=112)
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--calls", type=int, default=5)
    args = ap.parse_args()

    import jax

    t0 = time.time()
    trainer, sharded, weights, k = build(args.img)
    print(f"[{time.time()-t0:.0f}s] trainer built", flush=True)

    # --- cost analysis of the single-step program ---------------------------
    single_args = (trainer.state, sharded[0][0], sharded[1][0], sharded[2][0],
                   weights, trainer._next_rng())
    flops_step, bytes_step = _cost_per_step(trainer._train_step, single_args)
    print(f"[{time.time()-t0:.0f}s] cost analysis done", flush=True)
    if flops_step is None:
        sys.exit("cost analysis unavailable on this backend")
    hbm_floor_ms = bytes_step / (V5E_HBM_GBPS * 1e9) * 1e3
    mxu_floor_ms = flops_step / (V5E_BF16_TFLOPS * 1e12) * 1e3

    # --- measured step time (production multi-step, host-fetch barrier) ----
    box = {"state": trainer.state, "loss": None}

    def run():
        box["state"], losses = trainer._train_multi(
            box["state"], *sharded, weights, trainer._next_rng())
        box["loss"] = losses

    run(); run(); float(box["loss"][-1])
    print(f"[{time.time()-t0:.0f}s] warm", flush=True)
    t1 = time.perf_counter()
    for _ in range(args.calls):
        run()
    float(box["loss"][-1])
    dt = time.perf_counter() - t1
    step_ms = dt / (args.calls * k) * 1e3

    imgs = 32 * (1 + 2 * 7)
    print(f"img={args.img}  measured step: {step_ms:.2f} ms "
          f"({imgs / step_ms * 1e3:.0f} img/s)", flush=True)
    print(f"cost_analysis per step: bytes={bytes_step / 1e9:.2f} GB  "
          f"flops={flops_step / 1e12:.2f} TF", flush=True)
    sol = max(hbm_floor_ms, mxu_floor_ms)
    print(f"HBM floor {hbm_floor_ms:.2f} ms  MXU floor {mxu_floor_ms:.2f} ms  "
          f"SoL=max={sol:.2f} ms  headroom x{step_ms / sol:.2f}", flush=True)

    if args.trace:
        from tools.xplane import print_top_hlos
        d = f"/tmp/roofline_trace_{args.img}"
        with jax.profiler.trace(d):
            run()
            float(box["loss"][-1])
        print(f"[{time.time()-t0:.0f}s] traced", flush=True)
        try:
            print_top_hlos(d)
        except Exception as e:
            print("xplane parse unavailable:", type(e).__name__, e, flush=True)
            print("trace dir:", d, flush=True)


if __name__ == "__main__":
    main()
