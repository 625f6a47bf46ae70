"""A/B experiments on the flagship FixMatch step (VERDICT r3 item 1):

- baseline: current production configuration
- remat:    per-bottleneck jax.checkpoint on the ResNet trunk
- donate:   donate the TrainState at the multi-step jit boundary

Each is timed with the bench harness semantics (evolving state, host-fetch
barrier). Results recorded in PERF.md.

Usage: python tools/profile_remat_donate.py [--img 112] [--mode base|remat|donate]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

# repo root on sys.path regardless of CWD (run_parity.py pattern)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(img: int, mode: str, calls: int = 5, k: int = 8) -> float:
    import jax
    import jax.numpy as jnp

    from bench import _mk_cfg, _canonical_batches
    from endoscopy_tpu.models import build_model
    from endoscopy_tpu.models.heads import build_head
    from endoscopy_tpu.models.registry import ClassifierHead
    from endoscopy_tpu.models.resnet import resnet50
    from endoscopy_tpu.train.fixmatch import FixMatch

    cfg = _mk_cfg("resnet50", img, 32, 7, "FixMatch")
    if mode == "remat":
        model = ClassifierHead(
            backbone=resnet50(dtype=jnp.bfloat16, remat=True),
            head=build_head(cfg.MODEL.NUM_CLASSES, is_complex=False))
    else:
        model = build_model(cfg)

    trainer = FixMatch(model=model, opt_func="Adam")
    trainer.train_dl = trainer.valid_dl = None
    trainer.get_config(cfg, labeled_targets=np.arange(cfg.MODEL.NUM_CLASSES))
    weights = jnp.ones(cfg.MODEL.NUM_CLASSES, jnp.float32)

    fn = trainer._train_multi
    if mode == "donate":
        # re-jit the same multi_step body with state donation
        fn = jax.jit(fn.__wrapped__, donate_argnums=(0,))

    xk, tk, uk = _canonical_batches(cfg, k)
    sharded = trainer._shard_stacked(xk, tk, uk)
    box = {"state": trainer.state, "loss": None}

    def run():
        box["state"], losses = fn(box["state"], *sharded, weights,
                                  trainer._next_rng())
        box["loss"] = losses

    run(); run(); float(box["loss"][-1])
    t0 = time.perf_counter()
    for _ in range(calls):
        run()
    float(box["loss"][-1])
    dt = time.perf_counter() - t0
    step_ms = dt / (calls * k) * 1e3
    imgs = 32 * (1 + 2 * 7)
    return step_ms, imgs / step_ms * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=112)
    ap.add_argument("--mode", default="all")
    args = ap.parse_args()
    modes = ["base", "remat", "donate"] if args.mode == "all" else [args.mode]
    for m in modes:
        ms, ips = run_variant(args.img, m)
        print(f"{m:8s} {ms:7.2f} ms/step  {ips:8.0f} img/s", flush=True)


if __name__ == "__main__":
    main()
