"""Attribute the 224px FixMatch residual (VERDICT r3 weak #1 / next #2).

BENCH_TABLE.md round-3: fixmatch_resnet50_224 sits ~1.22x over its
bytes-accessed HBM floor while the 112px flagship runs at 0.94x. This tool
decomposes the 224px step ON THE CHIP into model-core vs in-situ view cost.

Both round-4 flag-gated view candidates are resolved (round 5): native-dtype
kernel I/O is now unconditional in aug/views.py (A/B measured 218.28 vs
219.36 ms full step at 224px — never worse, bit-identical, so the flag was
deleted), and CROP_ROWS_DYNAMIC_SLICE was removed after its Mosaic
root-cause (dynamic sublane starts must be provably 8-aligned; see
perf_runs/2026-08-19_pallas_smoke.log).

Parts:
  full   production multi-step, bench-harness semantics (evolving state,
         host-fetch barrier) — the BENCH_TABLE row
  core   the SAME step with views precomputed as inputs (the trainer's
         *_core fn — fwd+bwd+optimizer+EMA only) + its cost_analysis
         floors; full - core = in-situ view cost riding on the step
  views  labeled_train_view + fixmatch_views alone in a scan
  trace  device-trace the core loop and rank HLOs by device time
         (tools/xplane.py) — attribution of the 224px core residual

``--trainer semiformer`` runs the same decomposition on the
semiformer_conformer_224 BENCH_TABLE row (dual-head Conformer-Ti, MU=6)
via SemiFormer._fixmatch_core (VERDICT r4 item 5).

Usage: python tools/profile_224_residual.py [--img 224] [--calls 5]
       [--parts full,core,views] [--trainer fixmatch|semiformer]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

# repo root on sys.path regardless of CWD (run_parity.py pattern)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import V5E_BF16_TFLOPS, V5E_HBM_GBPS, _cost_per_step  # noqa: E402

B, MU, K = 32, 7, 8  # flagship shapes; --model/--b/--mu/--k for CPU smoke


def build(img: int, model: str = "resnet50", trainer_name: str = "fixmatch",
          accum: int = 1):
    import jax.numpy as jnp

    from bench import _canonical_batches, _mk_cfg
    from endoscopy_tpu.models import build_model

    if trainer_name == "semiformer":
        from endoscopy_tpu.train.semiformer import SemiFormer

        cfg = _mk_cfg(model, img, B, MU, "SemiFormer")
        cfg.TRAIN.GRAD_ACCUM = int(accum)
        trainer = SemiFormer(model=build_model(cfg), opt_func="Adam")
    else:
        from endoscopy_tpu.train.fixmatch import FixMatch

        cfg = _mk_cfg(model, img, B, MU, "FixMatch")
        cfg.TRAIN.GRAD_ACCUM = int(accum)
        trainer = FixMatch(model=build_model(cfg), opt_func="Adam")
    trainer.train_dl = trainer.valid_dl = None
    trainer.get_config(cfg, labeled_targets=np.arange(cfg.MODEL.NUM_CLASSES))
    weights = jnp.ones(cfg.MODEL.NUM_CLASSES, jnp.float32)
    xk, tk, uk = _canonical_batches(cfg, K)
    if trainer_name == "semiformer":
        # SemiFormer has no scan-fused multi-step; bench row semantics are
        # K repeated _fixmatch_step calls on one sharded batch triple
        sharded = trainer._shard(xk[0], tk[0], uk[0])
    else:
        sharded = trainer._shard_stacked(xk, tk, uk)
    return trainer, sharded, weights


def measure_multi(trainer, sharded, weights, calls: int) -> float:
    """ms/step of the production (BENCH_TABLE-row) step program."""
    box = {"state": trainer.state, "loss": None}

    if hasattr(trainer, "_train_multi"):
        def run():
            box["state"], losses = trainer._train_multi(
                box["state"], *sharded, weights, trainer._next_rng())
            box["loss"] = losses

        def fetch():
            float(box["loss"][-1])
    else:  # semiformer: K repeated jitted steps (bench.row_semiformer)
        def run():
            for _ in range(K):
                box["state"], box["loss"] = trainer._fixmatch_step(
                    box["state"], *sharded, weights, trainer._next_rng())

        def fetch():
            float(box["loss"])

    run(); run(); fetch()
    t0 = time.perf_counter()
    for _ in range(calls):
        run()
    fetch()
    return (time.perf_counter() - t0) / (calls * K) * 1e3


def _core_fn(trainer):
    """Normalize the trainers' core-step signatures to
    (state, x, uw, us, t, weights, rng) -> (new_state, loss)."""
    if hasattr(trainer, "_train_core"):
        core = trainer._train_core

        def fn(st, x, uw, us, t, weights, key):
            new_st, loss, _ = core(st, x, uw, us, t, weights, key)
            return new_st, loss

        return fn
    return trainer._fixmatch_core


def measure_core(trainer, weights, img: int, calls: int, trace: bool = False):
    """ms/step of the view-free core (precomputed view inputs), + floors."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    # ImageNet-normalized views are roughly N(0,1): synthetic stand-ins at
    # the exact shapes/dtypes the core consumes
    dt = trainer.dtype
    x_lb_k = jnp.asarray(rng.standard_normal((K, B, img, img, 3)), dt)
    u_w_k = jnp.asarray(rng.standard_normal((K, B * MU, img, img, 3)), dt)
    u_s_k = jnp.asarray(rng.standard_normal((K, B * MU, img, img, 3)), dt)
    t_k = jnp.asarray(rng.integers(0, 6, (K, B)), jnp.int32)
    core = _core_fn(trainer)

    @jax.jit
    def multi_core(state, xk, uwk, usk, tk, weights, rng):
        def body(carry, inp):
            st, key = carry
            key, sub = jax.random.split(key)
            x, uw, us, t = inp
            new_st, loss = core(st, x, uw, us, t, weights, sub)
            return (new_st, key), loss

        (new_state, _), losses = jax.lax.scan(
            body, (state, rng), (xk, uwk, usk, tk))
        return new_state, losses

    box = {"state": trainer.state, "loss": None}

    def run():
        box["state"], losses = multi_core(
            box["state"], x_lb_k, u_w_k, u_s_k, t_k, weights,
            trainer._next_rng())
        box["loss"] = losses

    run(); run(); float(box["loss"][-1])
    t0 = time.perf_counter()
    for _ in range(calls):
        run()
    float(box["loss"][-1])
    core_ms = (time.perf_counter() - t0) / (calls * K) * 1e3

    if trace:
        from tools.xplane import print_top_hlos
        d = f"/tmp/core_trace_{img}"
        with jax.profiler.trace(d):
            run()
            float(box["loss"][-1])
        try:
            print_top_hlos(d, k=30, label=f" (core, img={img})")
        except Exception as e:  # keep the numbers even if parse fails
            print("xplane parse unavailable:", type(e).__name__, e,
                  "— trace dir:", d, flush=True)

    single_args = (trainer.state, x_lb_k[0], u_w_k[0], u_s_k[0], t_k[0],
                   weights, trainer._next_rng())
    flops, bytes_ = _cost_per_step(jax.jit(core), single_args)
    return core_ms, flops, bytes_


def measure_views(img: int, calls: int) -> float:
    """ms/step of the view stage alone (labeled + weak/strong)."""
    import jax
    import jax.numpy as jnp

    from endoscopy_tpu.aug.views import fixmatch_views, labeled_train_view

    size = int(img * 1.2)
    rng = np.random.default_rng(1)
    xk = jnp.asarray(rng.integers(0, 255, (K, B, size, size, 3)), jnp.uint8)
    uk = jnp.asarray(
        rng.integers(0, 255, (K, B * MU, size, size, 3)), jnp.uint8)

    @jax.jit
    def loop(xk, uk, key):
        def body(carry, inp):
            key = jax.random.fold_in(carry, 1)
            x_u8, u_u8 = inp
            k_lb, k_v = jax.random.split(key)
            x = labeled_train_view(x_u8, k_lb, img, jnp.bfloat16)
            w, s = fixmatch_views(u_u8, k_v, img, jnp.bfloat16)
            # reduce over the FULL arrays: a sliced probe (e.g. x[0,0,0])
            # lets XLA dead-code-eliminate most of the non-Pallas view work
            # and report kernel-only time as "views alone"
            probe = (jnp.sum(x.astype(jnp.float32))
                     + jnp.sum(w.astype(jnp.float32))
                     + jnp.sum(s.astype(jnp.float32)))
            return key, probe
        _, outs = jax.lax.scan(body, key, (xk, uk))
        return outs[-1]

    seed = {"i": 0}

    def run():
        seed["i"] += 1
        return loop(xk, uk, jax.random.key(seed["i"] % 5))

    float(run()); float(run())
    t0 = time.perf_counter()
    for _ in range(calls):
        r = run()
    float(r)
    return (time.perf_counter() - t0) / (calls * K) * 1e3


def main():
    global B, MU, K
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--calls", type=int, default=5)
    ap.add_argument("--parts", default="full,core,views")
    ap.add_argument("--trainer", default="fixmatch",
                    choices=("fixmatch", "semiformer"))
    ap.add_argument("--model", default=None,
                    help="default: resnet50 (fixmatch) / conformer "
                         "(semiformer)")
    ap.add_argument("--accum", type=int, default=1,
                    help="TRAIN.GRAD_ACCUM for the fixmatch trainer")
    ap.add_argument("--b", type=int, default=B)
    ap.add_argument("--mu", type=int, default=None,
                    help="default: 7 (fixmatch) / 6 (semiformer, the "
                         "BENCH_TABLE row dims)")
    ap.add_argument("--k", type=int, default=K)
    args = ap.parse_args()
    if args.model is None:
        args.model = ("conformer" if args.trainer == "semiformer"
                      else "resnet50")
    if args.mu is None:
        args.mu = 6 if args.trainer == "semiformer" else MU
    B, MU, K = args.b, args.mu, args.k
    parts = args.parts.split(",")
    imgs_per_step = B * (1 + 2 * MU)
    t0 = time.time()

    full_ms = core_ms = None
    if "full" in parts:
        trainer, sharded, weights = build(args.img, args.model, args.trainer,
                                          args.accum)
        print(f"[{time.time()-t0:.0f}s] trainer built", flush=True)
        full_ms = measure_multi(trainer, sharded, weights, args.calls)
        print(f"full step:  {full_ms:7.2f} ms "
              f"({imgs_per_step / full_ms * 1e3:.0f} img/s)", flush=True)

    if "core" in parts or "trace" in parts:
        if "full" not in parts:
            trainer, sharded, weights = build(args.img, args.model,
                                              args.trainer, args.accum)
        core_ms, flops, bytes_ = measure_core(
            trainer, weights, args.img, args.calls,
            trace="trace" in parts)
        line = f"core step:  {core_ms:7.2f} ms (views precomputed)"
        if bytes_ is not None:
            hbm = bytes_ / (V5E_HBM_GBPS * 1e9) * 1e3
            mxu = flops / (V5E_BF16_TFLOPS * 1e12) * 1e3
            line += (f"  bytes={bytes_/1e9:.2f} GB flops={flops/1e12:.2f} TF"
                     f"  HBM floor {hbm:.2f} ms  MXU floor {mxu:.2f} ms"
                     f"  headroom x{core_ms / max(hbm, mxu):.2f}")
        print(line, flush=True)
        if full_ms is not None:
            print(f"in-situ view cost (full - core): "
                  f"{full_ms - core_ms:7.2f} ms", flush=True)

    if "views" in parts:
        v_ms = measure_views(args.img, args.calls)
        print(f"views alone:{v_ms:7.2f} ms (labeled+weak+strong)", flush=True)

if __name__ == "__main__":
    main()
