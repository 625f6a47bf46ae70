"""Honest FixMatch step decomposition on the real TPU.

Through the axon relay, block_until_ready is a no-op and repeat executions
with identical inputs are cached (PERF.md "Measurement"), so every part here
is timed as an *evolving-state* jitted loop (lax.scan carrying state) whose
final scalar is fetched to the host as the barrier:

- full:   the production fused multi-step (views + model fwd/bwd + opt + EMA)
- model:  same minus view building (pre-built normalized views, still
          augmented shapes), isolating model fwd+bwd+opt+EMA
- views:  view building alone, input perturbed per scan step so nothing is
          constant-folded or cached
- kstep sweep: full step at several STEPS_PER_CALL to expose dispatch overhead

Usage: python tools/profile_honest.py [--img 112] [--b 32] [--mu 7] [--k 8]
"""

from __future__ import annotations

import argparse
import os
import sys

# repo root on sys.path regardless of CWD (run_parity.py pattern)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--img", type=int, default=112)
    parser.add_argument("--b", type=int, default=32)
    parser.add_argument("--mu", type=int, default=7)
    parser.add_argument("--k", type=int, default=8)
    parser.add_argument("--calls", type=int, default=5)
    parser.add_argument("--parts", default="full,model,views,ksweep")
    args = parser.parse_args()
    parts = args.parts.split(",")

    import jax
    import jax.numpy as jnp

    from endoscopy_tpu.aug.views import fixmatch_views, labeled_train_view
    from endoscopy_tpu.config.loader import default_config
    from endoscopy_tpu.models import build_model
    from endoscopy_tpu.train.fixmatch import FixMatch

    b, mu, img, k = args.b, args.mu, args.img, args.k
    size = int(img * 1.2)
    n_imgs = b * (1 + 2 * mu)
    rng = np.random.default_rng(0)
    xk = rng.integers(0, 255, (k, b, size, size, 3)).astype(np.uint8)
    tk = rng.integers(0, 6, (k, b)).astype(np.int64)
    uk = rng.integers(0, 255, (k, b * mu, size, size, 3)).astype(np.uint8)

    def timed_loop(dispatch, fetch, calls):
        for _ in range(2):
            dispatch()
        fetch()
        t0 = time.perf_counter()
        for _ in range(calls):
            dispatch()
        fetch()
        return (time.perf_counter() - t0) / (calls * k)

    def build_trainer(steps_per_call):
        cfg = default_config()
        cfg.MODEL.NAME = "resnet50"
        cfg.MODEL.NUM_CLASSES = 6
        cfg.DATA.IMG_SIZE = img
        cfg.DATA.BATCH_SIZE = b
        cfg.DATA.MU = mu
        cfg.TRAIN.DTYPE = "bfloat16"
        cfg.TRAIN.STEPS_PER_CALL = steps_per_call
        cfg.TRAIN.MESH_DATA = len(jax.devices())
        cfg.TRAIN.MESH_MODEL = 1
        trainer = FixMatch(model=build_model(cfg), opt_func="Adam")
        trainer.train_dl = trainer.valid_dl = None
        trainer.get_config(cfg, labeled_targets=np.arange(6))
        return trainer

    trainer = build_trainer(k)
    weights = jnp.ones(6, jnp.float32)
    sharded = trainer._shard_stacked(xk, tk, uk)

    if "full" in parts:
        box = {"s": trainer.state, "l": None}

        def dispatch():
            box["s"], box["l"] = trainer._train_multi(
                box["s"], *sharded, weights, trainer._next_rng())

        dt = timed_loop(dispatch, lambda: float(box["l"][-1]), args.calls)
        print(f"full_step:  {dt*1e3:7.2f} ms/step  ({n_imgs/dt:8.0f} img/s)")

    if "model" in parts:
        # pre-built views: (k, n_imgs, img, img, 3) normalized bf16
        model = trainer.model
        tx = trainer.tx

        @jax.jit
        def make_views(xk, uk, key):
            def one(inp):
                x_u8, u_u8, kk = inp
                k1, k2 = jax.random.split(kk)
                xl = labeled_train_view(x_u8, k1, img, jnp.bfloat16)
                w, s = fixmatch_views(u_u8, k2, img, jnp.bfloat16)
                return jnp.concatenate([xl, w, s], 0)
            keys = jax.random.split(key, xk.shape[0])
            return jax.lax.map(one, (xk, uk, keys))

        views = jax.block_until_ready(make_views(*sharded[::2], jax.random.key(0)))

        from endoscopy_tpu.losses import ce_loss, consistency_loss
        from endoscopy_tpu.ssl_state.ema import ema_update

        def loss_fn(params, bstats, x, targets, drng):
            out, mut = model.apply(
                {"params": params, "batch_stats": bstats}, x, train=True,
                mutable=["batch_stats"], rngs={"dropout": drng})
            logits = (out[0] if isinstance(out, tuple) else out).astype(jnp.float32)
            lx = ce_loss(logits[:b], targets, reduction="mean", type_loss="poly")
            lw = logits[b:b * (1 + mu)]
            ls = logits[b * (1 + mu):]
            lu, _ = consistency_loss(lw, ls, T=1.0, p_cutoff=0.7)
            return lx + 2.0 * lu, mut["batch_stats"]

        def one_step(state, inp):
            x, targets, kk = inp
            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, x, targets, kk)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
            state = state.replace(
                ema_params=ema_update(state.ema_params, new_params, 0.999),
                ema_batch_stats=ema_update(state.ema_batch_stats, new_bs, 0.999))
            return state, loss

        @jax.jit
        def model_multi(state, views, tk, key):
            keys = jax.random.split(key, views.shape[0])
            return jax.lax.scan(one_step, state, (views, tk, keys))

        box = {"s": trainer.state, "l": None}

        def dispatch():
            box["s"], box["l"] = model_multi(box["s"], views, sharded[1],
                                             trainer._next_rng())

        dt = timed_loop(dispatch, lambda: float(box["l"][-1]), args.calls)
        print(f"model_step: {dt*1e3:7.2f} ms/step  ({n_imgs/dt:8.0f} img/s)")

    if "views" in parts:
        @jax.jit
        def views_multi(seed_img, xk, uk, key):
            def one(carry, inp):
                x_u8, u_u8, kk = inp
                k1, k2 = jax.random.split(kk)
                # perturb input with carry so nothing constant-folds
                x_u8 = (x_u8 + carry).astype(jnp.uint8)
                xl = labeled_train_view(x_u8, k1, img, jnp.bfloat16)
                w, s = fixmatch_views(u_u8, k2, img, jnp.bfloat16)
                # full-array reductions: a sliced probe lets XLA dead-code-
                # eliminate most of the non-Pallas view work (under-reports)
                out = (jnp.sum(xl.astype(jnp.float32))
                       + jnp.sum(w.astype(jnp.float32))
                       + jnp.sum(s.astype(jnp.float32)))
                return (carry + 1) % 7, out
            keys = jax.random.split(key, xk.shape[0])
            carry, outs = jax.lax.scan(one, seed_img, (xk, uk, keys))
            return outs[-1]

        box = {"l": None, "seed": 0}

        def dispatch():
            box["seed"] = (box["seed"] + 1) % 5
            box["l"] = views_multi(box["seed"], *sharded[::2],
                                   trainer._next_rng())

        dt = timed_loop(dispatch, lambda: float(box["l"]), args.calls)
        print(f"views_only: {dt*1e3:7.2f} ms/step  ({n_imgs/dt:8.0f} img/s)")

    if "ksweep" in parts:
        for kk in (4, 16, 32):
            tr = build_trainer(kk)
            xkk = rng.integers(0, 255, (kk, b, size, size, 3)).astype(np.uint8)
            tkk = rng.integers(0, 6, (kk, b)).astype(np.int64)
            ukk = rng.integers(0, 255, (kk, b * mu, size, size, 3)).astype(np.uint8)
            sh = tr._shard_stacked(xkk, tkk, ukk)
            box = {"s": tr.state, "l": None}

            def dispatch():
                box["s"], box["l"] = tr._train_multi(box["s"], *sh, weights,
                                                     tr._next_rng())

            calls = max(2, (args.calls * k) // kk)
            for _ in range(2):
                dispatch()
            float(box["l"][-1])
            t0 = time.perf_counter()
            for _ in range(calls):
                dispatch()
            float(box["l"][-1])
            dt = (time.perf_counter() - t0) / (calls * kk)
            print(f"k={kk:3d}:      {dt*1e3:7.2f} ms/step  ({n_imgs/dt:8.0f} img/s)")


if __name__ == "__main__":
    main()
