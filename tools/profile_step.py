"""Decompose FixMatch step time on the TPU: aug-only vs model-only vs full.

Usage: python tools/profile_step.py [--parts aug,model,full,ops]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def timeit(fn, *args, warmup=2, iters=10):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--parts", default="aug,model,full")
    parser.add_argument("--img", type=int, default=112)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--mu", type=int, default=7)
    args = parser.parse_args()
    parts = args.parts.split(",")

    import jax
    import jax.numpy as jnp

    from endoscopy_tpu.aug.views import fixmatch_views, labeled_train_view
    from endoscopy_tpu.config.loader import default_config
    from endoscopy_tpu.models import build_model

    size = int(args.img * 1.2)
    b, mu = args.batch, args.mu
    rng = np.random.default_rng(0)
    x_lb = jnp.asarray(rng.integers(0, 255, (b, size, size, 3)), jnp.uint8)
    u = jnp.asarray(rng.integers(0, 255, (b * mu, size, size, 3)), jnp.uint8)
    n_total = b * (1 + 2 * mu)
    key = jax.random.key(0)

    if "aug" in parts:
        @jax.jit
        def aug_only(x_lb, u, key):
            k1, k2 = jax.random.split(key)
            xl = labeled_train_view(x_lb, k1, args.img, jnp.bfloat16)
            w, s = fixmatch_views(u, k2, args.img, jnp.bfloat16)
            return xl, w, s
        dt = timeit(aug_only, x_lb, u, key)
        print(f"aug_only: {dt*1e3:.1f} ms  ({n_total/dt:.0f} img/s)")

    if "model" in parts:
        cfg = default_config()
        cfg.MODEL.NAME = "resnet50"
        model = build_model(cfg)
        xin = jnp.zeros((n_total, args.img, args.img, 3), jnp.bfloat16)
        variables = model.init(jax.random.key(0), xin[:2].astype(jnp.float32),
                               train=False)
        params, bstats = variables["params"], variables["batch_stats"]

        def loss_fn(params, bstats, x, rng):
            out, mut = model.apply({"params": params, "batch_stats": bstats},
                                   x, train=True, mutable=["batch_stats"],
                                   rngs={"dropout": rng})
            if isinstance(out, tuple):
                out = out[0]
            return jnp.mean(out.astype(jnp.float32) ** 2), mut["batch_stats"]

        @jax.jit
        def model_step(params, bstats, x, rng):
            (l, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, bstats, x, rng)
            return l, g

        dt = timeit(model_step, params, bstats, xin, jax.random.key(1))
        print(f"model_fwd_bwd: {dt*1e3:.1f} ms  ({n_total/dt:.0f} img/s)")

    if "ops" in parts:
        from endoscopy_tpu.aug import ops as O
        from endoscopy_tpu.aug.randaugment import randaugment_mc
        img = jnp.asarray(rng.integers(0, 255, (b * mu, args.img, args.img, 3)),
                          jnp.float32)
        keys = jax.random.split(key, b * mu)
        cases = {
            "equalize": jax.jit(jax.vmap(O.equalize)),
            "rotate": jax.jit(jax.vmap(lambda im: O.rotate(im, 17.0))),
            "sharpness": jax.jit(jax.vmap(lambda im: O.sharpness(im, 1.3))),
            "autocontrast": jax.jit(jax.vmap(O.autocontrast)),
            "randaug_full": jax.jit(jax.vmap(randaugment_mc)),
        }
        for name, fn in cases.items():
            if name == "randaug_full":
                dt = timeit(fn, img, keys)
            else:
                dt = timeit(fn, img)
            print(f"{name}: {dt*1e3:.1f} ms  ({b*mu/dt:.0f} img/s)")


if __name__ == "__main__":
    main()
