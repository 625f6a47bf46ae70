"""Decompose view-building cost on the real TPU.

Parts (all evolving-input scan loops, host-fetch barrier — see
profile_honest.py for why):
- labeled: labeled_train_view on (B, S, S, 3)
- weak:    center-crop+normalize half of fixmatch_views
- strongpre: hflip + random_crop_reflect stage (XLA)
- randaug: the Pallas kernel alone on (B*MU, img, img, 3)
- ops: kernel cost per forced op id (all samples run op X, apply=1)

Usage: python tools/profile_views.py [--img 112] [--b 32] [--mu 7]
       [--parts labeled,weak,strongpre,randaug,ops]
"""

from __future__ import annotations

import argparse
import os
import sys

# repo root on sys.path regardless of CWD (run_parity.py pattern)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import numpy as np


def timed_scan(fn, xs_shape, k, calls=5, seed=0):
    """Time fn applied K times via lax.scan with perturbed inputs."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    xk = rng.integers(0, 255, (k,) + xs_shape).astype(np.uint8)
    xk = jnp.asarray(xk)

    @jax.jit
    def loop(seed_off, xk, key):
        def one(carry, inp):
            x_u8, kk = inp
            x_u8 = (x_u8 + carry).astype(jnp.uint8)
            out = fn(x_u8, kk)
            # full-array reduction: a sliced probe lets XLA dead-code-
            # eliminate the non-Pallas view work and under-report
            leaves = jax.tree.leaves(out)
            return (carry + 1) % 7, sum(
                jnp.sum(leaf.astype(jnp.float32)) for leaf in leaves)
        keys = jax.random.split(key, k)
        _, outs = jax.lax.scan(one, seed_off, (xk, keys))
        return outs[-1]

    box = {"seed": 0}

    def dispatch():
        box["seed"] = (box["seed"] + 1) % 5
        return loop(box["seed"], xk, jax.random.key(box["seed"]))

    for _ in range(2):
        r = dispatch()
    float(r)
    t0 = time.perf_counter()
    for _ in range(calls):
        r = dispatch()
    float(r)
    return (time.perf_counter() - t0) / (calls * k)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--img", type=int, default=112)
    parser.add_argument("--b", type=int, default=32)
    parser.add_argument("--mu", type=int, default=7)
    parser.add_argument("--k", type=int, default=8)
    parser.add_argument("--calls", type=int, default=5)
    parser.add_argument("--ops", default="",
                        help="comma-separated op ids to restrict --parts ops")
    parser.add_argument("--parts", default="labeled,weak,strongpre,randaug")
    args = parser.parse_args()
    parts = args.parts.split(",")

    import jax
    import jax.numpy as jnp

    from endoscopy_tpu.aug import ops
    from endoscopy_tpu.aug.views import (
        _randaugment_batch,
        fixmatch_views,
        labeled_train_view,
        normalize,
    )

    img, b, mu, k = args.img, args.b, args.mu, args.k
    size = int(img * 1.2)
    bu = b * mu

    if "labeled" in parts:
        fn = lambda x, kk: labeled_train_view(x, kk, img, jnp.bfloat16)
        dt = timed_scan(fn, (b, size, size, 3), k, args.calls)
        print(f"labeled ({b} imgs):   {dt*1e3:7.2f} ms")

    if "weak" in parts:
        def weak_fn(x, kk):
            xf = x.astype(jnp.bfloat16)
            w = jax.vmap(functools.partial(ops.center_crop, size=img))(xf)
            return normalize(w, jnp.bfloat16)
        dt = timed_scan(weak_fn, (bu, size, size, 3), k, args.calls)
        print(f"weak ({bu} imgs):     {dt*1e3:7.2f} ms")

    if "strongpre" in parts:
        def sp_fn(x, kk):
            from endoscopy_tpu.aug.views import _fixmatch_strong_pre
            xf = x.astype(jnp.bfloat16)
            keys = jax.random.split(kk, xf.shape[0])
            return jax.vmap(functools.partial(_fixmatch_strong_pre,
                                              img_size=img))(xf, keys)
        dt = timed_scan(sp_fn, (bu, size, size, 3), k, args.calls)
        print(f"strongpre ({bu} imgs):{dt*1e3:7.2f} ms")

    if "randaug" in parts:
        fn = lambda x, kk: _randaugment_batch(x.astype(jnp.bfloat16), kk)
        dt = timed_scan(fn, (bu, img, img, 3), k, args.calls)
        print(f"randaug ({bu} imgs):  {dt*1e3:7.2f} ms")

    if "full" in parts:
        fn = lambda x, kk: fixmatch_views(x, kk, img, jnp.bfloat16)[1]
        dt = timed_scan(fn, (bu, size, size, 3), k, args.calls)
        print(f"fixmatch_views:       {dt*1e3:7.2f} ms")

    if "ops" in parts:
        from endoscopy_tpu.ops.randaugment_kernel import randaugment_mc_pallas

        # force every sample to run op X twice (apply=1), cutout at center
        names = ["autocontrast", "brightness", "color", "contrast", "equalize",
                 "identity", "posterize", "rotate", "sharpness", "shear_x",
                 "shear_y", "solarize", "translate_x", "translate_y"]
        from endoscopy_tpu.ops import randaugment_kernel as rk

        keep = {int(o) for o in args.ops.split(",") if o != ""}
        for opid, name in enumerate(names):
            if keep and opid not in keep:
                continue
            pi = np.zeros((bu, 6), np.int32)
            pi[:, 0] = img // 2
            pi[:, 1] = img // 2
            pi[:, 2] = opid
            pi[:, 3] = 1
            pi[:, 4] = opid
            pi[:, 5] = 1
            pf = np.tile(np.asarray([5.0, 1.0, 5.0, 1.0], np.float32), (bu, 1))
            pi = jnp.asarray(pi)
            pf = jnp.asarray(pf)

            PAD = rk._pad_for(img)
            grid_spec = rk.pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(bu,),
                in_specs=[rk.pl.BlockSpec((1, 3, img, img),
                                          lambda i, *_: (i, 0, 0, 0),
                                          memory_space=rk.pltpu.VMEM)],
                out_specs=rk.pl.BlockSpec((1, 3, img, img),
                                          lambda i, *_: (i, 0, 0, 0),
                                          memory_space=rk.pltpu.VMEM),
                scratch_shapes=[rk.pltpu.VMEM((3, img, img), jnp.float32)],
            )

            @jax.jit
            def forced(x, kk, pi=pi, pf=pf, PAD=PAD):
                planar = x.astype(jnp.float32).transpose(0, 3, 1, 2)
                out = rk.pl.pallas_call(
                    functools.partial(rk._kernel, n_slots=2, h=img, w=img,
                                      PAD=PAD),
                    out_shape=jax.ShapeDtypeStruct(planar.shape, jnp.float32),
                    grid_spec=grid_spec,
                )(pi, pf, planar)
                return out.transpose(0, 2, 3, 1)

            dt = timed_scan(forced, (bu, img, img, 3), k, args.calls)
            print(f"op {opid:2d} {name:13s} x2: {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
