"""Microbench: ResNet stem conv as-is vs space-to-depth reformulation.

The 7x7/s2 stem convolves 3 input channels — on the MXU the contraction
dimension pads 3→8(+) so the layer runs far below peak. The MLPerf-style
space-to-depth transform reshapes the input to (H/2, W/2, 12) and the stem
to an equivalent 4x4/s1 conv over 12 channels (exact at init; the padded
taps add a few trainable zeros).

Times fwd+bwd of each stem formulation over an evolving scan loop.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=480)
    p.add_argument("--img", type=int, default=112)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--calls", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    n, img, k = args.n, args.img, args.k
    rng = np.random.default_rng(0)

    def bench(name, fn, xs, wshape):
        w0 = jnp.asarray(rng.standard_normal(wshape, np.float32) * 0.05)

        @jax.jit
        def loop(w, xs):
            def one(w, x):
                def loss(w):
                    y = fn(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
                    return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6
                g = jax.grad(loss)(w)
                return w - 1e-6 * g, jnp.float32(0)
            w, _ = jax.lax.scan(one, w, xs)
            return w
        box = {"w": w0}

        def dispatch():
            box["w"] = loop(box["w"], xs)

        for _ in range(2):
            dispatch()
        float(jnp.sum(box["w"]))
        t0 = time.perf_counter()
        for _ in range(args.calls):
            dispatch()
        float(jnp.sum(box["w"]))
        dt = (time.perf_counter() - t0) / (args.calls * k)
        print(f"{name}: {dt*1e3:7.2f} ms/step")

    xs7 = jnp.asarray(rng.integers(0, 255, (k, n, img, img, 3)).astype(np.float32))

    def stem7(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    bench("7x7/s2 3ch ", stem7, xs7, (7, 7, 3, 64))

    h2 = img // 2
    xs4 = jnp.asarray(
        rng.integers(0, 255, (k, n, h2, h2, 12)).astype(np.float32))

    def stem4(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    bench("4x4/s1 12ch", stem4, xs4, (4, 4, 12, 64))

    # s2d including the on-device reshape from NHWC uint8-ish input
    def stem4_full(x, w):
        b, h, wd, c = x.shape
        x = x.reshape(b, h // 2, 2, wd // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, wd // 2, 4 * c)
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    bench("s2d+4x4    ", stem4_full, xs7, (4, 4, 12, 64))


if __name__ == "__main__":
    main()
