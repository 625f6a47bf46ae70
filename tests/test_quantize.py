"""Weight-only int8 PTQ (serve/quantize.py) — pure pytree transforms.

Fast tier: quantize/dequantize are host-side tree maps with no model or
data dependency. The export-level integration (quantized artifact ≈
full-precision artifact, smaller file) lives in tests/test_serve.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from endoscopy_tpu.serve.quantize import (dequantize_tree, quantize_tree,
                                          quantized_fraction)


def _tree(rng):
    """A flax-shaped params tree: conv + dense kernels, biases, BN leaves."""
    return {
        "Conv_0": {"kernel": jnp.asarray(
            rng.normal(0, 0.1, (3, 3, 8, 16)), jnp.float32)},
        "Dense_0": {"kernel": jnp.asarray(
            rng.normal(0, 0.5, (16, 4)), jnp.float32),
            "bias": jnp.asarray(rng.normal(0, 1, (4,)), jnp.float32)},
        "BatchNorm_0": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))},
    }


def test_roundtrip_error_bounded_by_half_step():
    """Per-output-channel absmax: |w - dq(q(w))| <= scale/2 everywhere,
    scale = channel absmax / 127."""
    rng = np.random.default_rng(0)
    tree = _tree(rng)
    dq = dequantize_tree(quantize_tree(tree), jnp.float32)
    for name in ("Conv_0", "Dense_0"):
        w = np.asarray(tree[name]["kernel"])
        got = np.asarray(dq[name]["kernel"])
        assert got.shape == w.shape and got.dtype == w.dtype
        axes = tuple(range(w.ndim - 1))
        half_step = np.abs(w).max(axis=axes, keepdims=True) / 127.0 / 2.0
        assert np.all(np.abs(got - w) <= half_step + 1e-7)


def test_non_kernel_leaves_pass_through_bit_identical():
    rng = np.random.default_rng(1)
    tree = _tree(rng)
    q = quantize_tree(tree)
    dq = dequantize_tree(q, jnp.float32)
    np.testing.assert_array_equal(dq["Dense_0"]["bias"],
                                  tree["Dense_0"]["bias"])
    np.testing.assert_array_equal(dq["BatchNorm_0"]["scale"],
                                  tree["BatchNorm_0"]["scale"])
    np.testing.assert_array_equal(dq["BatchNorm_0"]["bias"],
                                  tree["BatchNorm_0"]["bias"])
    # the quantized tree really stores int8 for kernels
    assert q["Conv_0"]["kernel"]["__wq_int8__"].dtype == jnp.int8
    assert q["Dense_0"]["kernel"]["__wq_int8__"].dtype == jnp.int8


def test_zero_channel_is_safe():
    """An all-zero output channel must not divide by zero and must
    round-trip to exactly zero."""
    w = jnp.zeros((4, 3), jnp.float32).at[:, 0].set(0.0).at[:, 1].set(2.0)
    tree = {"L": {"kernel": w}}
    dq = dequantize_tree(quantize_tree(tree), jnp.float32)["L"]["kernel"]
    assert np.all(np.isfinite(np.asarray(dq)))
    np.testing.assert_array_equal(np.asarray(dq)[:, 0], 0.0)


def test_dequantize_is_jittable_with_int8_constants():
    """dequantize_tree must trace under jit (it runs inside the exported
    graph) and the traced program must consume int8 — not pre-dequantized
    f32 — constants."""
    rng = np.random.default_rng(2)
    q = quantize_tree(_tree(rng))

    @jax.jit
    def f(x):
        p = dequantize_tree(q, jnp.float32)
        return x @ p["Dense_0"]["kernel"] + p["Dense_0"]["bias"]

    out = f(jnp.ones((2, 16), jnp.float32))
    assert out.shape == (2, 4)
    assert "i8" in jax.jit(f).lower(
        jnp.ones((2, 16), jnp.float32)).as_text()


def test_quantized_fraction_counts_kernel_scalars():
    rng = np.random.default_rng(3)
    tree = _tree(rng)
    frac = quantized_fraction(quantize_tree(tree))
    n_kernel = 3 * 3 * 8 * 16 + 16 * 4
    n_other = 4 + 8 + 8
    assert frac == (n_kernel / (n_kernel + n_other))
