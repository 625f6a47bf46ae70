"""Pallas RandAugment kernel: interpret-mode parity vs the XLA path with
identical sampled parameters (tiny sizes — interpret mode is slow)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from endoscopy_tpu.aug.randaugment import apply_slot
from endoscopy_tpu.ops.randaugment_kernel import (
    randaugment_mc_pallas,
    sample_randaugment_params,
)

B, S = 4, 24


def xla_reference(imgs, pi, pf):
    def one(img, pi_i, pf_i):
        x = img
        for s in range(2):
            x = apply_slot(x, pi_i[2 + s * 2], pf_i[s * 2], pf_i[s * 2 + 1],
                           pi_i[3 + s * 2] == 1)
        cx, cy = pi_i[0], pi_i[1]
        x0 = jnp.maximum(0, cx - 8)
        y0 = jnp.maximum(0, cy - 8)
        x1 = jnp.minimum(S, x0 + 16)
        y1 = jnp.minimum(S, y0 + 16)
        yg = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        xg = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        mask = (yg >= y0) & (yg <= y1) & (xg >= x0) & (xg <= x1)
        return jnp.where(mask[..., None], 127.0, x)

    return jax.vmap(one)(imgs, pi, pf)


@pytest.mark.parametrize("seed", [3, 11])
def test_kernel_matches_xla_path(rng, seed):
    imgs = jnp.asarray(rng.integers(0, 256, (B, S, S, 3)), jnp.float32)
    key = jax.random.key(seed)
    out_k = np.asarray(randaugment_mc_pallas(imgs, key, interpret=True))
    pi, pf = sample_randaugment_params(key, B, S, S)
    out_x = np.asarray(xla_reference(imgs, pi, pf))
    # sharpness divides in a different association order: 0.5 LSB tolerance
    np.testing.assert_allclose(out_k, out_x, atol=0.51)


def test_param_sampling_distribution():
    pi, pf = sample_randaugment_params(jax.random.key(0), 512, S, S)
    pi = np.asarray(pi)
    pf = np.asarray(pf)
    ops = pi[:, 2::2].ravel()
    applies = pi[:, 3::2].ravel()
    assert ops.min() >= 0 and ops.max() <= 13
    assert 0.4 < applies.mean() < 0.6  # p=0.5 apply (randaugment.py:219)
    assert pf[:, 0::2].min() >= 1 and pf[:, 0::2].max() <= 9  # v ~ randint(1,10)
    assert set(np.unique(pf[:, 1::2])) <= {-1.0, 1.0}
