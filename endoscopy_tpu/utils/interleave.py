"""FixMatch interleave helpers (reference: utils.py:119-126; defined for
batch-norm mixing parity with the original FixMatch code, unused by the
reference's own training loops — provided for API completeness)."""

from __future__ import annotations

import jax.numpy as jnp


def interleave(x: jnp.ndarray, size: int) -> jnp.ndarray:
    s = list(x.shape)
    return x.reshape([-1, size] + s[1:]).swapaxes(0, 1).reshape([-1] + s[1:])


def de_interleave(x: jnp.ndarray, size: int) -> jnp.ndarray:
    s = list(x.shape)
    return x.reshape([size, -1] + s[1:]).swapaxes(0, 1).reshape([-1] + s[1:])
