"""Triplet embedding loss (reference: loss.py:170-190)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def triplet_loss(
    anchor: jnp.ndarray,
    positive: jnp.ndarray,
    negative: jnp.ndarray,
    alpha: float = 0.7,
    average_loss: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """max(||a-p|| - ||a-n|| + alpha, 0); returns (loss, d_ap_mean, d_an_mean).

    Frobenius (L2) norms over the feature axis, margin alpha=0.7 as used by
    the supervised/EZBM trainers (supervised.py:60, loss.py:185).
    """
    d_p = jnp.linalg.norm(anchor - positive, axis=1)
    d_n = jnp.linalg.norm(anchor - negative, axis=1)
    losses = jnp.maximum(d_p - d_n + alpha, 0.0)
    loss = jnp.mean(losses) if average_loss else jnp.sum(losses)
    return loss, jnp.mean(d_p), jnp.mean(d_n)
