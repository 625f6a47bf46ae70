"""Angular-penalty softmax losses: arcface / sphereface / cosface / acloss.

Reference: loss.py:194-266 (`AngularPenaltySMLoss`, `g_theta`).

Faithfulness notes:

- The reference L2-normalizes the *input features* but its weight
  normalization loop (loss.py:238-239) is a no-op — ``w = F.normalize(w)``
  rebinds a local, never writing back — so the fc weights enter the dot
  product unnormalized. We replicate that default and expose
  ``normalize_weights=True`` for the mathematically-correct variant.
- The fc is bias-free (custom_model.py:130 ``nn.Linear(..., bias=False)``).
- Per-sample class weights index ``cls_weight[target]`` (loss.py:253-255);
  an optional mask multiplies L before the negative mean (loss.py:258-259).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

_DEFAULTS = {
    # loss_type: (s, m)   (loss.py:211-222)
    "arcface": (30.0, 0.3),
    "sphereface": (30.0, 1.35),
    "cosface": (30.0, 0.4),
    "acloss": (30.0, 0.3),
}


def g_theta(arccos: jnp.ndarray, k: float = 0.3) -> jnp.ndarray:
    """Sigmoid-shaped angular function for 'acloss' (loss.py:262-266)."""
    sigmoid1 = (1 + math.exp(-math.pi / 2.0 / k)) / (1 - math.exp(-math.pi / 2.0 / k))
    sigmoid2 = (1 - jnp.exp(arccos / k - math.pi / 2.0 / k)) / (
        1 + jnp.exp(arccos / k - math.pi / 2.0 / k)
    )
    return sigmoid1 * sigmoid2


def angular_penalty_loss(
    features: jnp.ndarray,
    targets: jnp.ndarray,
    fc_kernel: jnp.ndarray,
    loss_type: str = "arcface",
    s: Optional[float] = None,
    m: Optional[float] = None,
    eps: float = 1e-7,
    cls_weight: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    normalize_weights: bool = False,
) -> jnp.ndarray:
    """Angular-penalty softmax loss on backbone features.

    features: (B, D); fc_kernel: (D, C) column-per-class (flax convention —
    equals the transpose of torch Linear.weight).
    """
    if loss_type not in _DEFAULTS:
        raise ValueError(f"unknown margin loss '{loss_type}'")
    s_def, m_def = _DEFAULTS[loss_type]
    s = s_def if s is None else s
    m = m_def if m is None else m

    x = features / jnp.linalg.norm(features, axis=1, keepdims=True)
    kernel = fc_kernel
    if normalize_weights:
        kernel = kernel / jnp.linalg.norm(kernel, axis=0, keepdims=True)
    logits = x @ kernel  # (B, C) cosine-like scores

    target_logit = jnp.take_along_axis(logits, targets[:, None], axis=-1)[:, 0]
    clamped = jnp.clip(target_logit, -1.0 + eps, 1.0 - eps)

    if loss_type == "cosface":
        numerator = s * (target_logit - m)
    elif loss_type == "arcface":
        numerator = s * jnp.cos(jnp.arccos(clamped) + m)
    elif loss_type == "sphereface":
        numerator = s * jnp.cos(m * jnp.arccos(clamped))
    else:  # acloss
        numerator = s * g_theta(jnp.arccos(clamped) + m)

    # Denominator sums exp(s * logit_j) over j != target (loss.py:251-252);
    # implemented branchlessly by masking out the target column.
    onehot = jax.nn.one_hot(targets, logits.shape[-1], dtype=bool)
    excl = jnp.where(onehot, -jnp.inf, s * logits)
    denominator = jnp.exp(numerator) + jnp.sum(jnp.exp(excl), axis=-1)

    L = numerator - jnp.log(denominator)
    if cls_weight is not None:
        L = cls_weight[targets] * L
    if mask is not None:
        L = L * mask
    return -jnp.mean(L)
