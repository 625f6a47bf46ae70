"""FixMatch consistency loss (reference: loss.py:126-168).

Pseudo-labels come from the weak view: ``softmax(logits_w)`` (with
``stop_gradient`` standing in for torch's ``.detach()``), the confidence mask
is ``max_prob >= p_cutoff``, and the strong view is trained with masked CE on
the argmax pseudo-label. Returns ``(loss, mask_mean)`` exactly like the
reference (loss.py:164).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from endoscopy_tpu.losses.classification import ce_loss, soft_ce_loss


def consistency_loss(
    logits_w: jnp.ndarray,
    logits_s: jnp.ndarray,
    name: str = "ce",
    T: float = 1.0,
    p_cutoff: float = 0.0,
    use_hard_labels: bool = True,
    margin_loss_fn: Optional[Callable] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked consistency loss between weak and strong views.

    margin_loss_fn: optional callable (logits_s, max_idx, mask) -> loss for
    the angular-margin consistency path (loss.py:131-139); when given, the
    strong "logits" are backbone features routed through the margin loss.
    """
    assert name in ("ce", "L2")
    logits_w = jax.lax.stop_gradient(logits_w)

    if margin_loss_fn is not None:
        pseudo_label = jax.nn.softmax(logits_w, axis=-1)
        max_probs = jnp.max(pseudo_label, axis=-1)
        max_idx = jnp.argmax(pseudo_label, axis=-1)
        mask = (max_probs >= p_cutoff).astype(logits_w.dtype)
        return margin_loss_fn(logits_s, max_idx, mask), jnp.mean(mask)

    if name == "L2":
        return jnp.mean((logits_s - logits_w) ** 2), jnp.ones(())

    pseudo_label = jax.nn.softmax(logits_w, axis=-1)
    max_probs = jnp.max(pseudo_label, axis=-1)
    max_idx = jnp.argmax(pseudo_label, axis=-1)
    mask = (max_probs >= p_cutoff).astype(logits_w.dtype)
    if use_hard_labels:
        masked = ce_loss(logits_s, max_idx, use_hard_labels=True, reduction="none") * mask
    else:
        sharpened = jax.nn.softmax(logits_w / T, axis=-1)
        masked = soft_ce_loss(logits_s, sharpened) * mask
    return jnp.mean(masked), jnp.mean(mask)
