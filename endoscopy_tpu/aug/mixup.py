"""On-device Mixup / CutMix (timm ``Mixup`` semantics).

The reference carries full Mixup plumbing but ships it disabled
(dataset.py:322-330 commented; TRAIN.MIXUP/CUTMIX/... knobs in every config).
This provides the capability TPU-natively: batch-mode mixing against the
flipped batch inside the jitted step, with soft targets (+ label smoothing)
for the soft-CE loss path.

Semantics (timm Mixup, mode='batch'):
- with probability ``prob`` the batch is mixed; otherwise passthrough;
- if both mixup_alpha and cutmix_alpha are active, CutMix is chosen with
  probability ``switch_prob``;
- mixup: lam ~ Beta(a, a); x = lam*x + (1-lam)*flip(x);
- cutmix: a random box with relative area (1-lam) is swapped with the
  flipped batch; lam is corrected to the realized box area;
- targets: lam*onehot(y) + (1-lam)*onehot(flip(y)), with label smoothing
  eps: on_value = 1-eps+eps/C, off_value = eps/C.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _smooth_one_hot(targets: jnp.ndarray, num_classes: int,
                    smoothing: float) -> jnp.ndarray:
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(targets, num_classes) * (on - off) + off


def _rand_bbox(key: jax.Array, h: int, w: int, lam: jnp.ndarray):
    """CutMix box with relative area (1 - lam); returns (y0, x0, y1, x1)."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (ratio * h).astype(jnp.int32)
    cut_w = (ratio * w).astype(jnp.int32)
    ky, kx = jax.random.split(key)
    cy = jax.random.randint(ky, (), 0, h)
    cx = jax.random.randint(kx, (), 0, w)
    y0 = jnp.clip(cy - cut_h // 2, 0, h)
    x0 = jnp.clip(cx - cut_w // 2, 0, w)
    y1 = jnp.clip(cy + cut_h // 2, 0, h)
    x1 = jnp.clip(cx + cut_w // 2, 0, w)
    return y0, x0, y1, x1


def mixup_cutmix(
    x: jnp.ndarray,
    targets: jnp.ndarray,
    key: jax.Array,
    num_classes: int,
    mixup_alpha: float = 0.0,
    cutmix_alpha: float = 0.0,
    prob: float = 1.0,
    switch_prob: float = 0.5,
    label_smoothing: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-mode mix; returns (mixed_x, soft_targets [B, C])."""
    b, h, w, _ = x.shape
    k_apply, k_switch, k_lam_m, k_lam_c, k_box = jax.random.split(key, 5)

    y1 = _smooth_one_hot(targets, num_classes, label_smoothing)
    y2 = y1[::-1]

    use_mix = jax.random.uniform(k_apply) < prob
    use_cutmix = jnp.logical_and(
        cutmix_alpha > 0,
        jnp.logical_or(mixup_alpha <= 0,
                       jax.random.uniform(k_switch) < switch_prob))

    lam_m = (jax.random.beta(k_lam_m, mixup_alpha, mixup_alpha)
             if mixup_alpha > 0 else jnp.float32(1.0))
    lam_c = (jax.random.beta(k_lam_c, cutmix_alpha, cutmix_alpha)
             if cutmix_alpha > 0 else jnp.float32(1.0))

    # mixup branch
    x_mix = lam_m.astype(x.dtype) * x + (1 - lam_m).astype(x.dtype) * x[::-1]

    # cutmix branch
    y0, x0, yb1, xb1 = _rand_bbox(k_box, h, w, lam_c)
    yg = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xg = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    box = (yg >= y0) & (yg < yb1) & (xg >= x0) & (xg < xb1)
    x_cut = jnp.where(box[None, :, :, None], x[::-1], x)
    lam_c_real = 1.0 - ((yb1 - y0) * (xb1 - x0)).astype(jnp.float32) / (h * w)

    mixed_x = jnp.where(use_cutmix, x_cut, x_mix)
    lam = jnp.where(use_cutmix, lam_c_real, lam_m)
    mixed_y = lam * y1 + (1 - lam) * y2

    out_x = jnp.where(use_mix, mixed_x, x)
    out_y = jnp.where(use_mix, mixed_y, y1)
    return out_x, out_y
