"""On-device RandAugmentMC (reference: randaugment.py:207-222).

Per-sample semantics replicated exactly:
- n=2 ops drawn uniformly *with replacement* from the 14-op FixMatch pool
  (randaugment.py:147-163);
- per-op magnitude v ~ randint(1, m) (upper-exclusive, randaugment.py:218);
- each op applied with probability 0.5 (randaugment.py:219);
- sign ops (rotate/shear/translate) negate with probability 0.5;
- always CutoutAbs(16) at the end (randaugment.py:221).

The 14-way dispatch is a ``lax.switch`` under ``vmap`` — every branch runs on
the whole batch and results are selected. That costs ~25 MFLOP/sample, ~1% of
a ResNet-50 fwd+bwd at 112px, and keeps the whole augmentation inside the
fused jitted train step (no host round-trips, uint8 in HBM only once).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from endoscopy_tpu.aug import ops


def _float_param(v: jnp.ndarray, max_v: float, bias: float = 0.0) -> jnp.ndarray:
    """float(v) * max_v / 10 + bias (randaugment.py:139-140)."""
    return v * max_v / 10.0 + bias


def _int_param(v: jnp.ndarray, max_v: float, bias: float = 0.0) -> jnp.ndarray:
    """int(v * max_v / 10) + bias (randaugment.py:143-144)."""
    return jnp.floor(v * max_v / 10.0) + bias


def _pool(size: int):
    """FixMatch augment pool (randaugment.py:147-163). Each branch:
    fn(img, v, sign, key) -> img."""

    def auto_contrast(img, v, sign, key):
        return ops.autocontrast(img)

    def brightness(img, v, sign, key):
        return ops.brightness(img, _float_param(v, 0.9, 0.05))

    def color_(img, v, sign, key):
        return ops.color(img, _float_param(v, 0.9, 0.05))

    def contrast(img, v, sign, key):
        return ops.contrast(img, _float_param(v, 0.9, 0.05))

    def equalize(img, v, sign, key):
        return ops.equalize(img)

    def identity(img, v, sign, key):
        return img

    def posterize(img, v, sign, key):
        return ops.posterize(img, _int_param(v, 4.0, 4.0))

    def rotate(img, v, sign, key):
        return ops.rotate(img, sign * _int_param(v, 30.0))

    def sharpness(img, v, sign, key):
        return ops.sharpness(img, _float_param(v, 0.9, 0.05))

    def shear_x(img, v, sign, key):
        return ops.shear_x(img, sign * _float_param(v, 0.3))

    def shear_y(img, v, sign, key):
        return ops.shear_y(img, sign * _float_param(v, 0.3))

    def solarize(img, v, sign, key):
        return ops.solarize(img, 256.0 - _int_param(v, 256.0))

    def translate_x(img, v, sign, key):
        return ops.translate_x(img, jnp.floor(sign * _float_param(v, 0.3) * size))

    def translate_y(img, v, sign, key):
        return ops.translate_y(img, jnp.floor(sign * _float_param(v, 0.3) * size))

    return [auto_contrast, brightness, color_, contrast, equalize, identity,
            posterize, rotate, sharpness, shear_x, shear_y, solarize,
            translate_x, translate_y]


def randaugment_mc(img: jnp.ndarray, key: jax.Array, n: int = 2, m: int = 10
                   ) -> jnp.ndarray:
    """Single-image RandAugmentMC; img float32 HWC in [0,255]."""
    branches = _pool(img.shape[1])
    for _ in range(n):
        key, k_op, k_v, k_apply, k_sign, k_extra = jax.random.split(key, 6)
        op = jax.random.randint(k_op, (), 0, len(branches))
        v = jax.random.randint(k_v, (), 1, m).astype(jnp.float32)
        sign = jnp.where(jax.random.uniform(k_sign) < 0.5, -1.0, 1.0)
        apply = jax.random.uniform(k_apply) < 0.5
        out = jax.lax.switch(op, branches, img, v, sign, k_extra)
        img = jnp.where(apply, out, img)
    key, k_cut = jax.random.split(key)
    return ops.cutout_abs(img, jnp.float32(16.0), k_cut)
