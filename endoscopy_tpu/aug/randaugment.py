"""On-device RandAugmentMC (reference: randaugment.py:207-222).

Per-sample semantics replicated exactly:
- n=2 ops drawn uniformly *with replacement* from the 14-op FixMatch pool
  (randaugment.py:147-163);
- per-op magnitude v ~ randint(1, m) (upper-exclusive, randaugment.py:218);
- each op applied with probability 0.5 (randaugment.py:219);
- sign ops (rotate/shear/translate) negate with probability 0.5;
- always CutoutAbs(16) at the end (randaugment.py:221).

TPU structure: under vmap every switch branch executes on the whole batch, so
the implementation keeps each branch's real work minimal. The five geometric
ops (rotate/shearX/shearY/translateX/translateY) are COMPOSED into one shared
rows→cols→rows shift pipeline — per-op lax.switch only picks the (H,)/(W,)
integer shift vectors (scalar-sized work), and the three gather-free one-hot
shift matmuls run once per slot instead of once per geometric branch
(rotation alone would be three). The nine color branches are a second switch
whose ops are elementwise/reduce-only (ops.py keeps them scatter- and
gather-free).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from endoscopy_tpu.aug import ops


def _float_param(v: jnp.ndarray, max_v: float, bias: float = 0.0) -> jnp.ndarray:
    """float(v) * max_v / 10 + bias (randaugment.py:139-140)."""
    return v * max_v / 10.0 + bias


def _int_param(v: jnp.ndarray, max_v: float, bias: float = 0.0) -> jnp.ndarray:
    """int(v * max_v / 10) + bias (randaugment.py:143-144)."""
    return jnp.trunc(v * max_v / 10.0) + bias


# op indices in the FixMatch pool (randaugment.py:147-163)
_OP_AUTOCONTRAST = 0
_OP_BRIGHTNESS = 1
_OP_COLOR = 2
_OP_CONTRAST = 3
_OP_EQUALIZE = 4
_OP_IDENTITY = 5
_OP_POSTERIZE = 6
_OP_ROTATE = 7
_OP_SHARPNESS = 8
_OP_SHEAR_X = 9
_OP_SHEAR_Y = 10
_OP_SOLARIZE = 11
_OP_TRANSLATE_X = 12
_OP_TRANSLATE_Y = 13


def _geometry_shifts(op, v, sign, h: int, w: int):
    """(s_rows1, s_cols, s_rows2) integer shift vectors implementing the
    chosen geometric op; zeros for color ops (identity warp)."""
    yc = jax.lax.broadcasted_iota(jnp.float32, (h,), 0) + 0.5
    xc = jax.lax.broadcasted_iota(jnp.float32, (w,), 0) + 0.5
    cy, cx = h / 2.0, w / 2.0

    # rotate via Paeth three shears (see ops.rotate)
    theta = jnp.deg2rad(sign * _int_param(v, 30.0))
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    rot_rows = jnp.floor(a * (yc - cy) + 0.5).astype(jnp.int32)
    rot_cols = jnp.floor(b * (xc - cx) + 0.5).astype(jnp.int32)

    shear = sign * _float_param(v, 0.3)
    # PIL 16.16 fixed-point shear convention (see ops.pil_shear_shifts)
    shear_rows = ops.pil_shear_shifts(shear, h)
    shear_cols = ops.pil_shear_shifts(shear, w)

    # translate: int(v * size) truncates toward zero (randaugment.py:123-136)
    trans_x = jnp.trunc(sign * _float_param(v, 0.3) * w).astype(jnp.int32)
    trans_y = jnp.trunc(sign * _float_param(v, 0.3) * h).astype(jnp.int32)

    zeros_h = jnp.zeros((h,), jnp.int32)
    zeros_w = jnp.zeros((w,), jnp.int32)

    s1 = jnp.select(
        [op == _OP_ROTATE, op == _OP_SHEAR_X, op == _OP_TRANSLATE_X],
        [rot_rows, shear_rows, jnp.full((h,), trans_x)], zeros_h)
    s2 = jnp.select(
        [op == _OP_ROTATE, op == _OP_SHEAR_Y, op == _OP_TRANSLATE_Y],
        [rot_cols, shear_cols, jnp.full((w,), trans_y)], zeros_w)
    s3 = jnp.where(op == _OP_ROTATE, rot_rows, zeros_h)
    return s1, s2, s3


def _color_branches():
    """The nine non-geometric ops; each fn(img, v) (magnitudes per
    randaugment.py:147-163)."""
    return [
        lambda img, v: ops.autocontrast(img),
        lambda img, v: ops.brightness(img, _float_param(v, 0.9, 0.05)),
        lambda img, v: ops.color(img, _float_param(v, 0.9, 0.05)),
        lambda img, v: ops.contrast(img, _float_param(v, 0.9, 0.05)),
        lambda img, v: ops.equalize(img),
        lambda img, v: img,  # identity
        lambda img, v: ops.posterize(img, _int_param(v, 4.0, 4.0)),
        lambda img, v: ops.sharpness(img, _float_param(v, 0.9, 0.05)),
        lambda img, v: ops.solarize(img, 256.0 - _int_param(v, 256.0)),
    ]


# op index -> color branch index (geometric ops route to identity=5).
# numpy on purpose: module-scope jnp arrays would initialize the jax
# backend at import time, before consumers can pick a platform.
_COLOR_LOOKUP = np.asarray([0, 1, 2, 3, 4, 5, 6, 5, 7, 5, 5, 8, 5, 5])
_IS_GEOMETRY = np.asarray([False, False, False, False, False, False, False,
                           True, False, True, True, False, True, True])


def sample_slot_params(key: jax.Array, m: int = 10):
    """Draw one slot's (op, v, sign, apply) with the reference distribution
    (randaugment.py:215-220)."""
    k_op, k_v, k_apply, k_sign = jax.random.split(key, 4)
    op = jax.random.randint(k_op, (), 0, 14)
    v = jax.random.randint(k_v, (), 1, m).astype(jnp.float32)
    sign = jnp.where(jax.random.uniform(k_sign) < 0.5, -1.0, 1.0)
    apply = jax.random.uniform(k_apply) < 0.5
    return op, v, sign, apply


def apply_slot(img: jnp.ndarray, op, v, sign, apply, m: int = 10) -> jnp.ndarray:
    """Apply one sampled op slot to a single image (float HWC, [0,255]).

    ``m`` is the magnitude cap the slot was sampled with (v <= m - 1); it
    sizes the static shift bound for the geometry roll passes."""
    h, w = img.shape[0], img.shape[1]
    # max |shift| over the geometry pool: translate = trunc(v*0.3/10 * dim)
    bound = int((m - 1) * 0.3 / 10.0 * max(h, w)) + 2
    s1, s2, s3 = _geometry_shifts(op, v, sign, h, w)
    geo = ops._shift_rows(img, s1, bound)
    geo = ops._shift_cols(geo, s2, bound)
    geo = ops._shift_rows(geo, s3, bound)

    color_idx = jnp.asarray(_COLOR_LOOKUP)[op]
    color_out = jax.lax.switch(color_idx, _color_branches(), img, v)

    out = jnp.where(jnp.asarray(_IS_GEOMETRY)[op], geo,
                    color_out.astype(img.dtype))
    return jnp.where(apply, out, img)


def randaugment_slot(img: jnp.ndarray, key: jax.Array, m: int = 10) -> jnp.ndarray:
    """One RandAugmentMC op slot on a single image (float HWC, [0,255])."""
    return apply_slot(img, *sample_slot_params(key, m), m=m)


def randaugment_mc(img: jnp.ndarray, key: jax.Array, n: int = 2, m: int = 10
                   ) -> jnp.ndarray:
    """Single-image RandAugmentMC; img float HWC in [0,255]."""
    for i in range(n):
        key, k_slot = jax.random.split(key)
        img = randaugment_slot(img, k_slot, m)
    key, k_cut = jax.random.split(key)
    return ops.cutout_abs(img, jnp.float32(16.0), k_cut)


# -- RandAugmentPC (randaugment.py:189-204) -----------------------------------
#
# Same slot machinery over the 16-op `my_augment_pool` (randaugment.py:166-185)
# with the PC distribution: fixed magnitude v = m, per-op apply probability
# drawn from U(0.2, 0.8) (``random() + prob >= 1`` applies with probability
# prob), sign flips on rotate/shear/translate/SolarizeAdd, and the final
# CutoutAbs(16).

_PC_ROTATE = 8
_PC_SHEAR_X = 10
_PC_SHEAR_Y = 11
_PC_TRANSLATE_X = 14
_PC_TRANSLATE_Y = 15

# op index -> color branch (geometry ops route to identity=11); numpy on
# purpose (see _COLOR_LOOKUP note)
_PC_COLOR_LOOKUP = np.asarray([0, 1, 2, 3, 4, 5, 6, 7, 11, 8, 11, 11, 9, 10,
                               11, 11])
_PC_IS_GEOMETRY = np.asarray([False, False, False, False, False, False,
                              False, False, True, False, True, True, False,
                              False, True, True])


def _pc_geometry_shifts(op, v, sign, h: int, w: int):
    """Shift vectors for the PC pool's geometry ops; translate max_v is 0.45
    (randaugment.py:184-185) vs FixMatch's 0.3."""
    yc = jax.lax.broadcasted_iota(jnp.float32, (h,), 0) + 0.5
    xc = jax.lax.broadcasted_iota(jnp.float32, (w,), 0) + 0.5

    theta = jnp.deg2rad(sign * _int_param(v, 30.0))
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    rot_rows = jnp.floor(a * (yc - h / 2.0) + 0.5).astype(jnp.int32)
    rot_cols = jnp.floor(b * (xc - w / 2.0) + 0.5).astype(jnp.int32)

    shear = sign * _float_param(v, 0.3)
    # PIL 16.16 fixed-point shear convention (see ops.pil_shear_shifts)
    shear_rows = ops.pil_shear_shifts(shear, h)
    shear_cols = ops.pil_shear_shifts(shear, w)

    trans_x = jnp.trunc(sign * _float_param(v, 0.45) * w).astype(jnp.int32)
    trans_y = jnp.trunc(sign * _float_param(v, 0.45) * h).astype(jnp.int32)

    zeros_h = jnp.zeros((h,), jnp.int32)
    zeros_w = jnp.zeros((w,), jnp.int32)
    s1 = jnp.select(
        [op == _PC_ROTATE, op == _PC_SHEAR_X, op == _PC_TRANSLATE_X],
        [rot_rows, shear_rows, jnp.full((h,), trans_x)], zeros_h)
    s2 = jnp.select(
        [op == _PC_ROTATE, op == _PC_SHEAR_Y, op == _PC_TRANSLATE_Y],
        [rot_cols, shear_cols, jnp.full((w,), trans_y)], zeros_w)
    s3 = jnp.where(op == _PC_ROTATE, rot_rows, zeros_h)
    return s1, s2, s3


def _pc_color_branches(h: int, w: int):
    """The 12 non-geometric PC branches; each fn(img, v, sign, key)
    (magnitudes per randaugment.py:166-185)."""
    def cutout(img, v, sign, key):
        size = jnp.trunc(_float_param(v, 0.2) * min(h, w))
        return ops.cutout_abs(img, size, key)

    return [
        lambda img, v, sign, key: ops.autocontrast(img),
        lambda img, v, sign, key: ops.brightness(img, _float_param(v, 1.8, 0.1)),
        lambda img, v, sign, key: ops.color(img, _float_param(v, 1.8, 0.1)),
        lambda img, v, sign, key: ops.contrast(img, _float_param(v, 1.8, 0.1)),
        cutout,
        lambda img, v, sign, key: ops.equalize(img),
        lambda img, v, sign, key: ops.invert(img),
        lambda img, v, sign, key: ops.posterize(img, _int_param(v, 4.0, 4.0)),
        lambda img, v, sign, key: ops.sharpness(img, _float_param(v, 1.8, 0.1)),
        lambda img, v, sign, key: ops.solarize(img, 256.0 - _int_param(v, 256.0)),
        lambda img, v, sign, key: ops.solarize_add(
            img, sign * _int_param(v, 110.0), 128.0),
        lambda img, v, sign, key: img,  # identity (geometry ops)
    ]


def sample_pc_slot_params(key: jax.Array, m: int = 10):
    """One PC slot's (op, v, sign, apply): v is FIXED at m; apply probability
    itself is random U(0.2, 0.8) (randaugment.py:198-201)."""
    k_op, k_prob, k_apply, k_sign = jax.random.split(key, 4)
    op = jax.random.randint(k_op, (), 0, 16)
    v = jnp.float32(m)
    sign = jnp.where(jax.random.uniform(k_sign) < 0.5, -1.0, 1.0)
    prob = jax.random.uniform(k_prob, minval=0.2, maxval=0.8)
    apply = jax.random.uniform(k_apply) < prob
    return op, v, sign, apply


def apply_pc_slot(img: jnp.ndarray, op, v, sign, apply, key,
                  m: int = 10) -> jnp.ndarray:
    """Apply one sampled PC op slot to a single image (float HWC, [0,255]);
    PC draws v = m exactly (randaugment.py:198), translate max_v 0.45."""
    h, w = img.shape[0], img.shape[1]
    bound = int(m * 0.45 / 10.0 * max(h, w)) + 2
    s1, s2, s3 = _pc_geometry_shifts(op, v, sign, h, w)
    geo = ops._shift_rows(img, s1, bound)
    geo = ops._shift_cols(geo, s2, bound)
    geo = ops._shift_rows(geo, s3, bound)

    color_idx = jnp.asarray(_PC_COLOR_LOOKUP)[op]
    color_out = jax.lax.switch(color_idx, _pc_color_branches(h, w),
                               img, v, sign, key)

    out = jnp.where(jnp.asarray(_PC_IS_GEOMETRY)[op], geo,
                    color_out.astype(img.dtype))
    return jnp.where(apply, out, img)


def randaugment_pc(img: jnp.ndarray, key: jax.Array, n: int = 2, m: int = 10
                   ) -> jnp.ndarray:
    """Single-image RandAugmentPC (randaugment.py:189-204); img float HWC in
    [0,255]."""
    for _ in range(n):
        key, k_slot, k_branch = jax.random.split(key, 3)
        img = apply_pc_slot(img, *sample_pc_slot_params(k_slot, m), k_branch,
                            m=m)
    key, k_cut = jax.random.split(key)
    return ops.cutout_abs(img, jnp.float32(16.0), k_cut)
