"""RandAugmentMC structure tests: the composed-geometry slot must reproduce
the standalone ops exactly (randaugment.py:147-163 magnitude contracts)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from endoscopy_tpu.aug import ops
from endoscopy_tpu.aug.randaugment import (
    _COLOR_LOOKUP,
    _IS_GEOMETRY,
    _float_param,
    _geometry_shifts,
    _int_param,
    randaugment_mc,
)

H = W = 48


@pytest.fixture
def img(rng):
    return jnp.asarray(rng.integers(0, 256, (H, W, 3)), jnp.float32)


def apply_shifts(img, s1, s2, s3):
    out = ops._shift_rows(img, s1)
    out = ops._shift_cols(out, s2)
    return ops._shift_rows(out, s3)


def test_rotate_composition_matches_op(img):
    v, sign = jnp.float32(6.0), jnp.float32(1.0)
    s1, s2, s3 = _geometry_shifts(jnp.int32(7), v, sign, H, W)
    composed = apply_shifts(img, s1, s2, s3)
    direct = ops.rotate(img, sign * _int_param(v, 30.0))
    np.testing.assert_allclose(np.asarray(composed), np.asarray(direct))


@pytest.mark.parametrize("op,fn", [
    (9, lambda im, v, s: ops.shear_x(im, s * _float_param(v, 0.3))),
    (10, lambda im, v, s: ops.shear_y(im, s * _float_param(v, 0.3))),
    (12, lambda im, v, s: ops.translate_x(im, jnp.trunc(s * _float_param(v, 0.3) * W))),
    (13, lambda im, v, s: ops.translate_y(im, jnp.trunc(s * _float_param(v, 0.3) * H))),
])
def test_geometry_composition_matches_ops(img, op, fn):
    v, sign = jnp.float32(4.0), jnp.float32(-1.0)
    s1, s2, s3 = _geometry_shifts(jnp.int32(op), v, sign, H, W)
    composed = apply_shifts(img, s1, s2, s3)
    direct = fn(img, v, sign)
    np.testing.assert_allclose(np.asarray(composed), np.asarray(direct))


def test_color_ops_get_identity_geometry(img):
    for op in (0, 1, 2, 3, 4, 5, 6, 8, 11):
        s1, s2, s3 = _geometry_shifts(jnp.int32(op), jnp.float32(5.0),
                                      jnp.float32(1.0), H, W)
        out = apply_shifts(img, s1, s2, s3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img))
        assert not bool(_IS_GEOMETRY[op])


def test_lookup_tables_consistent():
    # geometry ops route to the identity color branch (5)
    for op in (7, 9, 10, 12, 13):
        assert bool(_IS_GEOMETRY[op])
        assert int(_COLOR_LOOKUP[op]) == 5
    # color ops map to their own branch
    assert int(_COLOR_LOOKUP[4]) == 4  # equalize
    assert int(_COLOR_LOOKUP[11]) == 8  # solarize


def test_randaugment_always_cutouts(img, rng):
    """CutoutAbs(16) always applied (randaugment.py:221): some gray-filled
    128-ish rectangle must exist in most outputs."""
    keys = jax.random.split(jax.random.key(0), 16)
    outs = jax.vmap(lambda k: randaugment_mc(img, k))(keys)
    frac_with_gray = np.mean([(np.asarray(o) == 127.0).all(-1).any()
                              for o in outs])
    assert frac_with_gray > 0.8  # some ops (e.g. posterize 127->124) may mask


def test_randaugment_statistics(img):
    """~50% of slots apply an op; outputs stay in [0, 255]."""
    keys = jax.random.split(jax.random.key(1), 32)
    outs = np.asarray(jax.vmap(lambda k: randaugment_mc(img, k))(keys))
    assert outs.min() >= 0.0 and outs.max() <= 255.0
    # different keys produce different augmentations
    assert len({outs[i].tobytes() for i in range(8)}) > 4


def test_mixup_cutmix_semantics(rng):
    """Mixup/CutMix: soft targets sum to 1; cutmix lam equals realized box
    area; passthrough when prob=0 (timm Mixup semantics, aug/mixup.py)."""
    from endoscopy_tpu.aug.mixup import mixup_cutmix

    x = jnp.asarray(rng.integers(0, 256, (8, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 6, (8,)))
    mx, my = mixup_cutmix(x, y, jax.random.key(0), num_classes=6,
                          mixup_alpha=0.8, cutmix_alpha=1.0,
                          label_smoothing=0.0)
    np.testing.assert_allclose(np.asarray(my).sum(axis=1), np.ones(8), rtol=1e-5)
    assert mx.shape == x.shape
    # passthrough
    px, py = mixup_cutmix(x, y, jax.random.key(0), num_classes=6,
                          mixup_alpha=0.8, cutmix_alpha=0.0, prob=0.0,
                          label_smoothing=0.0)
    np.testing.assert_allclose(np.asarray(px), np.asarray(x))
    np.testing.assert_allclose(np.asarray(py),
                               np.eye(6)[np.asarray(y)], atol=1e-6)
    # cutmix-only: mixed pixels come from x or flipped x exactly
    cx, cy = mixup_cutmix(x, y, jax.random.key(3), num_classes=6,
                          mixup_alpha=0.0, cutmix_alpha=1.0, switch_prob=1.0,
                          label_smoothing=0.0)
    cx = np.asarray(cx)
    src_a = np.asarray(x)
    src_b = np.asarray(x)[::-1]
    match = (cx == src_a) | (cx == src_b)
    assert match.all()


def test_randaugment_pc_statistics(img):
    """RandAugmentPC (randaugment.py:189-204): outputs valid, final
    CutoutAbs(16) always applied, different keys vary."""
    from endoscopy_tpu.aug.randaugment import randaugment_pc

    keys = jax.random.split(jax.random.key(2), 32)
    outs = np.asarray(jax.vmap(lambda k: randaugment_pc(img, k, n=2, m=7))(keys))
    assert outs.min() >= 0.0 and outs.max() <= 255.0
    frac_with_gray = np.mean([(o == 127.0).all(-1).any() for o in outs])
    assert frac_with_gray > 0.8
    assert len({outs[i].tobytes() for i in range(8)}) > 4


def test_randaugment_pc_apply_probability():
    """PC slots apply with probability prob ~ U(0.2, 0.8): mean apply rate
    ~0.5 and magnitude is FIXED at m (randaugment.py:198-201)."""
    from endoscopy_tpu.aug.randaugment import sample_pc_slot_params

    keys = jax.random.split(jax.random.key(3), 2000)
    ops_, vs, signs, applies = jax.vmap(
        lambda k: sample_pc_slot_params(k, m=9))(keys)
    assert float(np.mean(np.asarray(applies))) == pytest.approx(0.5, abs=0.05)
    np.testing.assert_array_equal(np.asarray(vs), 9.0)
    assert np.asarray(ops_).min() >= 0 and np.asarray(ops_).max() <= 15
    # all 16 PC ops get drawn
    assert len(set(np.asarray(ops_).tolist())) == 16


def test_randaugment_pc_ops_match_pil(img):
    """Each deterministic PC color branch matches its PIL formula on the
    shared ops kernels (invert / solarize-add / cutout sizing)."""
    from endoscopy_tpu.aug import ops as aops
    from endoscopy_tpu.aug.randaugment import (
        _PC_COLOR_LOOKUP, _PC_IS_GEOMETRY, apply_pc_slot)

    x = np.asarray(img)
    # Invert (op 6): 255 - x
    out = apply_pc_slot(img, jnp.int32(6), jnp.float32(5), jnp.float32(1.0),
                        jnp.bool_(True), jax.random.key(0))
    np.testing.assert_allclose(np.asarray(out), 255.0 - x)
    # SolarizeAdd (op 13), sign +: clip(x+int(9*110/10)) then solarize at 128
    v = int(9 * 110 / 10)
    expect = np.clip(x + v, 0, 255)
    expect = np.where(expect >= 128, 255.0 - expect, expect)
    out = apply_pc_slot(img, jnp.int32(13), jnp.float32(9), jnp.float32(1.0),
                        jnp.bool_(True), jax.random.key(0))
    np.testing.assert_allclose(np.asarray(out), expect)
    # lookup tables consistent
    assert len(_PC_COLOR_LOOKUP) == len(_PC_IS_GEOMETRY) == 16


@pytest.mark.parametrize("h,w", [(112, 112), (224, 224), (96, 128)])
def test_geometry_shift_bounds_cover_max_magnitude(h, w):
    """The analytic max_shift bounds passed to _shift_rows/_shift_cols
    (randaugment.py apply_slot / apply_pc_slot) must dominate the actual
    per-row shifts at the MAXIMUM magnitude for every geometric op and both
    signs — _shift_rows silently clips (and corrupts) shifts beyond its
    bound, so a future magnitude/op change that outgrows the bound must fail
    here loudly (advisor finding, aug/ops.py:86)."""
    from endoscopy_tpu.aug.randaugment import (
        _OP_ROTATE, _OP_SHEAR_X, _OP_SHEAR_Y, _OP_TRANSLATE_X,
        _OP_TRANSLATE_Y, _PC_ROTATE, _PC_SHEAR_X, _PC_SHEAR_Y,
        _PC_TRANSLATE_X, _PC_TRANSLATE_Y, _geometry_shifts,
        _pc_geometry_shifts)

    m = 10
    # MC: v <= m - 1 (randint(1, m) upper-exclusive); bound from apply_slot
    bound = int((m - 1) * 0.3 / 10.0 * max(h, w)) + 2
    for op in (_OP_ROTATE, _OP_SHEAR_X, _OP_SHEAR_Y, _OP_TRANSLATE_X,
               _OP_TRANSLATE_Y):
        for sign in (-1.0, 1.0):
            shifts = _geometry_shifts(jnp.int32(op), jnp.float32(m - 1),
                                      jnp.float32(sign), h, w)
            worst = max(int(np.abs(np.asarray(s)).max()) for s in shifts)
            assert worst <= bound, (op, sign, worst, bound)

    # PC: v is fixed at m; bound from apply_pc_slot (translate max_v 0.45)
    bound_pc = int(m * 0.45 / 10.0 * max(h, w)) + 2
    for op in (_PC_ROTATE, _PC_SHEAR_X, _PC_SHEAR_Y, _PC_TRANSLATE_X,
               _PC_TRANSLATE_Y):
        for sign in (-1.0, 1.0):
            shifts = _pc_geometry_shifts(jnp.int32(op), jnp.float32(m),
                                         jnp.float32(sign), h, w)
            worst = max(int(np.abs(np.asarray(s)).max()) for s in shifts)
            assert worst <= bound_pc, (op, sign, worst, bound_pc)


def test_rotate_max_degrees_bound_is_exact(img):
    """ops.rotate's trimmed roll passes (max_degrees bound) must equal the
    unbounded path at the extreme angle — the bound only trims work, never
    changes pixels."""
    for deg in (-30.0, 30.0):
        bounded = ops.rotate(img, jnp.float32(deg), max_degrees=30.0)
        full = ops.rotate(img, jnp.float32(deg), max_degrees=None)
        np.testing.assert_array_equal(np.asarray(bounded), np.asarray(full))
