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


def test_kernel_equalize_forced(rng):
    """Both slots forced to equalize (apply=1): the in-kernel equalize must
    match the XLA ops.equalize exactly."""
    imgs = jnp.asarray(rng.integers(0, 256, (B, S, S, 3)), jnp.float32)
    pi = np.zeros((B, 6), np.int32)
    pi[:, 0] = S  # cutout center off-frame corner: minimal overlap
    pi[:, 1] = S
    pi[:, 2] = 4  # equalize
    pi[:, 3] = 1
    pi[:, 4] = 4
    pi[:, 5] = 1
    pf = np.tile(np.asarray([5.0, 1.0, 5.0, 1.0], np.float32), (B, 1))
    out_k = np.asarray(_forced_kernel(imgs, jnp.asarray(pi), jnp.asarray(pf)))
    out_x = np.asarray(xla_reference(imgs, jnp.asarray(pi), jnp.asarray(pf)))
    np.testing.assert_allclose(out_k, out_x, atol=1e-4)


def _forced_kernel(imgs, pi, pf):
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from endoscopy_tpu.ops import randaugment_kernel as rk

    b, h, w, _ = imgs.shape
    PAD = rk._pad_for(h)
    planar = imgs.transpose(0, 3, 1, 2).astype(jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 3, h, w), lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, h, w), lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((3, h, w), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(rk._kernel, n_slots=2, h=h, w=w, PAD=PAD),
        out_shape=jax.ShapeDtypeStruct(planar.shape, jnp.float32),
        grid_spec=grid_spec,
        interpret=True,
    )(pi, pf, planar)
    return out.transpose(0, 2, 3, 1)


def test_kernel_crop_fusion_matches_xla_crop(rng):
    """Crop-fused kernel (padded input + per-sample offsets sliced in VMEM)
    == roll-based XLA crop_at followed by the crop-free kernel, exactly
    (same aug params: both draw from the same key at the output size)."""
    from endoscopy_tpu.aug import ops

    PADDING, OUT = 3, S
    P = OUT + 2 * PADDING
    imgs = jnp.asarray(rng.integers(0, 256, (B, P, P, 3)), jnp.float32)
    tops = jnp.asarray(rng.integers(0, 2 * PADDING + 1, B), jnp.int32)
    lefts = jnp.asarray(rng.integers(0, 2 * PADDING + 1, B), jnp.int32)
    key = jax.random.key(7)

    out_fused = np.asarray(randaugment_mc_pallas(
        imgs, key, interpret=True, crop_offsets=(tops, lefts), crop_size=OUT))
    cropped = jax.vmap(
        lambda im, t, l: ops.crop_at(im, OUT, t, l, 2 * PADDING))(
            imgs, tops, lefts)
    out_ref = np.asarray(randaugment_mc_pallas(cropped, key, interpret=True))
    np.testing.assert_array_equal(out_fused, out_ref)


def test_kernel_bf16_io_matches_f32_io(rng):
    """bf16 block I/O (the production path — views pass the aug dtype
    straight through since round 5): uint8-derived
    pixels are exact in bf16 and compute stays f32 in scratch, so the
    bf16-I/O kernel must equal the f32-I/O kernel after the final bf16
    cast — bit-identical, not approximately."""
    imgs_f32 = jnp.asarray(rng.integers(0, 256, (B, S, S, 3)), jnp.float32)
    imgs_bf16 = imgs_f32.astype(jnp.bfloat16)
    key = jax.random.key(5)
    out_bf16 = np.asarray(
        randaugment_mc_pallas(imgs_bf16, key, interpret=True)
        .astype(jnp.float32))
    out_f32 = np.asarray(
        randaugment_mc_pallas(imgs_f32, key, interpret=True)
        .astype(jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_array_equal(out_bf16, out_f32)


def test_kernel_bf16_io_crop_fusion_matches_f32_io(rng):
    """bf16 block I/O through the CROP-FUSED launch (the production shape on
    the flagship): the crop rotations upcast to f32 in VMEM — Mosaic's
    sublane dynamic_rotate has no packed-16-bit lowering — so the bf16-I/O
    fused kernel must equal the f32-I/O fused kernel bit-for-bit after the
    final bf16 cast."""
    PADDING, OUT = 3, S
    P = OUT + 2 * PADDING
    imgs = jnp.asarray(rng.integers(0, 256, (B, P, P, 3)), jnp.float32)
    tops = jnp.asarray(rng.integers(0, 2 * PADDING + 1, B), jnp.int32)
    lefts = jnp.asarray(rng.integers(0, 2 * PADDING + 1, B), jnp.int32)
    key = jax.random.key(9)

    out_bf16 = np.asarray(randaugment_mc_pallas(
        imgs.astype(jnp.bfloat16), key, interpret=True,
        crop_offsets=(tops, lefts), crop_size=OUT).astype(jnp.float32))
    out_f32 = np.asarray(randaugment_mc_pallas(
        imgs, key, interpret=True, crop_offsets=(tops, lefts),
        crop_size=OUT).astype(jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_array_equal(out_bf16, out_f32)


@pytest.mark.slow
def test_tpu_compile_smoke_all_configs():
    """Mosaic-compile every shipped kernel configuration on a REAL TPU.

    Interpret mode validates semantics only — none of Mosaic's
    layout/lowering legality. Both round-4 candidates passed interpret and
    died in tpu_compile_helper (VERDICT r4 item 2, diagnostics in
    perf_runs/2026-08-19_pallas_smoke.log); this smoke makes that class of
    failure a committed test instead of a production surprise."""
    if jax.default_backend() != "tpu":
        pytest.skip("real-TPU Mosaic toolchain required")
    import tools.pallas_compile_smoke as smoke

    failures = []
    for name, dt, crop, size in smoke.configs(img=224):
        try:
            smoke.run_one(name, dt, crop, size)
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)


def test_strong_pad_path_bit_identical_to_xla_strong_pre(rng):
    """The Pallas-path pad+offsets emitter draws the same flips and crop
    offsets as the XLA _fixmatch_strong_pre for the same key, so the two
    strong-view paths see identical pixels entering RandAugment."""
    from endoscopy_tpu.aug import ops
    from endoscopy_tpu.aug.views import (_fixmatch_strong_pad_one,
                                         _fixmatch_strong_pre)

    IMG = 24
    canon = int(IMG * 1.2)
    img = jnp.asarray(rng.integers(0, 256, (canon, canon, 3)), jnp.float32)
    padding = int(IMG * 0.125)
    for seed in (0, 1, 2, 3):
        key = jax.random.key(seed)
        xla = _fixmatch_strong_pre(img, key, IMG)
        padded, top, left = _fixmatch_strong_pad_one(img, key, IMG)
        fused = ops.crop_at(padded, IMG, top, left, 2 * padding)
        np.testing.assert_array_equal(np.asarray(xla), np.asarray(fused))
