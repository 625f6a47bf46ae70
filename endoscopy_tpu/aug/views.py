"""Batch view builders: weak / strong / CoMatch / labeled-train / eval.

TPU-native equivalents of the torchvision transform stacks
(dataset.py:24-132, 177-232). The host ships ONE canonical uint8 batch per
role (pipeline.canonical_size); every view below derives on device inside the
jitted step, so the FixMatch dual-view path reads each image from HBM once
and never touches the host.

All functions take uint8 NHWC canonical batches and return normalized float
NHWC at IMG_SIZE. Per-sample randomness comes from split jax.random keys.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from endoscopy_tpu.aug import ops
from endoscopy_tpu.aug.randaugment import randaugment_mc

# None = auto (Pallas per-sample-dispatch kernel on TPU, XLA path elsewhere);
# True/False forces. The kernel executes only each sample's chosen op instead
# of all 14 pool branches (ops/randaugment_kernel.py) — ~30x faster on v5e.
USE_PALLAS_RANDAUG = None

# The Pallas kernel streams its in/out blocks in the aug dtype (bf16 on the
# flagship) rather than upcasting to f32 around the call: halves the
# kernel's HBM traffic and drops the standalone convert passes.
# Bit-identical output — the padded inputs are uint8-derived (exact in
# bf16), compute stays f32 in VMEM, and the final bf16 cast merely moves
# inside the kernel (tests/test_pallas_kernel.py bf16-vs-f32 tests); every
# dtype x crop config Mosaic-compiles on the chip
# (tools/pallas_compile_smoke.py). Formerly flag-gated as
# PALLAS_NATIVE_DTYPE_IO; unconditional since the round-5 A/B measured it
# never-worse (224px full step: 218.28 vs 219.36 ms — see PERF.md).


def _pallas_randaug_enabled() -> bool:
    if USE_PALLAS_RANDAUG is not None:
        return bool(USE_PALLAS_RANDAUG)
    return jax.default_backend() != "cpu"


def _randaugment_batch(x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Batch RandAugmentMC(2,10)+Cutout via the fastest available path."""
    if _pallas_randaug_enabled():
        from endoscopy_tpu.ops.randaugment_kernel import randaugment_mc_pallas
        return randaugment_mc_pallas(x, key).astype(x.dtype)
    keys = jax.random.split(key, x.shape[0])
    return jax.vmap(randaugment_mc)(x, keys)

# ImageNet statistics (dataset.py:21-22). numpy on purpose: module-scope
# jnp arrays would initialize the jax backend at import time, before
# consumers can pick a platform.
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def normalize(img: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """ToTensor + Normalize(mean, std) on [0,255] input."""
    out = ((img / 255.0 - jnp.asarray(IMAGENET_MEAN, img.dtype))
           / jnp.asarray(IMAGENET_STD, img.dtype))
    return out.astype(dtype)


def _to_float(batch_u8: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 → augmentation compute dtype. bf16 halves HBM traffic through
    the whole on-device aug pipeline; 0..255 integers are exact in bf16 and
    color-op rounding stays well under the golden-test tolerance (ops run in
    f32 on CPU tests)."""
    return batch_u8.astype(dtype)


def _center(img: jnp.ndarray, img_size: int) -> jnp.ndarray:
    """Canonical → IMG_SIZE center crop (no-op when canonical == IMG_SIZE)."""
    if img.shape[0] == img_size:
        return img
    return ops.center_crop(img, img_size)


def _maybe(fn, img, key, p):
    return jnp.where(jax.random.uniform(key) < p, fn(img), img)


# ---------------------------------------------------------------------------
# FixMatch / SemiFormer views (TransformFixMatch, dataset.py:24-56)
# ---------------------------------------------------------------------------


def _fixmatch_weak_one(img, img_size: int):
    return _center(img, img_size)


def _fixmatch_strong_pre(img, key, img_size: int):
    """Strong view minus RandAugment (applied batch-wise afterwards)."""
    k_flip, k_crop = jax.random.split(key)
    img = _center(img, img_size)
    img = _maybe(ops.hflip, img, k_flip, 0.5)
    return ops.random_crop_reflect(img, img_size, int(img_size * 0.125), k_crop)


def _fixmatch_strong_pad_one(img, key, img_size: int):
    """Pallas path: the RandomCrop is fused into the kernel, so emit the
    reflect-padded image + sampled offsets instead of cropping here. Key
    draws mirror _fixmatch_strong_pre exactly (bit-identical crops,
    asserted in tests/test_pallas_kernel.py)."""
    k_flip, k_crop = jax.random.split(key)
    img = _center(img, img_size)
    img = _maybe(ops.hflip, img, k_flip, 0.5)
    padding = int(img_size * 0.125)
    padded = jnp.pad(img, ((padding, padding), (padding, padding), (0, 0)),
                     mode="reflect")
    top, left = ops.sample_crop_offsets(k_crop, 2 * padding)
    return padded, top, left


def fixmatch_views(batch_u8: jnp.ndarray, key: jax.Array, img_size: int,
                   dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(weak, strong) from one canonical batch."""
    x = _to_float(batch_u8, dtype)
    weak = jax.vmap(partial(_fixmatch_weak_one, img_size=img_size))(x)
    k_pre, k_ra = jax.random.split(key)
    keys = jax.random.split(k_pre, x.shape[0])
    if _pallas_randaug_enabled():
        # crop-fused kernel: VMEM addressing replaces ~13 HBM roll passes
        # over the padded image (measured 13.5 ms for 224 imgs @224px)
        from endoscopy_tpu.ops.randaugment_kernel import randaugment_mc_pallas
        padded, tops, lefts = jax.vmap(
            partial(_fixmatch_strong_pad_one, img_size=img_size))(x, keys)
        strong = randaugment_mc_pallas(
            padded, k_ra, crop_offsets=(tops, lefts),
            crop_size=img_size).astype(x.dtype)
    else:
        strong = jax.vmap(partial(_fixmatch_strong_pre, img_size=img_size))(
            x, keys)
        strong = _randaugment_batch(strong, k_ra)
    return normalize(weak, dtype), normalize(strong, dtype)


# ---------------------------------------------------------------------------
# CoMatch views (TransformCoMatch, dataset.py:58-109)
# ---------------------------------------------------------------------------


def _comatch_weak_one(img, key, img_size: int):
    img = _center(img, img_size)
    return _maybe(ops.hflip, img, key, 0.5)


def _comatch_strong0_pre(img, key, img_size: int):
    img = _center(img, img_size)
    return _maybe(ops.hflip, img, key, 0.5)


def _color_jitter_one(img, key, b: float, c: float, s: float, h: float):
    """torchvision ColorJitter: random factors, random op order."""
    k_perm, k_b, k_c, k_s, k_h = jax.random.split(key, 5)
    fb = jax.random.uniform(k_b, (), img.dtype, max(0.0, 1 - b), 1 + b)
    fc = jax.random.uniform(k_c, (), img.dtype, max(0.0, 1 - c), 1 + c)
    fs = jax.random.uniform(k_s, (), img.dtype, max(0.0, 1 - s), 1 + s)
    fh = jax.random.uniform(k_h, (), img.dtype, -h, h)
    order = jax.random.permutation(k_perm, 4)

    def apply_op(i, im):
        return jax.lax.switch(order[i], [
            lambda x: ops.brightness(x, fb),
            lambda x: ops.contrast(x, fc),
            lambda x: ops.color(x, fs),  # saturation == PIL Color enhance
            lambda x: ops.adjust_hue(x, fh) if h > 0 else x,
        ], im)

    return jax.lax.fori_loop(0, 4, apply_op, img)


def _comatch_strong1_one(img, key, img_size: int):
    k_jit_p, k_jit, k_gray, k_flip = jax.random.split(key, 4)
    img = _center(img, img_size)
    jittered = _color_jitter_one(img, k_jit, 0.4, 0.4, 0.4, 0.1)
    img = jnp.where(jax.random.uniform(k_jit_p) < 0.8, jittered, img)
    img = _maybe(ops.grayscale, img, k_gray, 0.2)
    return _maybe(ops.hflip, img, k_flip, 0.5)


def comatch_views(batch_u8: jnp.ndarray, key: jax.Array, img_size: int,
                  dtype=jnp.float32):
    """(weak, strong0, strong1) from one canonical batch."""
    x = _to_float(batch_u8, dtype)
    kw, k0, k1 = jax.random.split(key, 3)
    n = x.shape[0]
    weak = jax.vmap(partial(_comatch_weak_one, img_size=img_size))(
        x, jax.random.split(kw, n))
    k0_pre, k0_ra = jax.random.split(k0)
    s0 = jax.vmap(partial(_comatch_strong0_pre, img_size=img_size))(
        x, jax.random.split(k0_pre, n))
    s0 = _randaugment_batch(s0, k0_ra)
    s1 = jax.vmap(partial(_comatch_strong1_one, img_size=img_size))(
        x, jax.random.split(k1, n))
    return normalize(weak, dtype), normalize(s0, dtype), normalize(s1, dtype)


# ---------------------------------------------------------------------------
# Labeled supervised train view (get_transform is_train/is_labeled,
# dataset.py:184-207): flips p=0.3, rotation ±20, center crop, color jitter
# (brightness/contrast/saturation 0.2).
# ---------------------------------------------------------------------------


def _labeled_train_one(img, key, img_size: int):
    k_h, k_v, k_rot, k_jit = jax.random.split(key, 4)
    img = _maybe(ops.hflip, img, k_h, 0.3)
    img = _maybe(ops.vflip, img, k_v, 0.3)
    angle = jax.random.uniform(k_rot, (), minval=-20.0, maxval=20.0)
    img = ops.rotate(img, angle, max_degrees=20.0)
    img = _center(img, img_size)
    return _color_jitter_one(img, k_jit, 0.2, 0.2, 0.2, 0.0)


def labeled_train_view(batch_u8: jnp.ndarray, key: jax.Array, img_size: int,
                       dtype=jnp.float32) -> jnp.ndarray:
    x = _to_float(batch_u8, dtype)
    keys = jax.random.split(key, x.shape[0])
    out = jax.vmap(partial(_labeled_train_one, img_size=img_size))(x, keys)
    return normalize(out, dtype)


# ---------------------------------------------------------------------------
# Eval view (dataset.py:216-231): deterministic center crop + normalize.
# ---------------------------------------------------------------------------


def eval_view(batch_u8: jnp.ndarray, img_size: int, dtype=jnp.float32) -> jnp.ndarray:
    x = _to_float(batch_u8, dtype)
    out = jax.vmap(partial(_center, img_size=img_size))(x)
    return normalize(out, dtype)


# ---------------------------------------------------------------------------
# Paper-reproduction views (reproduce_transform, dataset.py:111-132; reached
# via get_transform(is_reprod=True) from Train.ipynb's kaggle_reproduce
# cell). The torch stack Resize(256)->CenterCrop(256)->Resize(224) collapses
# to ONE deterministic bilinear resize on the square canonical batch; train
# adds hflip/vflip p=0.5 and a uniform ±90° rotation; normalization is
# mean=std=0.5 (NOT ImageNet). Select with DATA.IS_REPROD.
# ---------------------------------------------------------------------------


def _normalize_half(img: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    return (img / 255.0 * 2.0 - 1.0).astype(dtype)


def _resize_square(img: jnp.ndarray, img_size: int) -> jnp.ndarray:
    return jax.image.resize(
        img, (img_size, img_size, img.shape[-1]), method="linear")


def _reproduce_train_one(img, key, img_size: int):
    img = _resize_square(img, img_size)
    k_h, k_v, k_rot = jax.random.split(key, 3)
    img = _maybe(ops.hflip, img, k_h, 0.5)
    img = _maybe(ops.vflip, img, k_v, 0.5)
    angle = jax.random.uniform(k_rot, (), minval=-90.0, maxval=90.0)
    return ops.rotate(img, angle, max_degrees=90.0)


def reproduce_train_view(batch_u8: jnp.ndarray, key: jax.Array, img_size: int,
                         dtype=jnp.float32) -> jnp.ndarray:
    x = _to_float(batch_u8, dtype)
    keys = jax.random.split(key, x.shape[0])
    out = jax.vmap(partial(_reproduce_train_one, img_size=img_size))(x, keys)
    return _normalize_half(out, dtype)


def reproduce_eval_view(batch_u8: jnp.ndarray, img_size: int,
                        dtype=jnp.float32) -> jnp.ndarray:
    x = _to_float(batch_u8, dtype)
    out = jax.vmap(partial(_resize_square, img_size=img_size))(x)
    return _normalize_half(out, dtype)
