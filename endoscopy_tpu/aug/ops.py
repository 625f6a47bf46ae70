"""Primitive on-device image ops (single image, float32 HWC in [0, 255]).

Branchless, vmappable JAX re-implementations of the PIL operations the
reference augments with (randaugment.py:20-136 and torchvision transforms in
dataset.py). Geometry uses one shared inverse-affine warp with nearest
resampling (PIL's default for ``Image.transform``/``rotate``); color ops
follow ImageEnhance's blend-with-degenerate formulation. Exact bit-parity
with PIL is impossible (resampling details differ); golden tests compare
within tolerance (SURVEY.md §7 hard parts).

Everything here runs *inside* the jitted train step and fuses with the model
compute — the host only ships canonical uint8 batches (pipeline.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# geometry: shared inverse-affine warp
# ---------------------------------------------------------------------------


def affine_warp(img: jnp.ndarray, mat: jnp.ndarray, fill: float = 0.0,
                bilinear: bool = False) -> jnp.ndarray:
    """Warp with PIL transform semantics: the source position for output
    pixel (x, y) is sampled at pixel centers,
    ``src = M @ (x + 0.5, y + 0.5, 1)``, nearest = floor(src)
    (PIL ImagingTransformAffine convention); out-of-bounds → fill.
    mat = [[a, b, c], [d, e, f]].
    """
    h, w = img.shape[0], img.shape[1]
    yg = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
    xg = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
    x_in = mat[0, 0] * xg + mat[0, 1] * yg + mat[0, 2]
    y_in = mat[1, 0] * xg + mat[1, 1] * yg + mat[1, 2]

    if bilinear:
        x_in = x_in - 0.5
        y_in = y_in - 0.5
        x0 = jnp.floor(x_in)
        y0 = jnp.floor(y_in)
        fx = (x_in - x0)[..., None]
        fy = (y_in - y0)[..., None]

        def gather(yi, xi):
            valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            v = img[jnp.clip(yi, 0, h - 1).astype(jnp.int32),
                    jnp.clip(xi, 0, w - 1).astype(jnp.int32)]
            return jnp.where(valid[..., None], v, fill)

        v00 = gather(y0, x0)
        v01 = gather(y0, x0 + 1)
        v10 = gather(y0 + 1, x0)
        v11 = gather(y0 + 1, x0 + 1)
        top = v00 * (1 - fx) + v01 * fx
        bot = v10 * (1 - fx) + v11 * fx
        return top * (1 - fy) + bot * fy

    xi = jnp.floor(x_in)
    yi = jnp.floor(y_in)
    valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    out = img[jnp.clip(yi, 0, h - 1).astype(jnp.int32),
              jnp.clip(xi, 0, w - 1).astype(jnp.int32)]
    return jnp.where(valid[..., None], out, fill)


# -- gather-free geometric ops ----------------------------------------------
# TPU has no fast hardware gather: per-pixel warp gathers run on the scalar
# core (~150ms for a 224x112² batch). All RandAugment geometry is therefore
# expressed as PER-ROW INTEGER SHIFTS. Shears/translates are exactly
# row/column shifts under PIL's pixel-center nearest sampling (x integer ⇒
# floor(x + a) = x + floor(a)); rotation uses the Paeth three-shear
# decomposition. A per-row shift is applied as a BIT-DECOMPOSED sequence of
# static rolls (rows are independent under axis-1 rolls, so selecting the
# rolled plane into rows whose shift-bit is set composes to a rotation by the
# full per-row shift): ~log2(2W) vectorized select passes. This beats both
# per-pixel gathers (scalar core) and one-hot selection matmuls (the batched
# matmul has N = 3 channels ⇒ ~2% MXU utilization — measured 4x slower than
# the rolls on a 224-image crop stage).


def _shift_rows(img: jnp.ndarray, shifts: jnp.ndarray,
                max_shift: int | None = None) -> jnp.ndarray:
    """out[y, x] = img[y, x + shifts[y]] with zero fill (bit-decomposed
    static rolls; exact for |shift| <= max_shift < W).

    ``max_shift`` bounds |shifts| and sets the number of roll passes
    (log2(2*max_shift)); callers with known-small shifts (crops, shears)
    should pass their bound."""
    h, w = img.shape[0], img.shape[1]
    PAD = min(w - 1, w if max_shift is None else max_shift)
    sp = jnp.clip(shifts, -PAD, PAD) + PAD  # (h,) in [0, 2*PAD]
    out = img
    nbits = max(int(2 * PAD).bit_length(), 1)
    for k in range(nbits):
        bit = (sp >> k) & 1
        rolled = jnp.roll(out, -(1 << k) % w, axis=1)
        out = jnp.where((bit == 1)[:, None, None], rolled, out)
    out = jnp.roll(out, PAD % w, axis=1)  # undo the bias
    xg = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    # clipped shifts only ever matter as "fully out of frame": mask with the
    # ORIGINAL shifts so any |shift| > PAD yields fill everywhere it should
    valid = (xg + shifts[:, None] >= 0) & (xg + shifts[:, None] < w)
    return jnp.where(valid[..., None], out, jnp.zeros((), img.dtype))


def _shift_cols(img: jnp.ndarray, shifts: jnp.ndarray,
                max_shift: int | None = None) -> jnp.ndarray:
    """out[y, x] = img[y + shifts[x], x] with zero fill."""
    return _shift_rows(img.swapaxes(0, 1), shifts, max_shift).swapaxes(0, 1)


def pil_shear_shifts(coef: jnp.ndarray, n: int) -> jnp.ndarray:
    """Per-index source shifts of Pillow's NEAREST affine for a shear row
    (1, coef, 0). Pillow quantizes the matrix to 16.16 fixed point and
    accumulates in integers (Geometry.c affine_fixed: FIX(t) =
    floor(t*65536 + 0.5); start = FIX(c + a*0.5 + b*0.5); xin = xx >> 16),
    so shift(i) = (FIX(coef)*i + FIX(0.5 + 0.5*coef)) >> 16. Replicating
    the quantization makes shear bit-exact vs PIL — floor(coef*(i+0.5)+0.5)
    is off by one whole row wherever coef*(i+0.5) lands exactly on a half
    (e.g. every 5th row at coef=0.2)."""
    a1, a2 = pil_fix_coeffs(coef)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    return (a1 * idx + a2) >> 16  # arithmetic shift: floor, like Pillow's C


def pil_fix_coeffs(coef):
    """Pillow's quantized 16.16 coefficients for a shear row (1, coef, 0):
    (FIX(coef), FIX(0.5 + 0.5*coef)). Shared with the Pallas kernel, which
    builds its own 2-D iota (Mosaic rejects 1-D iota) but must use the SAME
    quantization to stay bit-identical to this path."""
    a1 = jnp.floor(coef * 65536.0 + 0.5).astype(jnp.int32)
    a2 = jnp.floor((0.5 + 0.5 * coef) * 65536.0 + 0.5).astype(jnp.int32)
    return a1, a2


def shear_x(img: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """img.transform(AFFINE, (1, v, 0, 0, 1, 0)) (randaugment.py:92-96):
    x_in = x + v*y in PIL's 16.16 fixed-point arithmetic."""
    return _shift_rows(img, pil_shear_shifts(v, img.shape[0]))


def shear_y(img: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return _shift_cols(img, pil_shear_shifts(v, img.shape[1]))


def translate_x(img: jnp.ndarray, pixels: jnp.ndarray) -> jnp.ndarray:
    """img.transform(AFFINE, (1, 0, v, 0, 1, 0)) (randaugment.py:123-128)."""
    h = img.shape[0]
    shifts = jnp.full((h,), jnp.asarray(pixels, jnp.int32))
    return _shift_rows(img, shifts)


def translate_y(img: jnp.ndarray, pixels: jnp.ndarray) -> jnp.ndarray:
    w = img.shape[1]
    shifts = jnp.full((w,), jnp.asarray(pixels, jnp.int32))
    return _shift_cols(img, shifts)


def _shear_rows_centered(img, coef, cy, max_shift: int | None = None):
    h = img.shape[0]
    yc = jax.lax.broadcasted_iota(jnp.float32, (h,), 0) + 0.5 - cy
    shifts = jnp.floor(coef * yc + 0.5).astype(jnp.int32)
    return _shift_rows(img, shifts, max_shift)


def _shear_cols_centered(img, coef, cx, max_shift: int | None = None):
    w = img.shape[1]
    xc = jax.lax.broadcasted_iota(jnp.float32, (w,), 0) + 0.5 - cx
    shifts = jnp.floor(coef * xc + 0.5).astype(jnp.int32)
    return _shift_cols(img, shifts, max_shift)


def rotate(img: jnp.ndarray, degrees: jnp.ndarray,
           max_degrees: float | None = None) -> jnp.ndarray:
    """PIL Image.rotate(angle) semantics (CCW about the center, nearest,
    black fill; randaugment.py:80-84) via the Paeth three-shear
    decomposition: rot(θ) = shearX(-tan θ/2) ∘ shearY(sin θ) ∘
    shearX(-tan θ/2). Each shear is a gather-free row/column-shift pass;
    per-pass nearest rounding deviates from single-pass nearest by ≤1px on a
    small pixel fraction (tolerance-tested against PIL). ``max_degrees``
    (static |angle| bound) trims the per-shear roll passes."""
    import math

    h, w = img.shape[0], img.shape[1]
    cx, cy = w / 2.0, h / 2.0
    theta = jnp.deg2rad(degrees)
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    if max_degrees is not None:
        mt = math.radians(abs(max_degrees))
        bound_a = int(math.tan(mt / 2.0) * (h / 2.0 + 1)) + 2
        bound_b = int(math.sin(mt) * (w / 2.0 + 1)) + 2
    else:
        bound_a = bound_b = None
    out = _shear_rows_centered(img, a, cy, bound_a)
    out = _shear_cols_centered(out, b, cx, bound_b)
    return _shear_rows_centered(out, a, cy, bound_a)


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Static-shape bilinear resize (torchvision Resize semantics)."""
    return jax.image.resize(img, (out_h, out_w, img.shape[-1]), method="bilinear")


def center_crop(img: jnp.ndarray, size: int) -> jnp.ndarray:
    """Static center crop (transforms.CenterCrop)."""
    h, w = img.shape[0], img.shape[1]
    top = (h - size) // 2
    left = (w - size) // 2
    return jax.lax.dynamic_slice(img, (top, left, 0), (size, size, img.shape[-1]))


def sample_crop_offsets(key: jax.Array, max_off: int):
    """(top, left) ~ U{0..max_off} for RandomCrop — split out so the Pallas
    crop-fused strong view draws bit-identical offsets to this XLA path."""
    ky, kx = jax.random.split(key)
    top = jax.random.randint(ky, (), 0, max_off + 1)
    left = jax.random.randint(kx, (), 0, max_off + 1)
    return top, left


def crop_at(padded: jnp.ndarray, size: int, top, left,
            max_off: int) -> jnp.ndarray:
    """``padded[top:top+size, left:left+size]`` for traced offsets, as two
    constant-shift roll passes + a static slice instead of a per-sample
    dynamic_slice (which lowers to a scalar-core gather under vmap on
    TPU)."""
    ph = padded.shape[0]
    shifted = _shift_rows(padded, jnp.full((ph,), left, jnp.int32), max_off)
    shifted = _shift_cols(shifted, jnp.full((ph,), top, jnp.int32), max_off)
    return shifted[:size, :size, :]


def random_crop_reflect(img: jnp.ndarray, size: int, padding: int,
                        key: jax.Array) -> jnp.ndarray:
    """transforms.RandomCrop(size, padding, padding_mode='reflect')
    (dataset.py:35-37)."""
    padded = jnp.pad(img, ((padding, padding), (padding, padding), (0, 0)),
                     mode="reflect")
    max_off = padded.shape[0] - size
    top, left = sample_crop_offsets(key, max_off)
    return crop_at(padded, size, top, left, max_off)


def hflip(img: jnp.ndarray) -> jnp.ndarray:
    return img[:, ::-1, :]


def vflip(img: jnp.ndarray) -> jnp.ndarray:
    return img[::-1, :, :]


# ---------------------------------------------------------------------------
# color ops (PIL ImageEnhance / ImageOps semantics)
# ---------------------------------------------------------------------------

# numpy on purpose: a jnp.array at module scope would initialize the jax
# backend at import time, before consumers can pick a platform
_L_WEIGHTS = np.array([0.299, 0.587, 0.114], dtype=np.float32)


def _luminance(img: jnp.ndarray) -> jnp.ndarray:
    """PIL 'L' conversion: L = R*299/1000 + G*587/1000 + B*114/1000."""
    return jnp.tensordot(img, jnp.asarray(_L_WEIGHTS, img.dtype),
                         axes=([-1], [0]))


def _blend(degenerate: jnp.ndarray, img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    factor = jnp.asarray(factor, img.dtype)
    return jnp.clip(degenerate + factor * (img - degenerate), 0.0, 255.0)


def brightness(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    """ImageEnhance.Brightness: blend with black."""
    return _blend(jnp.zeros_like(img), img, factor)


def color(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    """ImageEnhance.Color: blend with grayscale(L)."""
    deg = _luminance(img)[..., None] * jnp.ones_like(img)
    return _blend(deg, img, factor)


def contrast(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    """ImageEnhance.Contrast: blend with solid gray = round(mean(L))."""
    mean = jnp.floor(jnp.mean(_luminance(img).astype(jnp.float32)) + 0.5)
    return _blend(jnp.full_like(img, mean), img, factor)


def sharpness(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    """ImageEnhance.Sharpness: blend with SMOOTH-filtered image; PIL leaves
    the 1px border unfiltered."""
    kernel = (jnp.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]])
              / 13.0).astype(img.dtype)
    # depthwise 3x3 via conv over HWC -> NHWC
    x = img[None]
    k = jnp.tile(kernel[:, :, None, None], (1, 1, 1, img.shape[-1]))
    smoothed = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=img.shape[-1])[0]
    smoothed = jnp.clip(smoothed, 0.0, 255.0)
    h, w = img.shape[0], img.shape[1]
    yg = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xg = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border = (yg == 0) | (yg == h - 1) | (xg == 0) | (xg == w - 1)
    smoothed = jnp.where(border[..., None], img, smoothed)
    return _blend(smoothed, img, factor)


def posterize(img: jnp.ndarray, bits: jnp.ndarray) -> jnp.ndarray:
    """ImageOps.posterize: keep top ``bits`` bits per channel."""
    shift = jnp.asarray(8 - jnp.asarray(bits), jnp.int32)
    q = img.astype(jnp.int32)
    out = jnp.left_shift(jnp.right_shift(q, shift), shift)
    return out.astype(img.dtype)


def solarize(img: jnp.ndarray, threshold: jnp.ndarray) -> jnp.ndarray:
    """ImageOps.solarize: invert pixels >= threshold."""
    threshold = jnp.asarray(threshold, img.dtype)
    return jnp.where(img >= threshold, jnp.asarray(255.0, img.dtype) - img, img)


def solarize_add(img: jnp.ndarray, addition: jnp.ndarray,
                 threshold: float = 128.0) -> jnp.ndarray:
    """randaugment.py:111-120: add then solarize at fixed threshold."""
    added = jnp.clip(img + addition, 0.0, 255.0)
    return solarize(added, threshold)


def invert(img: jnp.ndarray) -> jnp.ndarray:
    return 255.0 - img


def autocontrast(img: jnp.ndarray) -> jnp.ndarray:
    """ImageOps.autocontrast(cutoff=0): per-channel rescale min→0, max→255."""
    lo = jnp.min(img, axis=(0, 1), keepdims=True)
    hi = jnp.max(img, axis=(0, 1), keepdims=True)
    scale = jnp.asarray(255.0, img.dtype) / jnp.maximum(hi - lo, jnp.asarray(1e-6, img.dtype))
    out = jnp.clip((img - lo) * scale, 0.0, 255.0)
    return jnp.where(hi > lo, out, img)


def equalize(img: jnp.ndarray) -> jnp.ndarray:
    """ImageOps.equalize: per-channel PIL histogram equalization.

    PIL's LUT: step = (npix - count(last nonzero bin)) // 255;
    lut[i] = (step // 2 + cumsum(hist)[:i]) // step; identity if step == 0.

    TPU note: the per-channel histogram is ONE fused broadcast-compare
    reduction — pixels vs all 256 bins, summed over the pixel axis. XLA fuses
    the compare into the reduce (the (N, c, 256) bool tensor is never
    materialized), running at VPU speed (~0.1ms/224-image batch). Scatter-add
    histograms serialize on TPU (~170ms) and lax.scan chunking adds ~6ms of
    sequential-step overhead per chunk — both measured catastrophically
    slower.
    """
    h, w, c = img.shape
    n = h * w
    q = jnp.clip(jnp.round(img), 0, 255).astype(jnp.int32).reshape(n, c)

    bins = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 256), 2)
    hist = jnp.sum(q[:, :, None] == bins, axis=0, dtype=jnp.int32)  # (c, 256)
    hist = hist.T  # (256, c)

    nonzero = hist > 0
    last_idx = 255 - jnp.argmax(nonzero[::-1, :], axis=0)  # (c,)
    last_count = jnp.take_along_axis(hist, last_idx[None, :], axis=0)[0]
    step = (n - last_count) // 255  # (c,)
    cdf = jnp.concatenate(
        [jnp.zeros((1, c), jnp.int32), jnp.cumsum(hist, axis=0)[:-1]], axis=0)
    ramp = jax.lax.broadcasted_iota(jnp.int32, (256, c), 0)
    lut = jnp.where(step[None, :] > 0,
                    (step[None, :] // 2 + cdf) // jnp.maximum(step[None, :], 1),
                    ramp)
    lut = jnp.clip(lut, 0, 255)
    use_identity = (jnp.sum(nonzero, axis=0) <= 1) | (step == 0)  # (c,)

    # LUT application WITHOUT a per-pixel gather (TPU gathers run on the
    # scalar core, ~150ms for this shape): lut[q] = lut[0] + sum_{i>=1}
    # (lut[i]-lut[i-1]) * [q >= i] — another fused compare-reduce.
    delta = (lut[1:] - lut[:-1]).T  # (c, 255)
    base = lut[0]  # (c,)
    edges = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 255), 2) + 1
    ge = (q[:, :, None] >= edges).astype(jnp.int32)  # (N, c, 255), fused
    out = base[None, :] + jnp.sum(ge * delta[None, :, :], axis=-1)
    out = jnp.where(use_identity[None, :], q, out)
    return out.reshape(h, w, c).astype(img.dtype)


def cutout_abs(img: jnp.ndarray, size: jnp.ndarray, key: jax.Array,
               fill: float = 127.0) -> jnp.ndarray:
    """CutoutAbs (randaugment.py:47-60): gray rectangle of side ~size at a
    uniform center, clipped to the image."""
    h, w = img.shape[0], img.shape[1]
    kx, ky = jax.random.split(key)
    x0f = jax.random.uniform(kx, (), minval=0.0, maxval=w)
    y0f = jax.random.uniform(ky, (), minval=0.0, maxval=h)
    x0 = jnp.maximum(0.0, x0f - size / 2.0).astype(jnp.int32)
    y0 = jnp.maximum(0.0, y0f - size / 2.0).astype(jnp.int32)
    x1 = jnp.minimum(w, x0 + size).astype(jnp.int32)
    y1 = jnp.minimum(h, y0 + size).astype(jnp.int32)
    yg = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xg = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    # PIL ImageDraw.rectangle fills inclusive corners
    mask = (yg >= y0) & (yg <= y1) & (xg >= x0) & (xg <= x1)
    return jnp.where(mask[..., None], jnp.asarray(fill, img.dtype), img)


def grayscale(img: jnp.ndarray) -> jnp.ndarray:
    """transforms.RandomGrayscale degenerate: L replicated to 3 channels."""
    return _luminance(img)[..., None] * jnp.ones_like(img)


# ---------------------------------------------------------------------------
# HSV for torchvision ColorJitter hue
# ---------------------------------------------------------------------------


def adjust_hue(img: jnp.ndarray, hue_factor: jnp.ndarray) -> jnp.ndarray:
    """torchvision adjust_hue: shift hue by hue_factor (in turns, |f|<=0.5)."""
    x = img / 255.0
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    d = maxc - minc
    s = jnp.where(maxc > 0, d / jnp.maximum(maxc, 1e-8), 0.0)
    dn = jnp.maximum(d, 1e-8)
    rc = (maxc - r) / dn
    gc = (maxc - g) / dn
    bc = (maxc - b) / dn
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(d == 0, 0.0, h)

    h = (h + hue_factor) % 1.0

    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    out = jnp.clip(jnp.stack([r2, g2, b2], axis=-1) * 255.0, 0.0, 255.0)
    return out.astype(img.dtype)
