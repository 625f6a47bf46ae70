"""Pallas TPU kernel: per-sample-dispatch RandAugmentMC.

Why a kernel: under XLA's vmap-of-switch, EVERY branch of the 14-op pool
executes on the WHOLE batch per op slot (selection happens after the work).
A Pallas grid program runs one image at a time with *scalar* control flow
(`pl.when` lowers to real branches on the TPU scalar core), so each image
executes ONLY its sampled op — the expected work per slot drops from 14 ops
to ~0.5 (apply-probability x one op).

Layout: planar (B, 3, H, W) float32 blocks — channel planes make luminance /
per-channel ops vectorize over (H, W) tiles, and row shifts become VMEM
dynamic slices on the minor axis of a zero-padded scratch plane. Geometry
(rotate/shear/translate) = rows-shift ∘ transpose ∘ rows-shift ∘ transpose ∘
rows-shift (Paeth), executed only for geometric ops. Equalize builds its
CDF/LUT with scalar loops over 256 bins (compare-reduce per bin — no
scatter, no gather), identical math to aug/ops.py equalize.

Sampled parameters come from aug.randaugment.sample_slot_params (shared with
the XLA path) so both implementations are testable against each other.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from endoscopy_tpu.aug.ops import pil_fix_coeffs
from endoscopy_tpu.aug.randaugment import sample_slot_params

# Crop-fusion row addressing is the bit-decomposed sublane-rotation path
# only. The round-4 candidate that replaced the row rotations with one
# dynamic-sublane-offset VMEM load (pl.ds on the second-to-last axis) was
# REMOVED after root-causing its Mosaic failure on the real toolchain:
# "cannot statically prove that index in dimension 2 is a multiple of 8" —
# dynamic sublane starts must be provably 8-aligned (the per-sample crop
# top is arbitrary), and the align-down-then-residual-roll workaround
# degenerates into this roll path. Diagnostic preserved in
# perf_runs/2026-08-19_pallas_smoke.log; tools/pallas_compile_smoke.py +
# the slow-tier TPU smoke test keep every shipped config compile-verified.


def _pad_for(size: int) -> int:
    """Max |row shift| any op can produce: shear/translate <= 0.27*size+1."""
    return int(0.3 * size) + 2

_OP_ROTATE, _OP_SHEAR_X, _OP_SHEAR_Y = 7, 9, 10
_OP_TRANSLATE_X, _OP_TRANSLATE_Y = 12, 13


def _row_shift(src, shifts, h: int, w: int, PAD: int):
    """out[y, x] = src[y, x + shifts[y]] with zero fill.

    TPU lanes cannot be dynamically sliced at arbitrary offsets (Mosaic
    requires 128-aligned dynamic lane indices), so the per-row shift is a
    BIT-DECOMPOSED sequence of static lane rotations: biased shift
    s' = s + PAD ∈ [0, 2*PAD]; for each bit k, rotate the whole plane by 2^k
    and select it into rows whose bit is set (rows are independent under
    axis-1 rolls, so the composition per row equals rotation by s'). One
    final static rotation removes the bias. ~log2(2*PAD)+1 vectorized passes.
    """
    sp = shifts + PAD  # (h, 1) in [0, 2*PAD]
    out = src
    nbits = max(int(2 * PAD).bit_length(), 1)
    for k in range(nbits):
        bit = (sp >> k) & 1
        rolled = pltpu.roll(out, (-(1 << k)) % w, axis=1)
        out = jnp.where(bit == 1, rolled, out)
    out = pltpu.roll(out, PAD % w, axis=1)  # undo the bias
    xg = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    valid = (xg + shifts >= 0) & (xg + shifts < w)
    return jnp.where(valid, out, jnp.zeros((h, w), src.dtype))


def _geometry(plane, op, v, sign, h: int, w: int, PAD: int):
    """Apply the sampled geometric op to one (h, w) plane (h == w)."""
    # magnitudes (randaugment.py:139-163)
    theta = jnp.deg2rad(sign * jnp.trunc(v * 30.0 / 10.0))
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    shear = sign * v * 0.3 / 10.0
    trans_x = jnp.trunc(sign * (v * 0.3 / 10.0) * w).astype(jnp.int32)
    trans_y = jnp.trunc(sign * (v * 0.3 / 10.0) * h).astype(jnp.int32)
    cy, cx = h / 2.0, w / 2.0

    is_rot = op == _OP_ROTATE

    yf = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0).astype(jnp.float32) + 0.5
    xf = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0).astype(jnp.float32) + 0.5

    # PIL 16.16 fixed-point shear; 2-D iota because Mosaic rejects 1-D
    yi = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
    xi = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    sa1, sa2 = pil_fix_coeffs(shear)

    rot1 = jnp.floor(a * (yf - cy) + 0.5).astype(jnp.int32)
    shx = (sa1 * yi + sa2) >> 16
    s1 = jnp.where(is_rot, rot1,
                   jnp.where(op == _OP_SHEAR_X, shx,
                             jnp.where(op == _OP_TRANSLATE_X,
                                       jnp.full((h, 1), trans_x), 0)))
    rot2 = jnp.floor(b * (xf - cx) + 0.5).astype(jnp.int32)
    shy = (sa1 * xi + sa2) >> 16
    s2 = jnp.where(is_rot, rot2,
                   jnp.where(op == _OP_SHEAR_Y, shy,
                             jnp.where(op == _OP_TRANSLATE_Y,
                                       jnp.full((w, 1), trans_y), 0)))
    s3 = jnp.where(is_rot, rot1, jnp.zeros((h, 1), jnp.int32))

    out = _row_shift(plane, s1, h, w, PAD)
    out = _row_shift(out.T, s2, w, h, PAD).T
    out = _row_shift(out, s3, h, w, PAD)
    return out


def _luminance(r, g, b):
    return 0.299 * r + 0.587 * g + 0.114 * b


def _equalize_plane(plane, h: int, w: int):
    """PIL equalize for one plane — scalar bin loops, no scatter/gather
    (same math as aug/ops.py equalize)."""
    n = h * w
    q = jnp.clip(jnp.round(plane), 0.0, 255.0)

    # last occupied bin + its count (max + count-of-max)
    last_val = jnp.max(q)
    last_count = jnp.sum((q == last_val).astype(jnp.int32))
    single_bin = jnp.min(q) == last_val
    step = (n - last_count) // 255
    identity = single_bin | (step == 0)
    stepf = jnp.maximum(step, 1).astype(jnp.float32)

    # out[p] = lut[q_p]; lut[i] = (step//2 + cdf_i) // step with
    # cdf_i = #pixels < i. Accumulate via out = lut0 + sum_i>0 (q>=i)*delta_i.
    def body(i, carry):
        out, prev_lut = carry
        fi = i.astype(jnp.float32)
        cdf_i = jnp.sum((q < fi).astype(jnp.float32))
        lut_i = jnp.clip(jnp.floor((jnp.floor(step.astype(jnp.float32) / 2.0)
                                    + cdf_i) / stepf), 0.0, 255.0)
        out = out + (q >= fi).astype(jnp.float32) * (lut_i - prev_lut)
        return out, lut_i

    lut0 = jnp.clip(jnp.floor(jnp.floor(step.astype(jnp.float32) / 2.0) / stepf),
                    0.0, 255.0)
    out0 = jnp.full((h, w), lut0, jnp.float32)
    out, _ = jax.lax.fori_loop(1, 256, body, (out0, lut0))
    return jnp.where(identity, q, out)


def _sharpness_plane(plane, factor, h: int, w: int):
    """PIL SMOOTH blend; the 1px border stays unfiltered (PIL semantics), so
    the smoothed field is computed on the interior via 9 static slices (no
    pad/gather needed)."""
    def sh(dy, dx):
        r = pltpu.roll(plane, (-dy) % h, axis=0) if dy else plane
        return pltpu.roll(r, (-dx) % w, axis=1) if dx else r

    smooth = (sh(-1, -1) + sh(-1, 0) + sh(-1, 1) + sh(0, -1)
              + 5.0 * sh(0, 0) + sh(0, 1) + sh(1, -1) + sh(1, 0)
              + sh(1, 1)) / 13.0
    smooth = jnp.clip(smooth, 0.0, 255.0)
    yg = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xg = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border = (yg == 0) | (yg == h - 1) | (xg == 0) | (xg == w - 1)
    smooth = jnp.where(border, plane, smooth)  # wrap rows masked out here
    return jnp.clip(smooth + factor * (plane - smooth), 0.0, 255.0)


def _kernel(pi_ref, pf_ref, img_ref, out_ref, buf, n_slots: int,
            h: int, w: int, PAD: int, hp: int | None = None,
            wp: int | None = None):
    """pi_ref (B, 2+n_slots*2[+2]) int32 SMEM: [cut_cx, cut_cy,
    (op, apply)*slots, [crop_top, crop_left]]
    pf_ref (B, n_slots*2) f32 SMEM: [(v, sign)*slots]
    img_ref: (1, 3, hp, wp) VMEM (hp=h, wp=w without crop fusion);
    out_ref: (1, 3, h, w); buf: (3, h, w).

    Crop fusion (hp > h): the FixMatch random crop is a per-sample dynamic
    window into the reflect-padded input. Doing it here costs VMEM
    addressing (a sublane dynamic slice for the row offset + a
    bit-decomposed lane rotation for the column offset) instead of the XLA
    path's ~13 HBM-bound roll passes over the padded image — measured
    13.5 ms -> ~0 extra ms for the 224-image 224px strong view.
    """
    i = pl.program_id(0)
    if hp is None or (hp == h and wp == w):
        buf[:, :, :] = img_ref[0].astype(jnp.float32)
    else:
        # out = padded[top:top+h, left:left+w]
        top = pi_ref[i, 2 + 2 * n_slots]
        left = pi_ref[i, 3 + 2 * n_slots]
        nb_c = max(int(wp - w).bit_length(), 1)
        # bit-decomposed VMEM rotations on both axes + a static slice.
        # Rotations run in f32 regardless of the block I/O dtype: Mosaic's
        # tpu.dynamic_rotate along sublanes is unimplemented for packed
        # 16-bit dtypes (bf16 leg died in tpu_compile_helper; see
        # perf_runs/2026-08-19_pallas_smoke.log), and the upcast happens
        # in VMEM after the (already halved) HBM read.
        nb_r = max(int(hp - h).bit_length(), 1)
        for c in range(3):
            x = img_ref[0, c].astype(jnp.float32)  # (hp, wp)
            for k in range(nb_r):
                bit = (top >> k) & 1
                x = jnp.where(bit == 1,
                              pltpu.roll(x, (-(1 << k)) % hp, axis=0), x)
            for k in range(nb_c):
                bit = (left >> k) & 1
                x = jnp.where(bit == 1,
                              pltpu.roll(x, (-(1 << k)) % wp, axis=1), x)
            buf[c] = x[:h, :w]

    for slot in range(n_slots):
        op = pi_ref[i, 2 + slot * 2]
        apply = pi_ref[i, 3 + slot * 2]
        v = pf_ref[i, slot * 2]
        sign = pf_ref[i, slot * 2 + 1]

        is_geo = ((op == _OP_ROTATE) | (op == _OP_SHEAR_X) | (op == _OP_SHEAR_Y)
                  | (op == _OP_TRANSLATE_X) | (op == _OP_TRANSLATE_Y))

        @pl.when((apply == 1) & is_geo)
        def _():
            for c in range(3):
                buf[c] = _geometry(buf[c], op, v, sign, h, w, PAD)

        factor = v * 0.9 / 10.0 + 0.05

        @pl.when((apply == 1) & (op == 0))  # autocontrast
        def _():
            for c in range(3):
                plane = buf[c]
                lo = jnp.min(plane)
                hi = jnp.max(plane)
                scale = 255.0 / jnp.maximum(hi - lo, 1e-6)
                out = jnp.clip((plane - lo) * scale, 0.0, 255.0)
                buf[c] = jnp.where(hi > lo, out, plane)

        @pl.when((apply == 1) & (op == 1))  # brightness
        def _():
            buf[:, :, :] = jnp.clip(buf[:, :, :] * factor, 0.0, 255.0)

        @pl.when((apply == 1) & ((op == 2) | (op == 3)))  # color / contrast
        def _():
            lum = _luminance(buf[0], buf[1], buf[2])
            # contrast degenerate: solid round(mean(L)); color: grayscale L
            mean = jnp.floor(jnp.sum(lum) / (h * w) + 0.5)
            deg = jnp.where(op == 2, lum, jnp.full((h, w), mean, jnp.float32))
            for c in range(3):
                buf[c] = jnp.clip(deg + factor * (buf[c] - deg), 0.0, 255.0)

        @pl.when((apply == 1) & (op == 4))  # equalize
        def _():
            for c in range(3):
                buf[c] = _equalize_plane(buf[c], h, w)

        @pl.when((apply == 1) & (op == 6))  # posterize
        def _():
            bits = jnp.trunc(v * 4.0 / 10.0) + 4.0
            keep = jnp.exp2(8.0 - bits)  # 2^(8-bits)
            buf[:, :, :] = jnp.floor(buf[:, :, :] / keep) * keep

        @pl.when((apply == 1) & (op == 8))  # sharpness
        def _():
            for c in range(3):
                buf[c] = _sharpness_plane(buf[c], factor, h, w)

        @pl.when((apply == 1) & (op == 11))  # solarize
        def _():
            threshold = 256.0 - (jnp.trunc(v * 256.0 / 10.0))
            x = buf[:, :, :]
            buf[:, :, :] = jnp.where(x >= threshold, 255.0 - x, x)

    # CutoutAbs(16) always (randaugment.py:221)
    cx = pi_ref[i, 0]
    cy = pi_ref[i, 1]
    x0 = jnp.maximum(0, cx - 8)
    y0 = jnp.maximum(0, cy - 8)
    x1 = jnp.minimum(w, x0 + 16)
    y1 = jnp.minimum(h, y0 + 16)
    yg = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xg = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    mask = (yg >= y0) & (yg <= y1) & (xg >= x0) & (xg <= x1)
    out_ref[0] = jnp.where(mask[None], 127.0,
                           buf[:, :, :]).astype(out_ref.dtype)


def sample_randaugment_params(key: jax.Array, batch: int, h: int, w: int,
                              n: int = 2, m: int = 10):
    """Per-sample (int_params, float_params) matching the XLA path's draws."""
    def one(k):
        ints = []
        floats = []
        for s in range(n):
            k_here = jax.random.fold_in(k, s)
            op, v, sign, apply = sample_slot_params(k_here, m)
            ints += [op, apply.astype(jnp.int32)]
            floats += [v, sign]
        k_cut = jax.random.fold_in(k, n)
        kx, ky = jax.random.split(k_cut)
        cx = jax.random.uniform(kx, (), minval=0.0, maxval=w).astype(jnp.int32)
        cy = jax.random.uniform(ky, (), minval=0.0, maxval=h).astype(jnp.int32)
        return (jnp.stack([cx, cy] + ints), jnp.stack(floats))

    keys = jax.random.split(key, batch)
    pi, pf = jax.vmap(one)(keys)
    return pi.astype(jnp.int32), pf.astype(jnp.float32)


def randaugment_mc_pallas(batch_nhwc: jnp.ndarray, key: jax.Array, n: int = 2,
                          interpret: bool = False, crop_offsets=None,
                          crop_size: int | None = None) -> jnp.ndarray:
    """Batch RandAugmentMC via the per-sample-dispatch kernel."""
    return _randaugment_mc_pallas(
        batch_nhwc, key, n=n, interpret=interpret, crop_offsets=crop_offsets,
        crop_size=crop_size)


@functools.partial(jax.jit,
                   static_argnames=("n", "interpret", "crop_size"))
def _randaugment_mc_pallas(batch_nhwc: jnp.ndarray, key: jax.Array, n: int = 2,
                           interpret: bool = False, crop_offsets=None,
                           crop_size: int | None = None) -> jnp.ndarray:
    """Kernel launch.

    batch_nhwc: (B, H, W, 3) float in [0,255]; returns same shape/dtype.
    Blocks stream to/from VMEM in the INPUT dtype (bf16 input halves the
    kernel's HBM traffic); per-plane compute is always f32 in scratch, so
    uint8-derived bf16 inputs (0..255 exact) produce bit-identical pixels
    to the f32-I/O path modulo the caller's final cast.

    Crop fusion: with ``crop_offsets=(tops, lefts)`` (two int32 (B,) arrays)
    and ``crop_size``, the input is a reflect-padded batch and each sample's
    ``crop_size``² window at (top, left) is sliced INSIDE the kernel before
    the ops run — the FixMatch strong view's RandomCrop for free
    (aug/views.py::fixmatch_views).
    """
    b, h, w, _ = batch_nhwc.shape
    assert h == w, "square images only (scratch sharing)"
    hp = wp = None
    if crop_offsets is not None:
        assert crop_size is not None and crop_size <= h
        hp, wp = h, w
        h = w = int(crop_size)
    PAD = _pad_for(max(h, w))
    pi, pf = sample_randaugment_params(key, b, h, w, n=n)
    if crop_offsets is not None:
        tops, lefts = crop_offsets
        pi = jnp.concatenate(
            [pi, tops.astype(jnp.int32)[:, None],
             lefts.astype(jnp.int32)[:, None]], axis=1)
    planar = batch_nhwc.transpose(0, 3, 1, 2)
    if not jnp.issubdtype(planar.dtype, jnp.floating):
        planar = planar.astype(jnp.float32)

    in_h, in_w = (hp, wp) if hp is not None else (h, w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 3, in_h, in_w), lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, h, w), lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, h, w), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n_slots=n, h=h, w=w, PAD=PAD,
                          hp=hp, wp=wp),
        out_shape=jax.ShapeDtypeStruct((b, 3, h, w), planar.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(pi, pf, planar)
    return out.transpose(0, 2, 3, 1).astype(batch_nhwc.dtype)
