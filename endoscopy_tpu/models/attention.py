"""Attention gates and layers for the ResNet-variant zoo.

TPU-first re-implementations of the reference's attention modules:

- CBAM: channel gate (sigmoid of MLP(avg-pool)+MLP(max-pool), cbam.py:27-61)
  × spatial gate (7x7 conv+BN over [max_c, mean_c], cbam.py:73-83).
- Shuffle Attention (sa_layer, sa.py:14-67): grouped split into channel- and
  spatial-attention halves with GroupNorm, then channel shuffle.
- SASA (sasa.py:22-84): stand-alone local self-attention over k×k windows
  with factorized relative positional encodings. Window extraction uses
  ``lax.conv_general_dilated_patches`` (the XLA-native unfold) so the QK^T
  contraction maps onto the MXU. Two reference quirks are replicated
  bit-faithfully (verified by tests/test_torch_parity.py):
  (a) the positional-encoding einsum 'bhxydz,cij->bhxyij' reduces q over
  depth and the encoding over channels; (b) the head split is a raw
  row-major reshape (sasa.py:57-65) that interleaves depth with spatial
  axes whenever depth-per-head > 1 — the torch code reshapes
  (B,C,H,W,ks,ks) → (B,heads,H,W,dh,ks²) without a transpose.
- HaloAttention (halo.py:75-165): blocked local attention where keys/values
  come from halo-extended blocks, with factorized relative position
  embeddings. The reference's padding mask (halo.py:142-148) has inverted
  polarity — ``masked_fill_(mask, -max)`` fills the VALID positions, so
  attention lands only on the zero-padding keys; this module implements the
  intended semantics (padding keys masked out). The parity test compares
  against the polarity-corrected oracle and pins the deviation.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class CBAM(nn.Module):
    """Channel + spatial gates (cbam.py:85-100)."""

    channels: int
    reduction: int = 16
    norm: Any = None
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # channel gate: shared MLP over avg and max pooled vectors
        avg = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        mlp_in = nn.Dense(self.channels // self.reduction, dtype=self.dtype,
                          name="mlp_fc1")
        mlp_out = nn.Dense(self.channels, dtype=self.dtype, name="mlp_fc2")
        att = mlp_out(nn.relu(mlp_in(avg))) + mlp_out(nn.relu(mlp_in(mx)))
        x = x * nn.sigmoid(att)[:, None, None, :]

        # spatial gate: 7x7 conv + BN over [max_c, mean_c]
        pooled = jnp.stack([jnp.max(x, axis=-1), jnp.mean(x, axis=-1)], axis=-1)
        s = nn.Conv(1, (7, 7), padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, name="spatial_conv")(pooled)
        s = self.norm(name="spatial_bn")(s)
        return x * nn.sigmoid(s)


class ShuffleAttention(nn.Module):
    """sa_layer (sa.py:14-67): grouped channel/spatial attention + shuffle."""

    channels: int
    groups: int = 64
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        half = c // (2 * self.groups)
        cweight = self.param("cweight", nn.initializers.zeros, (half,), jnp.float32)
        cbias = self.param("cbias", nn.initializers.ones, (half,), jnp.float32)
        sweight = self.param("sweight", nn.initializers.zeros, (half,), jnp.float32)
        sbias = self.param("sbias", nn.initializers.ones, (half,), jnp.float32)

        xg = x.reshape(b, h, w, self.groups, 2 * half)
        x0, x1 = xg[..., :half], xg[..., half:]

        # channel attention on x0
        xn = jnp.mean(x0, axis=(1, 2), keepdims=True)
        xn = cweight * xn + cbias
        x0 = x0 * nn.sigmoid(xn)

        # spatial attention on x1: the reference's nn.GroupNorm(half, half)
        # on (b*groups, half, h, w) puts one channel per norm group, i.e.
        # per-(sample, group, channel) statistics over (h, w) — expressed
        # here as a real flax GroupNorm child ("gn") so torch checkpoints
        # import structurally (sa.py:31,57)
        x1g = x1.transpose(0, 3, 1, 2, 4).reshape(b * self.groups, h, w, half)
        xs = nn.GroupNorm(num_groups=half, epsilon=1e-5, dtype=jnp.float32,
                          name="gn")(x1g)
        xs = xs.reshape(b, self.groups, h, w, half).transpose(0, 2, 3, 1, 4)
        xs = sweight * xs + sbias
        x1 = x1 * nn.sigmoid(xs)

        out = jnp.concatenate([x0, x1], axis=-1).reshape(b, h, w, c)
        # channel shuffle with 2 groups (sa.py:34-43)
        out = out.reshape(b, h, w, 2, c // 2).swapaxes(3, 4).reshape(b, h, w, c)
        return out


class SASALayer(nn.Module):
    """Stand-alone local self-attention (sasa.py:22-84)."""

    channels: int
    kernel_size: int = 7
    num_heads: int = 8
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ks = min(self.kernel_size, h, w)
        dh = c // self.num_heads
        pad_lo = (ks - 1) // 2
        pad_hi = (ks - 1) - pad_lo

        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q_conv")(x)
        padded = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi), (0, 0)))
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k_conv")(padded)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v_conv")(padded)

        def unfold(t):
            # torch-logical-order patches: (B, C, H, W, ks, ks) (sasa.py:57-58)
            p = jax.lax.conv_general_dilated_patches(
                t.transpose(0, 3, 1, 2), (ks, ks), (1, 1), "VALID")
            # p: (B, C*ks*ks, H, W) with channel-major [c, ki, kj]
            p = p.reshape(b, c, ks, ks, h, w)
            return p.transpose(0, 1, 4, 5, 2, 3)

        # reference quirk (sasa.py:57-65): the head split is a raw row-major
        # reshape of the (B,C,H,W,ks,ks)/(B,C,H,W) layouts — for dh > 1 it
        # interleaves depth with spatial axes; jnp.reshape (also row-major)
        # reproduces it exactly
        ku = unfold(k).reshape(b, self.num_heads, h, w, dh, ks * ks)
        vu = unfold(v).reshape(b, self.num_heads, h, w, dh, ks * ks)
        qh = q.transpose(0, 3, 1, 2).reshape(b, self.num_heads, h, w, dh)

        qk = jnp.einsum("bhxyd,bhxydk->bhxyk", qh, ku,
                        preferred_element_type=jnp.float32)

        rel_h = self.param("rel_encoding_h", nn.initializers.normal(1.0),
                           (dh * self.num_heads // 2, ks, 1), jnp.float32)
        rel_w = self.param("rel_encoding_w", nn.initializers.normal(1.0),
                           (dh * self.num_heads // 2, 1, ks), jnp.float32)
        # reference quirk (sasa.py:70-73): q summed over depth × encoding
        # summed over channels, broadcast over the window
        q_sum = jnp.sum(qh.astype(jnp.float32), axis=-1)  # (b, heads, x, y)
        qr_h = q_sum[..., None, None] * jnp.sum(rel_h, axis=0)  # (...,ks,1)
        qr_w = q_sum[..., None, None] * jnp.sum(rel_w, axis=0)  # (...,1,ks)
        qk = qk.reshape(b, self.num_heads, h, w, ks, ks) + qr_h + qr_w
        qk = qk.reshape(b, self.num_heads, h, w, ks * ks)

        weights = jax.nn.softmax(qk, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhxyk,bhxydk->bhxyd", weights, vu,
                         preferred_element_type=jnp.float32)
        # torch reshapes (B,heads,H,W,1,dvh) back to (B,C,H,W) raw
        # (sasa.py:82-83) — same row-major reinterpretation, then to NHWC
        return out.reshape(b, c, h, w).transpose(0, 2, 3, 1).astype(self.dtype)


class HaloAttention(nn.Module):
    """Blocked local attention with halo exchange (halo.py:75-165).

    Queries come from non-overlapping b×b blocks; keys/values from the
    (b+2*halo)² halo-extended neighborhoods; factorized relative position
    embedding added to the logits.
    """

    dim: int
    block_size: int = 8
    halo_size: int = 4
    dim_head: int = 64
    heads: int = 8
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        blk, halo = self.block_size, self.halo_size
        inner = self.dim_head * self.heads
        win = blk + 2 * halo

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv_in = jnp.pad(x, ((0, 0), (halo, halo), (halo, halo), (0, 0)))
        kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype,
                      name="to_kv")(kv_in)

        nb_h, nb_w = h // blk, w // blk
        # query blocks: (B, nb, blk², inner)
        qb = q.reshape(b, nb_h, blk, nb_w, blk, inner).transpose(0, 1, 3, 2, 4, 5)
        qb = qb.reshape(b, nb_h * nb_w, blk * blk, inner)

        # halo'd kv windows via strided patch extraction
        kvp = jax.lax.conv_general_dilated_patches(
            kv.transpose(0, 3, 1, 2), (win, win), (blk, blk), "VALID")
        kvp = kvp.reshape(b, inner * 2, win * win, nb_h * nb_w)
        kvp = kvp.transpose(0, 3, 2, 1)  # (B, nb, win², 2*inner)
        kb, vb = kvp[..., :inner], kvp[..., inner:]

        def heads_split(t, n):
            return t.reshape(b, t.shape[1], n, self.heads, self.dim_head
                             ).transpose(0, 3, 1, 2, 4)

        qh = heads_split(qb, blk * blk) * (self.dim_head ** -0.5)
        kh = heads_split(kb, win * win)
        vh = heads_split(vb, win * win)

        logits = jnp.einsum("bhnqd,bhnkd->bhnqk", qh, kh,
                            preferred_element_type=jnp.float32)

        # factorized relative position embedding (halo.py:46-73): the torch
        # tables are (2*win-1, d) and the rel_to_abs gather reads entry
        # i-x+win-1 — logits[q=(x,y), k=(i,j)] += q·rel_h[i-x+win-1]
        # + q·rel_w[j-y+win-1]; only the top win+blk-1 rows are reachable
        rel_h = self.param("rel_height", nn.initializers.normal(0.02),
                           (2 * win - 1, self.dim_head), jnp.float32)
        rel_w = self.param("rel_width", nn.initializers.normal(0.02),
                           (2 * win - 1, self.dim_head), jnp.float32)

        n_blocks = nb_h * nb_w
        qr = qh.reshape(b, self.heads, n_blocks, blk, blk, self.dim_head)
        rel_idx = (jax.lax.broadcasted_iota(jnp.int32, (blk, win), 1)
                   - jax.lax.broadcasted_iota(jnp.int32, (blk, win), 0)
                   + win - 1)  # (blk, win): relative offset per (query, key)

        # row index varies with x (axis 3)
        lh = jnp.take_along_axis(
            jnp.einsum("bhnxyd,rd->bhnxyr", qr, rel_h.astype(qr.dtype),
                       preferred_element_type=jnp.float32),
            jnp.broadcast_to(rel_idx[None, None, None, :, None, :],
                             (b, self.heads, n_blocks, blk, blk, win)),
            axis=-1)  # (b,h,n,x,y,i)
        lw = jnp.take_along_axis(
            jnp.einsum("bhnxyd,rd->bhnxyr", qr, rel_w.astype(qr.dtype),
                       preferred_element_type=jnp.float32),
            jnp.broadcast_to(rel_idx[None, None, None, None, :, :],
                             (b, self.heads, n_blocks, blk, blk, win)),
            axis=-1)  # (b,h,n,x,y,j)

        att = logits.reshape(b, self.heads, n_blocks, blk, blk, win, win)
        att = att + lh[..., :, None] + lw[..., None, :]
        att = att.reshape(b, self.heads, n_blocks, blk * blk, win * win)

        # mask out the zero-padding keys of edge blocks. NOTE: the reference
        # (halo.py:142-148) fills the VALID positions instead — an inverted
        # mask polarity; this is the intended semantics (see module doc).
        key_r = (jax.lax.broadcasted_iota(jnp.int32, (nb_h, win), 0) * blk
                 + jax.lax.broadcasted_iota(jnp.int32, (nb_h, win), 1) - halo)
        key_c = (jax.lax.broadcasted_iota(jnp.int32, (nb_w, win), 0) * blk
                 + jax.lax.broadcasted_iota(jnp.int32, (nb_w, win), 1) - halo)
        row_ok = (key_r >= 0) & (key_r < h)            # (nb_h, win)
        col_ok = (key_c >= 0) & (key_c < w)            # (nb_w, win)
        valid = (row_ok[:, None, :, None] & col_ok[None, :, None, :])
        valid = valid.reshape(1, 1, n_blocks, 1, win * win)
        att = jnp.where(valid, att, jnp.finfo(jnp.float32).min)

        weights = jax.nn.softmax(att, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnqk,bhnkd->bhnqd", weights, vh,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 3, 1, 4).reshape(b, nb_h, nb_w, blk, blk, inner)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, inner)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
