"""Swin Transformer in flax.linen.

TPU-first re-design of the reference's in-repo MSR copy
(models/swin_transformer.py:66-590; the default config path loads the same
architecture from timm, build.py:44-67): hierarchical windowed attention with
relative position bias (swin_transformer.py:66-162), shifted windows with the
precomputed attention mask (swin_transformer.py:164-290), patch merging
(swin_transformer.py:292), patch embedding (swin_transformer.py:411).

TPU notes: window partitioning is pure reshape/transpose (free under XLA);
the shift is ``jnp.roll`` (lane rotation); the (nW, ws², ws²) attention mask
and relative-position-bias gathers are constants folded at compile time. All
matmuls are bf16 on the MXU with f32 accumulation; LayerNorms are f32.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) → (B*nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(x: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """(B*nW, ws*ws, C) → (B, H, W, C)."""
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


def relative_position_index(ws: int) -> np.ndarray:
    """(ws², ws²) index into the (2ws-1)² bias table
    (swin_transformer.py:86-96)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[:, :, 0] * (2 * ws - 1) + rel[:, :, 1]).astype(np.int32)


def shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(nW, ws², ws²) additive mask for shifted windows
    (swin_transformer.py:210-230)."""
    img_mask = np.zeros((h, w), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[hs, wsl] = cnt
            cnt += 1
    # pure-numpy window partition: this runs at trace time and must stay a
    # compile-time constant even under eval_shape/jit tracing
    mw = img_mask.reshape(h // ws, ws, w // ws, ws)
    mw = mw.transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    attn_mask = mw[:, None, :] - mw[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (B*nW, N, C), N = ws²
        bnw, n, c = x.shape
        hd = self.dim // self.num_heads
        ws = self.window_size

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, self.num_heads), jnp.float32)
        rel_idx = jnp.asarray(relative_position_index(ws))
        rel_bias = bias_table[rel_idx.reshape(-1)].reshape(n, n, self.num_heads)
        rel_bias = rel_bias.transpose(2, 0, 1)  # (heads, N, N)

        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(bnw, n, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (bnw, heads, N, hd)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * (hd ** -0.5)
        attn = attn + rel_bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(bnw, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(bnw, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    input_resolution: Tuple[int, int]
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h, w = self.input_resolution
        ws, shift = self.window_size, self.shift_size
        if min(h, w) <= ws:
            ws, shift = min(h, w), 0  # swin_transformer.py:181-184
        b, l, c = x.shape

        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        y = y.reshape(b, h, w, c).astype(self.dtype)
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        windows = window_partition(y, ws)
        mask = (jnp.asarray(shift_attn_mask(h, w, ws, shift))
                if shift > 0 else None)
        attn = WindowAttention(self.dim, self.num_heads, ws,
                               dtype=self.dtype, name="attn")(windows, mask)
        y = window_reverse(attn, ws, h, w)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = shortcut + y.reshape(b, l, c)

        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y.astype(self.dtype))
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    """2x2 neighborhood concat + norm + linear halve (swin_transformer.py:292)."""

    input_resolution: Tuple[int, int]
    dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h, w = self.input_resolution
        b, l, c = x.shape
        x = x.reshape(b, h, w, c)
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = x.reshape(b, -1, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                        name="reduction")(x.astype(self.dtype))


class SwinTransformer(nn.Module):
    """Hierarchical Swin producing pooled features
    (swin_transformer.py:459-590)."""

    img_size: int = 224
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        x = x.astype(self.dtype)
        # patch embed (swin_transformer.py:411)
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        h, w = x.shape[1], x.shape[2]
        x = x.reshape(b, h * w, self.embed_dim)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="patch_norm")(x)
        x = x.astype(self.dtype)

        dim = self.embed_dim
        for stage, depth in enumerate(self.depths):
            for blk in range(depth):
                x = SwinBlock(
                    dim=dim, num_heads=self.num_heads[stage],
                    input_resolution=(h, w), window_size=self.window_size,
                    shift_size=0 if blk % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                    name=f"stage{stage}_block{blk}")(x)
            if stage < len(self.depths) - 1:
                x = PatchMerging((h, w), dim, dtype=self.dtype,
                                 name=f"merge{stage}")(x)
                h, w = h // 2, w // 2
                dim *= 2

        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        return jnp.mean(x, axis=1).astype(jnp.float32)


def swin_tiny(dtype=jnp.bfloat16) -> SwinTransformer:
    """swin_tiny_patch4_window7_224 (the timm name the reference uses,
    e.g. custom_model.py:83)."""
    return SwinTransformer(embed_dim=96, depths=(2, 2, 6, 2),
                           num_heads=(3, 6, 12, 24), dtype=dtype)


def swin_small(dtype=jnp.bfloat16) -> SwinTransformer:
    return SwinTransformer(embed_dim=96, depths=(2, 2, 18, 2),
                           num_heads=(3, 6, 12, 24), dtype=dtype)
