"""SwinMLP: Swin topology with a per-head spatial MLP replacing attention.

Reference: models/swin_mlp.py:66-183 (block), 348-471 (model); offered via
timm in the builder (build.py:64-67). The torch version implements the
multi-head spatial MLP as a grouped 1x1 Conv1d over ``heads*ws²`` channels —
here it is a per-head (ws², ws²) dense mixing einsum, which XLA maps straight
onto the MXU (same math, no grouped-conv gymnastics). Shifted blocks use
zero-padding (P_l = ws - shift, P_r = shift) rather than cyclic roll —
faithful to the reference (swin_mlp.py:99-101,124-127,150-155).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from endoscopy_tpu.models.swin import PatchMerging, window_partition, window_reverse


class SpatialMLP(nn.Module):
    """Per-head ws²→ws² token mixing (grouped Conv1d equivalent)."""

    num_heads: int
    window_tokens: int  # ws²
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # x: (B*nW, N, C) with N = ws²
        bnw, n, c = x.shape
        hd = c // self.num_heads
        w = self.param("weight", nn.initializers.lecun_normal(),
                       (self.num_heads, n, n), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.num_heads, n), jnp.float32)
        xh = x.reshape(bnw, n, self.num_heads, hd)
        out = jnp.einsum("bnhd,hmn->bmhd", xh, w.astype(self.dtype),
                         preferred_element_type=jnp.float32)
        out = out + b.T[None, :, :, None]
        return out.astype(self.dtype).reshape(bnw, n, c)


class SwinMLPBlock(nn.Module):
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
            ws, shift = min(h, w), 0
        b, l, c = x.shape

        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        y = y.reshape(b, h, w, c).astype(self.dtype)
        if shift > 0:
            # zero-pad shift (swin_mlp.py:99-101, 124-127)
            p_l, p_r = ws - shift, shift
            y = jnp.pad(y, ((0, 0), (p_l, p_r), (p_l, p_r), (0, 0)))
        hp, wp = y.shape[1], y.shape[2]
        windows = window_partition(y, ws)
        mixed = SpatialMLP(self.num_heads, ws * ws, dtype=self.dtype,
                           name="spatial_mlp")(windows)
        y = window_reverse(mixed, ws, hp, wp)
        if shift > 0:
            y = y[:, ws - shift:hp - shift, ws - shift:wp - shift, :]
        x = shortcut + y.reshape(b, l, c)

        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y.astype(self.dtype))
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class SwinMLP(nn.Module):
    """SwinMLP backbone producing pooled features (swin_mlp.py:348-471)."""

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
                x = SwinMLPBlock(
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


def swin_mlp_tiny(dtype=jnp.bfloat16) -> SwinMLP:
    return SwinMLP(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
                   dtype=dtype)
