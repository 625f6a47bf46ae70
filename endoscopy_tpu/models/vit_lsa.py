"""ViT for small datasets: Locality Self-Attention + Shifted Patch
Tokenization (reference: models/vit_lsa.py:37-144).

- LSA (vit_lsa.py:37-69): scaled dot-product attention with a *learnable*
  log-temperature (initialized to log(d^-0.5)) and the diagonal masked out so
  tokens cannot attend to themselves.
- SPT (vit_lsa.py:86-101): the patch projection sees the image concatenated
  with its four 1px diagonal shifts (5*C channels per patch).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class LSA(nn.Module):
    dim: int
    heads: int = 8
    dim_head: int = 64
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, n, _ = x.shape
        inner = self.heads * self.dim_head
        temperature = self.param(
            "temperature",
            lambda key: jnp.asarray(np.log(self.dim_head ** -0.5), jnp.float32),
        )
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, self.dim_head).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        dots = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * jnp.exp(temperature)
        eye = jnp.eye(n, dtype=bool)
        dots = jnp.where(eye, jnp.finfo(jnp.float32).min, dots)
        attn = jax.nn.softmax(dots, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class SPT(nn.Module):
    """Shifted Patch Tokenization (vit_lsa.py:86-101)."""

    dim: int
    patch_size: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C); shifts are 1px pads in the four diagonal directions
        def shift(dx, dy):
            return jnp.pad(x, ((0, 0), (max(dy, 0), max(-dy, 0)),
                               (max(dx, 0), max(-dx, 0)), (0, 0)))[
                :, max(-dy, 0):x.shape[1] + max(-dy, 0),
                max(-dx, 0):x.shape[2] + max(-dx, 0), :]

        cat = jnp.concatenate(
            [x, shift(1, 0), shift(-1, 0), shift(0, 1), shift(0, -1)], axis=-1)
        p = self.patch_size
        b, h, w, c = cat.shape
        cat = cat.reshape(b, h // p, p, w // p, p, c)
        cat = cat.transpose(0, 1, 3, 2, 4, 5).reshape(b, (h // p) * (w // p),
                                                      p * p * c)
        cat = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(cat)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(cat.astype(self.dtype))


class ViTLSA(nn.Module):
    """ViT with SPT + LSA producing pooled features (vit_lsa.py:103-144)."""

    image_size: int = 224
    patch_size: int = 16
    dim: int = 384
    depth: int = 8
    heads: int = 8
    dim_head: int = 64
    mlp_dim: int = 1536
    pool: str = "cls"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        x = SPT(self.dim, self.patch_size, dtype=self.dtype,
                name="to_patch_embedding")(x.astype(self.dtype))
        n = x.shape[1]
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, n + 1, self.dim), jnp.float32)
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.dim), jnp.float32)
        x = jnp.concatenate([jnp.tile(cls, (b, 1, 1)).astype(self.dtype), x],
                            axis=1)
        x = x + pos[:, : n + 1].astype(self.dtype)

        for i in range(self.depth):
            y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             name=f"norm1_{i}")(x)
            x = x + LSA(self.dim, self.heads, self.dim_head, dtype=self.dtype,
                        name=f"attn_{i}")(y.astype(self.dtype))
            y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             name=f"norm2_{i}")(x)
            y = nn.Dense(self.mlp_dim, dtype=self.dtype, name=f"mlp1_{i}")(
                y.astype(self.dtype))
            y = nn.gelu(y, approximate=False)
            x = x + nn.Dense(self.dim, dtype=self.dtype, name=f"mlp2_{i}")(y)

        if self.pool == "mean":
            out = jnp.mean(x, axis=1)
        else:
            out = x[:, 0]
        return out.astype(jnp.float32)


def vit_lsa_small(dtype=jnp.bfloat16) -> ViTLSA:
    return ViTLSA(dim=384, depth=8, heads=8, mlp_dim=1536, dtype=dtype)
