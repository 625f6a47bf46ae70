"""Conformer: dual-branch CNN + Vision Transformer (SemiFormer backbone).

TPU-first flax re-design of the reference architecture
(models/conformer.py:306-445): a ResNet-style conv stem feeds both a
bottleneck CNN trunk and a ViT trunk; at every stage an FCUDown module
projects CNN features into the token sequence and an FCUUp module projects
tokens back onto the feature map (models/conformer.py:143-189,250-303). Dual
classifier heads return ``(conv_cls, trans_cls)``
(models/conformer.py:418-444) — the contract the SemiFormer trainer relies
on (semiformer.py:72-133).

Layout/dtype: NHWC, bf16 compute, f32 norms. Attention is plain dot-product
over ≤197 tokens — XLA maps the (B, heads, N, N) batch of small matmuls onto
the MXU directly; no flash/blocked attention is needed at this sequence
length. Nearest-neighbor FCUUp upsampling is an einops-style repeat (fuses
into the following conv).

Default config = Conformer-Ti: patch 16, channel_ratio 1, embed 384,
depth 12, heads 6, mlp_ratio 4, qkv_bias True (build.py:95-102).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, n, _ = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, h, d)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * (head_dim ** -0.5)
        attn = nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class TransBlock(nn.Module):
    """Pre-norm ViT block (models/conformer.py:40-72)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        x = x + Attention(self.dim, self.num_heads, self.qkv_bias,
                          dtype=self.dtype, name="attn")(y.astype(self.dtype))
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim,
                    dtype=self.dtype, name="mlp")(y.astype(self.dtype))
        return x


class ConvBlock(nn.Module):
    """Bottleneck 1x1→3x3→1x1 with optional residual conv and an optional
    token injection before the 3x3 (models/conformer.py:74-139)."""

    outplanes: int
    strides: int = 1
    res_conv: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, x_t: Optional[jnp.ndarray] = None,
                 return_x2: bool = True, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-6, dtype=self.dtype)
        med = self.outplanes // 4
        residual = x
        y = nn.Conv(med, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        if x_t is not None:
            y = y + x_t
        y = nn.Conv(med, (3, 3), strides=(self.strides, self.strides),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = norm(name="bn2")(y)
        x2 = nn.relu(y)
        y = nn.Conv(self.outplanes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(x2)
        y = norm(name="bn3")(y)
        if self.res_conv:
            residual = nn.Conv(self.outplanes, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype,
                               name="residual_conv")(x)
            residual = norm(name="residual_bn")(residual)
        out = nn.relu(y + residual)
        if return_x2:
            return out, x2
        return out


class FCUDown(nn.Module):
    """CNN feature map → tokens: 1x1 conv, avgpool(dw), LN, GELU, prepend the
    running cls token (models/conformer.py:143-167)."""

    embed_dim: int
    dw_stride: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, x_t):
        y = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name="conv_project")(x)
        y = nn.avg_pool(y, (self.dw_stride, self.dw_stride),
                        strides=(self.dw_stride, self.dw_stride))
        b, h, w, c = y.shape
        y = y.reshape(b, h * w, c)
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="ln")(y)
        y = nn.gelu(y.astype(self.dtype), approximate=False)
        return jnp.concatenate([x_t[:, :1], y], axis=1)


class FCUUp(nn.Module):
    """Tokens → CNN feature map: drop cls, reshape, 1x1 conv, BN, ReLU,
    nearest upsample ×dw (models/conformer.py:170-189)."""

    outplanes: int
    up_stride: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x_t, h: int, w: int, train: bool = False):
        b = x_t.shape[0]
        y = x_t[:, 1:].reshape(b, h, w, x_t.shape[-1]).astype(self.dtype)
        y = nn.Conv(self.outplanes, (1, 1), dtype=self.dtype, name="conv_project")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-6, dtype=self.dtype, name="bn")(y)
        y = nn.relu(y)
        y = jnp.repeat(jnp.repeat(y, self.up_stride, axis=1), self.up_stride, axis=2)
        return y


class ConvTransBlock(nn.Module):
    """One coupled stage (models/conformer.py:250-303)."""

    outplanes: int
    res_conv: bool
    strides: int
    dw_stride: int
    embed_dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    last_fusion: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, x_t, train: bool = False):
        x, x2 = ConvBlock(self.outplanes, self.strides, self.res_conv,
                          dtype=self.dtype, name="cnn_block")(
                              x, return_x2=True, train=train)
        h, w = x2.shape[1], x2.shape[2]
        x_st = FCUDown(self.embed_dim, self.dw_stride, dtype=self.dtype,
                       name="squeeze_block")(x2, x_t)
        x_t = TransBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                         self.qkv_bias, dtype=self.dtype, name="trans_block")(
                             x_st + x_t)
        x_t_r = FCUUp(self.outplanes // 4, self.dw_stride, dtype=self.dtype,
                      name="expand_block")(x_t, h // self.dw_stride,
                                           w // self.dw_stride, train=train)
        fusion_strides = 2 if self.last_fusion else 1
        x = ConvBlock(self.outplanes, fusion_strides,
                      res_conv=self.last_fusion, dtype=self.dtype,
                      name="fusion_block")(x, x_t=x_t_r, return_x2=False,
                                           train=train)
        return x, x_t


class Conformer(nn.Module):
    """Dual-head Conformer returning (conv_cls, trans_cls)."""

    num_classes: int = 1000
    patch_size: int = 16
    base_channel: int = 64
    channel_ratio: int = 1
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        assert self.depth % 3 == 0
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-6, dtype=self.dtype)
        b = x.shape[0]
        x = x.astype(self.dtype)

        cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02),
            (1, 1, self.embed_dim), jnp.float32)
        cls_tokens = jnp.tile(cls_token, (b, 1, 1)).astype(self.dtype)

        # stem: 7x7/2 conv → BN → ReLU → 3x3/2 maxpool
        x_base = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                         use_bias=False, dtype=self.dtype, name="conv1")(x)
        x_base = norm(name="bn1")(x_base)
        x_base = nn.relu(x_base)
        x_base = nn.max_pool(x_base, (3, 3), strides=(2, 2),
                             padding=[(1, 1), (1, 1)])

        stage_1 = self.base_channel * self.channel_ratio
        trans_dw_stride = self.patch_size // 4

        # stage 1: independent conv block + patch projection + first ViT block
        xc = ConvBlock(stage_1, 1, res_conv=True, dtype=self.dtype,
                       name="conv_1")(x_base, return_x2=False, train=train)
        xt = nn.Conv(self.embed_dim, (trans_dw_stride, trans_dw_stride),
                     strides=(trans_dw_stride, trans_dw_stride), padding="VALID",
                     dtype=self.dtype, name="trans_patch_conv")(x_base)
        xt = xt.reshape(b, -1, self.embed_dim)
        xt = jnp.concatenate([cls_tokens, xt], axis=1)
        xt = TransBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                        self.qkv_bias, dtype=self.dtype, name="trans_1")(xt)

        # stage boundaries (conformer.py:341-389): conv_trans_2..d/3 continue
        # stage 1; d/3+1..2d/3 are stage 2 (first block downsamples);
        # 2d/3+1..d are stage 3; the final block adds the fusion downsample.
        third = self.depth // 3
        stage_2, stage_3 = stage_1 * 2, stage_1 * 4
        for i in range(2, self.depth + 1):
            if i <= third:  # stage 1 continuation
                planes, strides, res_conv, dw = stage_1, 1, False, trans_dw_stride
            elif i <= 2 * third:  # stage 2
                first = i == third + 1
                planes, strides, res_conv = stage_2, (2 if first else 1), first
                dw = trans_dw_stride // 2
            else:  # stage 3
                first = i == 2 * third + 1
                planes, strides, res_conv = stage_3, (2 if first else 1), first
                dw = trans_dw_stride // 4
            xc, xt = ConvTransBlock(
                planes, res_conv, strides, dw, self.embed_dim, self.num_heads,
                self.mlp_ratio, self.qkv_bias, last_fusion=(i == self.depth),
                dtype=self.dtype, name=f"conv_trans_{i}")(xc, xt, train=train)

        conv_cls = nn.Dense(self.num_classes, dtype=jnp.float32,
                            name="conv_cls_head")(
                                jnp.mean(xc, axis=(1, 2)).astype(jnp.float32))
        xt = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="trans_norm")(xt)
        trans_cls = nn.Dense(self.num_classes, dtype=jnp.float32,
                             name="trans_cls_head")(
                                 xt[:, 0].astype(jnp.float32))
        return conv_cls, trans_cls


def conformer_tiny(num_classes: int = 1000, dtype=jnp.bfloat16) -> Conformer:
    """Conformer-Ti (build.py:95-102)."""
    return Conformer(num_classes=num_classes, patch_size=16, channel_ratio=1,
                     embed_dim=384, depth=12, num_heads=6, mlp_ratio=4.0,
                     qkv_bias=True, dtype=dtype)
