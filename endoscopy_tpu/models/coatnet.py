"""CoAtNet: MBConv + relative-attention hybrid (reference:
models/coat_net.py:60-247; commented out of the builder at build.py:83-90 but
part of the zoo).

Stages s0..s4 with block types C-C-T-T after the conv stem: MBConv stages use
pre-BN expansion-4 inverted bottlenecks with SE; Transformer stages use
attention with a (2H-1)(2W-1) relative-position-bias table; every stage's
first block downsamples 2x (MaxPool+proj on the residual for MBConv,
pooled q/kv for attention).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _rel_index(hh: int, ww: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(hh), np.arange(ww), indexing="ij"))
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel[0] += hh - 1
    rel[1] += ww - 1
    return (rel[0] * (2 * ww - 1) + rel[1]).astype(np.int32)


class MBConvBlock(nn.Module):
    out_ch: int
    downsample: bool = False
    expansion: int = 4
    norm: Any = None
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expansion
        stride = 2 if self.downsample else 1

        y = self.norm(name="pre_bn")(x)  # PreNorm(BatchNorm2d)
        y = nn.Conv(hidden, (1, 1), strides=(stride, stride), use_bias=False,
                    dtype=self.dtype, name="pw")(y)
        y = self.norm(name="bn1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Conv(hidden, (3, 3), padding=[(1, 1), (1, 1)],
                    feature_group_count=hidden, use_bias=False,
                    dtype=self.dtype, name="dw")(y)
        y = self.norm(name="bn2")(y)
        y = nn.gelu(y, approximate=False)
        # SE with reduction relative to the INPUT channels (coat_net.py:92)
        se_ch = max(1, in_ch // 4)
        s = jnp.mean(y, axis=(1, 2))
        s = nn.Dense(se_ch, use_bias=False, dtype=self.dtype, name="se_fc1")(s)
        s = nn.gelu(s, approximate=False)
        s = nn.Dense(hidden, use_bias=False, dtype=self.dtype, name="se_fc2")(s)
        y = y * nn.sigmoid(s)[:, None, None, :]
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pw_linear")(y)
        y = self.norm(name="bn3")(y)

        if self.downsample:
            res = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
            res = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                          dtype=self.dtype, name="proj")(res)
            return res + y
        return x + y


class RelAttention(nn.Module):
    out_ch: int
    resolution: Tuple[int, int]
    heads: int = 8
    dim_head: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # x: (B, N, C) tokens
        b, n, c = x.shape
        hh, ww = self.resolution
        inner = self.heads * self.dim_head
        table = self.param("relative_bias_table", nn.initializers.zeros,
                           ((2 * hh - 1) * (2 * ww - 1), self.heads), jnp.float32)
        idx = jnp.asarray(_rel_index(hh, ww))
        bias = table[idx.reshape(-1)].reshape(n, n, self.heads).transpose(2, 0, 1)

        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, self.dim_head).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * (self.dim_head ** -0.5)
        attn = attn + bias[None]
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(self.out_ch, dtype=self.dtype, name="to_out")(out)


class TransformerBlock(nn.Module):
    out_ch: int
    resolution: Tuple[int, int]
    downsample: bool = False
    heads: int = 8
    dim_head: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        # reference quirk (coat_net.py:168): the FF hidden width is
        # int(inp*4) from the STAGE INPUT channels, not the block's output —
        # downsample blocks (inp != oup) get inp*4, not oup*4
        ff_hidden = c * 4
        if self.downsample:
            x1 = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
            x2 = x1
            h, w = x1.shape[1], x1.shape[2]
            res = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                          dtype=self.dtype, name="proj")(x1)
        else:
            x1 = x
            res = x

        tokens = x1.reshape(b, h * w, x1.shape[-1])
        tokens = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="attn_norm")(tokens)
        att = RelAttention(self.out_ch, (h, w), self.heads, self.dim_head,
                           dtype=self.dtype, name="attn")(tokens.astype(self.dtype))
        x = res + att.reshape(b, h, w, self.out_ch)

        y = x.reshape(b, h * w, self.out_ch)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ff_norm")(y)
        y = nn.Dense(ff_hidden, dtype=self.dtype, name="ff1")(y.astype(self.dtype))
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.out_ch, dtype=self.dtype, name="ff2")(y)
        return x + y.reshape(b, h, w, self.out_ch)


class CoAtNet(nn.Module):
    """CoAtNet-0-like hybrid producing pooled features (coat_net.py:201-247;
    classifier heads attach via heads.py)."""

    num_blocks: Sequence[int] = (2, 2, 3, 5, 2)
    channels: Sequence[int] = (64, 96, 192, 384, 768)
    block_types: Sequence[str] = ("C", "C", "T", "T")
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        x = x.astype(self.dtype)

        # s0: conv stem, first block strides 2 (conv_3x3_bn)
        for i in range(self.num_blocks[0]):
            s = 2 if i == 0 else 1
            x = nn.Conv(self.channels[0], (3, 3), strides=(s, s),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=self.dtype, name=f"s0_conv{i}")(x)
            x = norm(name=f"s0_bn{i}")(x)
            x = nn.gelu(x, approximate=False)

        for stage in range(4):
            btype = self.block_types[stage]
            ch = self.channels[stage + 1]
            for i in range(self.num_blocks[stage + 1]):
                down = i == 0
                if btype == "C":
                    x = MBConvBlock(ch, downsample=down, norm=norm,
                                    dtype=self.dtype,
                                    name=f"s{stage + 1}_block{i}")(x)
                else:
                    res = (x.shape[1] // (2 if down else 1),
                           x.shape[2] // (2 if down else 1))
                    x = TransformerBlock(ch, res, downsample=down,
                                         dtype=self.dtype,
                                         name=f"s{stage + 1}_block{i}")(x)

        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)


def coatnet_0(dtype=jnp.bfloat16) -> CoAtNet:
    return CoAtNet(dtype=dtype)
