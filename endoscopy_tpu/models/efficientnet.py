"""EfficientNet in flax.linen (reference uses timm efficientnet_b1 for the
abnormal classifier and full-supervised runs, configs/kaggle_supervised_abnorm
.yaml MODEL.NAME, build.py:172-220 timm fallback).

MBConv: 1x1 expand → depthwise kxk → SE(0.25 of input channels) → 1x1
project, SiLU activations, residual when stride 1 and channels match.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# (expand_ratio, channels, repeats, stride, kernel) — EfficientNet-B0 base
_B0_STAGES: Tuple[Tuple[int, int, int, int, int], ...] = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)


def _round_channels(c: float, divisor: int = 8) -> int:
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return new_c


class MBConv(nn.Module):
    out_channels: int
    expand_ratio: int
    strides: int
    kernel: int
    se_ratio: float = 0.25
    norm: Any = None
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        mid = in_ch * self.expand_ratio
        residual = x
        y = x
        if self.expand_ratio != 1:
            y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(y)
            y = self.norm(name="expand_bn")(y)
            y = nn.silu(y)
        pad = self.kernel // 2
        y = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    padding=[(pad, pad), (pad, pad)], feature_group_count=mid,
                    use_bias=False, dtype=self.dtype, name="dw_conv")(y)
        y = self.norm(name="dw_bn")(y)
        y = nn.silu(y)
        # squeeze-excite on input-channel budget (timm convention)
        se_ch = max(1, int(in_ch * self.se_ratio))
        s = jnp.mean(y, axis=(1, 2), keepdims=True)
        s = nn.Conv(se_ch, (1, 1), dtype=self.dtype, name="se_reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(mid, (1, 1), dtype=self.dtype, name="se_expand")(s)
        y = y * nn.sigmoid(s)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="project_conv")(y)
        y = self.norm(name="project_bn")(y)
        if self.strides == 1 and in_ch == self.out_channels:
            y = y + residual
        return y


class EfficientNet(nn.Module):
    width_mult: float = 1.0
    depth_mult: float = 1.0
    dtype: Any = jnp.bfloat16
    stages: Tuple[Tuple[int, int, int, int, int], ...] = _B0_STAGES
    stem_channels: int = 32
    head_channels: int = 1280

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-3, dtype=self.dtype)
        x = x.astype(self.dtype)
        stem = _round_channels(self.stem_channels * self.width_mult)
        x = nn.Conv(stem, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = norm(name="stem_bn")(x)
        x = nn.silu(x)

        for si, (expand, channels, repeats, stride, kernel) in enumerate(self.stages):
            out_ch = _round_channels(channels * self.width_mult)
            reps = int(math.ceil(repeats * self.depth_mult))
            for ri in range(reps):
                x = MBConv(out_ch, expand, stride if ri == 0 else 1, kernel,
                           norm=norm, dtype=self.dtype,
                           name=f"stage{si + 1}_block{ri + 1}")(x)

        head = _round_channels(self.head_channels * self.width_mult)
        x = nn.Conv(head, (1, 1), use_bias=False, dtype=self.dtype,
                    name="head_conv")(x)
        x = norm(name="head_bn")(x)
        x = nn.silu(x)
        x = jnp.mean(x, axis=(1, 2))
        return x.astype(jnp.float32)


def efficientnet_b0(dtype=jnp.bfloat16) -> EfficientNet:
    return EfficientNet(width_mult=1.0, depth_mult=1.0, dtype=dtype)


def efficientnet_b1(dtype=jnp.bfloat16) -> EfficientNet:
    return EfficientNet(width_mult=1.0, depth_mult=1.1, dtype=dtype)
