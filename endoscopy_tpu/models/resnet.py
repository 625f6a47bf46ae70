"""ResNet / SE-ResNet / SE-ResNeXt backbones in flax.linen, TPU-first.

Functional re-design of the reference's torchvision-style SE models
(models/se.py:8-314) and the timm resnet50 default (build.py:180-194):

- NHWC layout, bfloat16 compute / float32 params & BN stats (MXU-friendly).
- BatchNorm statistics are computed over the *global* sharded batch because
  the train step is jitted over the device mesh — XLA inserts the cross-chip
  reductions (no per-replica drift, unlike torch DataParallel).
- Returns pooled features; classification heads live in heads.py so the
  ModelwEmb / margin / transfer-surgery wrappers can share backbones.

SE block: GAP → 1x1 down(reduction 16) → ReLU → 1x1 up → sigmoid gate
(se.py:46-55, 121-141).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


class SEModule(nn.Module):
    """Squeeze-and-Excitation channel gate (se.py:46-55)."""

    channels: int
    reduction: int = 16
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, H, W, C)
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.channels // self.reduction, (1, 1), dtype=self.dtype,
                    name="fc_down")(s)
        s = nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fc_up")(s)
        return x * nn.sigmoid(s)


class Bottleneck(nn.Module):
    """ResNet-v1 bottleneck, optional SE gate and grouped 3x3 (ResNeXt).

    Matches torch Bottleneck/BottleneckX semantics (se.py:8-58, 144-187):
    1x1 reduce → 3x3 (stride, groups) → 1x1 expand(x4) → [SE] → +identity.
    """

    filters: int
    strides: int = 1
    use_se: bool = False
    groups: int = 1
    base_width: int = 64
    norm: ModuleDef = nn.BatchNorm
    dtype: Any = jnp.bfloat16
    expansion: int = 4
    # attention variants (reference zoo): gate applied after conv3/bn3 like
    # SE (cbam.py:150-170, sa.py:80-124); 'sasa' replaces the 3x3 conv
    # (sasa.py:160-220)
    attn: Optional[str] = None  # None | 'cbam' | 'sa'
    spatial_sasa: bool = False
    # the reference's ResNetSASA bottleneck (sasa.py:178-200) puts the stage
    # stride on the 1x1 conv1 for EVERY block of that variant (v1-style), so
    # the SASA layer always runs at the already-strided resolution
    stride_on_conv1: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        width = int(self.filters * (self.base_width / 64.0)) * self.groups
        out_ch = self.filters * self.expansion
        residual = x
        # A SASA block has no strided conv2 to carry the stage stride, so it
        # must stride on conv1 even when the caller didn't opt into the
        # v1-style net-wide placement (sasa.py:178-200) — otherwise the
        # residual add would see mismatched spatial dims.
        stride_first = self.stride_on_conv1 or self.spatial_sasa
        s1 = self.strides if stride_first else 1
        s2 = 1 if stride_first else self.strides

        y = nn.Conv(width, (1, 1), strides=(s1, s1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        if self.spatial_sasa:
            from endoscopy_tpu.models.attention import SASALayer
            # named 'conv2' to mirror the reference (sasa.py:193-196) so
            # torch checkpoints import with no extra key rules
            y = SASALayer(width, dtype=self.dtype, name="conv2")(y)
        else:
            y = nn.Conv(width, (3, 3), strides=(s2, s2),
                        padding=[(1, 1), (1, 1)], feature_group_count=self.groups,
                        use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = self.norm(name="bn3")(y)

        if self.use_se:
            y = SEModule(out_ch, dtype=self.dtype, name="se")(y)
        elif self.attn == "cbam":
            from endoscopy_tpu.models.attention import CBAM
            y = CBAM(out_ch, norm=self.norm, dtype=self.dtype, name="cbam")(y)
        elif self.attn == "sa":
            from endoscopy_tpu.models.attention import ShuffleAttention
            # reference uses 64 groups on >=256-channel stages (sa.py:22);
            # clamp for narrow test models
            y = ShuffleAttention(out_ch, groups=min(64, out_ch // 4),
                                 dtype=self.dtype, name="sa")(y)

        if residual.shape[-1] != out_ch or self.strides != 1:
            residual = nn.Conv(out_ch, (1, 1), strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = self.norm(name="downsample_bn")(residual)

        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet backbone producing pooled (B, C) features.

    stage_sizes [3,4,6,3] = ResNet-50; use_se=True = SEResNet (se.py:61-118);
    groups=32, base_width=4 = SEResNeXt-50 32x4d (se.py:190-254).
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    num_filters: int = 64
    use_se: bool = False
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.bfloat16
    attn: Optional[str] = None       # 'cbam' | 'sa' gate per block
    sasa_stages: Sequence[int] = ()  # stage indices whose 3x3 becomes SASA
    # jax.checkpoint each bottleneck: save only block boundaries, recompute
    # the inner conv/BN activations in the backward pass. Trades ~1 extra
    # forward of FLOPs for lower activation residency — a memory knob, not a
    # bandwidth one (measured neutral-to-slower at 112px/B=480 where HBM
    # traffic, not capacity, binds; see PERF.md). Off by default.
    remat: bool = False

    num_features: int = 2048  # informational; 512 * expansion

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # BN compute follows the model dtype (flax computes the batch
        # statistics in f32 internally regardless); bf16 BN removes the
        # f32<->bf16 round-trips between convs: -20% step time measured
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        x = x.astype(self.dtype)
        x = nn.Conv(self.num_filters, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        block_cls = nn.remat(Bottleneck) if self.remat else Bottleneck
        # the SASA variant strides on conv1 net-wide (sasa.py:178-200)
        stride_on_conv1 = bool(self.sasa_stages)
        for stage, num_blocks in enumerate(self.stage_sizes):
            for block in range(num_blocks):
                strides = 2 if (stage > 0 and block == 0) else 1
                x = block_cls(
                    filters=self.num_filters * (2 ** stage),
                    strides=strides,
                    use_se=self.use_se,
                    groups=self.groups,
                    base_width=self.base_width,
                    norm=norm,
                    dtype=self.dtype,
                    attn=self.attn,
                    spatial_sasa=stage in self.sasa_stages,
                    stride_on_conv1=stride_on_conv1,
                    name=f"layer{stage + 1}_{block}",
                )(x)

        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 2048)
        return x.astype(jnp.float32)


def resnet50(dtype=jnp.bfloat16, remat=False) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), dtype=dtype, remat=remat)


def resnet101(dtype=jnp.bfloat16) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3), dtype=dtype)


def resnet50se(dtype=jnp.bfloat16) -> ResNet:
    """SEResNet-50 (se.py:257-268)."""
    return ResNet(stage_sizes=(3, 4, 6, 3), use_se=True, dtype=dtype)


def resnet101se(dtype=jnp.bfloat16) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3), use_se=True, dtype=dtype)


def resnet152se(dtype=jnp.bfloat16) -> ResNet:
    return ResNet(stage_sizes=(3, 8, 36, 3), use_se=True, dtype=dtype)


def seresnext50(dtype=jnp.bfloat16) -> ResNet:
    """SEResNeXt-50 32x4d (se.py:286-297)."""
    return ResNet(stage_sizes=(3, 4, 6, 3), use_se=True, groups=32, base_width=4,
                  dtype=dtype)


def resnet50cbam(dtype=jnp.bfloat16) -> ResNet:
    """ResNet-50 with CBAM gates in every bottleneck (cbam.py:192-297)."""
    return ResNet(stage_sizes=(3, 4, 6, 3), attn="cbam", dtype=dtype)


def resnet50sa(dtype=jnp.bfloat16) -> ResNet:
    """ResNet-50 with shuffle-attention gates (sa.py:126-238)."""
    return ResNet(stage_sizes=(3, 4, 6, 3), attn="sa", dtype=dtype)


def resnet50sasa(dtype=jnp.bfloat16) -> ResNet:
    """ResNet-50 with stand-alone self-attention replacing the 3x3 convs in
    the last two stages (sasa.py:220-453; full-SASA stems are impractically
    slow in the reference too — it defaults attention to later stages)."""
    return ResNet(stage_sizes=(3, 4, 6, 3), sasa_stages=(2, 3), dtype=dtype)
