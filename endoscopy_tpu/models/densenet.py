"""DenseNet in flax.linen (reference uses timm densenet161, build.py:172-220;
the 'classifier' attribute naming drives freeze/transfer branches, e.g.
fixmatch.py:45-48).

TPU notes: dense blocks concatenate along the channel (last, lane) axis —
cheap on NHWC layouts; all convs are bias-free with BN, bf16 compute / f32
stats. Produces pooled (B, num_features) features; heads live in heads.py.

DenseNet-161: growth_rate 48, blocks (6, 12, 36, 24), init 96 → 2208 features.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4
    norm: Any = None
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = self.norm(name="norm1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(y)
        y = self.norm(name="norm2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.growth_rate, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class Transition(nn.Module):
    out_channels: int
    norm: Any = None
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = self.norm(name="norm")(x)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv")(y)
        return nn.avg_pool(y, (2, 2), strides=(2, 2))


class DenseNet(nn.Module):
    growth_rate: int = 48
    block_config: Sequence[int] = (6, 12, 36, 24)
    num_init_features: int = 96
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        x = x.astype(self.dtype)
        x = nn.Conv(self.num_init_features, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False, dtype=self.dtype,
                    name="conv0")(x)
        x = norm(name="norm0")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        features = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            for j in range(num_layers):
                x = DenseLayer(self.growth_rate, norm=norm, dtype=self.dtype,
                               name=f"block{i + 1}_layer{j + 1}")(x)
            features += num_layers * self.growth_rate
            if i != len(self.block_config) - 1:
                features //= 2
                x = Transition(features, norm=norm, dtype=self.dtype,
                               name=f"transition{i + 1}")(x)

        x = norm(name="norm_final")(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return x.astype(jnp.float32)


def densenet161(dtype=jnp.bfloat16) -> DenseNet:
    return DenseNet(growth_rate=48, block_config=(6, 12, 36, 24),
                    num_init_features=96, dtype=dtype)


def densenet121(dtype=jnp.bfloat16) -> DenseNet:
    return DenseNet(growth_rate=32, block_config=(6, 12, 24, 16),
                    num_init_features=64, dtype=dtype)
