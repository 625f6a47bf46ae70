"""Classification heads (reference: custom_model.py:107-134).

``build_head`` mirrors the reference factory: a simple Dense, or the
"complex" MLP in→in/4 → ReLU → Dropout(0.2) → BatchNorm1d → out
(custom_model.py:110-116). ``ClassifierHead`` composes a backbone with a
head; ``bias=False`` heads support the margin losses (ModelMargin,
custom_model.py:122-134).

TPU note: the final Dense kernels are the natural tensor-parallel shard
targets (columns over the 'model' mesh axis) — see parallel/sharding.py.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp


class MLPHead(nn.Module):
    """'Complex' MLP head (custom_model.py:110-116)."""

    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_fts = x.shape[-1]
        x = nn.Dense(in_fts // 4, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        x = nn.Dense(self.out_features, dtype=self.dtype, name="fc2")(x)
        return x


class LinearHead(nn.Module):
    """Simple linear head (custom_model.py:117-119); bias=False for margin
    losses (custom_model.py:130)."""

    out_features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return nn.Dense(self.out_features, use_bias=self.use_bias,
                        dtype=self.dtype, name="fc")(x)


def build_head(out_features: int, is_complex: bool = False,
               use_bias: bool = True) -> nn.Module:
    """Factory matching custom_model.py:107-120."""
    if is_complex:
        return MLPHead(out_features=out_features)
    return LinearHead(out_features=out_features, use_bias=use_bias)


class ClassifierHead(nn.Module):
    """backbone → pooled features → head → logits.

    The default timm-fallback model of the reference (build.py:180-194):
    a backbone with its classifier replaced by ``build_head``.
    """

    backbone: nn.Module
    head: nn.Module

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        fts = self.backbone(x, train=train)
        return self.head(fts, train=train)

    def features(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Backbone features only — the margin-loss path
        (supervised.py:117-119 uses model.backbone(images))."""
        return self.backbone(x, train=train)
