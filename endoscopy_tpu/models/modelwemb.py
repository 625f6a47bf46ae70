"""Backbone + classifier + L2-normalized projection head.

Re-design of ``ModelwEmb`` (custom_model.py:147-213): the model CoMatch,
triplet, and EZBM training rely on. ``__call__`` returns
``(logits, fts, fts_low)`` — pooled backbone features, classifier logits from
the 'complex' MLP head, and a k=3-widened 2-layer projection to ``low_dim``
with LeakyReLU(0.1) and L2 normalization (custom_model.py:201-205).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from endoscopy_tpu.models.heads import MLPHead


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 0.0) -> jnp.ndarray:
    """Power-2 Normalize module semantics (custom_model.py:136-145)."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)
    return x / norm


class ProjectionHead(nn.Module):
    """head_emb: Dense(low_dim*k) → LeakyReLU(0.1) → Dense(low_dim) → L2-norm
    (custom_model.py:201-205, k=3)."""

    low_dim: int = 128
    k: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.low_dim * self.k, dtype=self.dtype, name="proj1")(x)
        x = nn.leaky_relu(x, negative_slope=0.1)
        x = nn.Dense(self.low_dim, dtype=self.dtype, name="proj2")(x)
        return l2_normalize(x, axis=-1)


class ModelwEmb(nn.Module):
    """(logits, fts, fts_low) contract of custom_model.py:207-213."""

    backbone: nn.Module
    num_classes: int
    low_dim: int = 128

    def setup(self) -> None:
        self.fc = MLPHead(out_features=self.num_classes, name="fc")
        self.head_emb = ProjectionHead(low_dim=self.low_dim, name="head_emb")

    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        fts = self.backbone(x, train=train)
        logits = self.fc(fts, train=train)
        fts_low = self.head_emb(fts)
        return logits, fts, fts_low

    def features(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.backbone(x, train=train)

    def classify_features(self, fts: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """fc head on cached penultimate features — the EZBM stage-2 path
        (ezbm.py:163-164 uses model.fc(inputs))."""
        return self.fc(fts, train=train)
