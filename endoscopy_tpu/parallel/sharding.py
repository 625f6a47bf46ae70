"""Sharding rules for params and batches over the ('data','model') mesh.

Design (SURVEY.md §2.3): batch tensors are sharded over 'data' on their
leading axis; parameters are replicated except wide head/projection Dense
kernels, whose output columns shard over 'model' (tensor parallel). Because
train steps are plain ``jax.jit`` with these shardings, XLA inserts the
all-reduce for gradients and the all-gather for TP activations automatically
— the TPU-native equivalent of the NCCL machinery the reference never had.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Dense kernels whose *output* dimension is sharded over the model axis.
# Matches the classifier fc and projection-head layers (heads.py,
# modelwemb.py) when their names appear in the param path.
_TP_OUT_KEYS = ("fc1", "proj1")
# Dense kernels whose *input* dimension is sharded (second layer of 2-layer
# MLPs, consuming a TP-sharded activation).
_TP_IN_KEYS = ("fc2", "proj2")


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for any batch tensor."""
    return NamedSharding(mesh, P("data"))


def _spec_for_path(path: tuple, leaf) -> P:
    names = [getattr(k, "key", str(k)) for k in path]
    if leaf.ndim >= 2:
        if any(n in _TP_OUT_KEYS for n in names) and leaf.shape[-1] > 1:
            return P(*([None] * (leaf.ndim - 1) + ["model"]))
        if any(n in _TP_IN_KEYS for n in names) and leaf.shape[0] > 1:
            return P(*(["model"] + [None] * (leaf.ndim - 1)))
    return P()


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding pytree for a param/variable pytree: TP columns on the
    head MLPs, everything else replicated."""
    def to_sharding(path, leaf):
        return NamedSharding(mesh, _spec_for_path(path, leaf))
    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch with leading-axis data sharding."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
