"""Device mesh construction (no reference counterpart — SURVEY.md §2.3).

The reference is single-device (learn.py:35-38); scaling here is expressed as
a 2-D ``jax.sharding.Mesh``:

- axis 'data': batch (data-parallel) — gradient/BN reductions ride ICI as
  XLA-inserted all-reduces.
- axis 'model': tensor-parallel width for the wide classifier/projection
  heads (vision backbones at ≤224px rarely need more; pipeline/sequence/
  expert parallelism have no counterpart in this workload, SURVEY.md §5).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh.

    data=-1 consumes all remaining devices after the model axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model < 1 or n % model:
        raise ValueError(f"model axis {model} does not divide {n} devices")
    if data == -1:
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} > {n} devices")
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def mesh_from_config(config) -> Mesh:
    return make_mesh(data=int(config.TRAIN.get("MESH_DATA", -1)),
                     model=int(config.TRAIN.get("MESH_MODEL", 1)))
