"""Pytree helpers."""

from __future__ import annotations

import jax
import numpy as np


def count_parameters(params) -> int:
    """Total number of parameter scalars in a pytree (reference: utils.py:154-155)."""
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(params)))
