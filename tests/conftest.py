"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding tests run on host-platform virtual devices
(SURVEY.md §4), so the whole suite is CPU-runnable without a TPU.

Note: the environment pre-imports jax via sitecustomize, so env-var routes
(JAX_PLATFORMS / XLA_FLAGS) are too late here; the runtime config knobs work
as long as no backend has been initialized yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
