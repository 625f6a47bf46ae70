"""Mesh and sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from endoscopy_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_batch,
)


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data=3, model=3)


def test_batch_sharded_over_data_axis():
    mesh = make_mesh(data=8)
    x = np.zeros((16, 4), np.float32)
    sx = shard_batch(mesh, {"x": x})["x"]
    assert sx.sharding.spec == P("data")


def test_param_shardings_tp_columns():
    mesh = make_mesh(data=4, model=2)
    params = {
        "backbone": {"conv1": {"kernel": jnp.zeros((7, 7, 3, 64))}},
        "fc": {"fc1": {"kernel": jnp.zeros((512, 128)), "bias": jnp.zeros(128)},
               "fc2": {"kernel": jnp.zeros((128, 6)), "bias": jnp.zeros(6)}},
    }
    sh = param_shardings(mesh, params)
    assert sh["backbone"]["conv1"]["kernel"].spec == P()
    assert sh["fc"]["fc1"]["kernel"].spec == P(None, "model")
    assert sh["fc"]["fc2"]["kernel"].spec == P("model", None)
    assert sh["fc"]["fc1"]["bias"].spec == P()


def test_global_mean_under_jit_sharding():
    """jit over a sharded batch computes the global mean (BN-statistics
    correctness argument for the mesh design)."""
    mesh = make_mesh(data=8)
    x = np.arange(32, dtype=np.float32).reshape(32, 1)
    sx = shard_batch(mesh, x)
    out = jax.jit(lambda a: jnp.mean(a))(sx)
    assert float(out) == pytest.approx(x.mean())
