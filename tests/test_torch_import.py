"""Torch checkpoint import: round-trip + head-surgery semantics
(build.py:113-131, 180-194)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from endoscopy_tpu.ckpt.torch_import import (
    export_resnet_torch_state,
    import_resnet_torch_state,
    load_torch_checkpoint,
)
from endoscopy_tpu.models.heads import ClassifierHead, build_head
from endoscopy_tpu.models.resnet import ResNet

STAGES = (1, 1, 1, 1)


@pytest.fixture(scope="module")
def model_vars():
    model = ClassifierHead(
        backbone=ResNet(stage_sizes=STAGES, num_filters=8, dtype=jnp.float32),
        head=build_head(6))
    x = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3))
    return model, model.init(jax.random.key(1), x, train=False)


def test_export_import_roundtrip(model_vars):
    model, variables = model_vars
    sd = export_resnet_torch_state(variables["params"],
                                   variables["batch_stats"],
                                   stage_sizes=STAGES)
    # torch-style conventions present
    assert "conv1.weight" in sd and sd["conv1.weight"].shape[0] == 8  # OIHW
    assert "layer1.0.bn1.running_mean" in sd

    # perturb target params, import back, expect exact recovery of backbone
    zeros = jax.tree.map(lambda x: np.zeros_like(x), variables["params"])
    zeros_bs = jax.tree.map(lambda x: np.zeros_like(x), variables["batch_stats"])
    new_p, new_bs, n = import_resnet_torch_state(zeros, zeros_bs, sd,
                                                 stage_sizes=STAGES)
    assert n > 0
    orig = jax.tree.leaves(variables["params"]["backbone"])
    back = jax.tree.leaves(new_p["backbone"])
    assert all(np.allclose(a, b) for a, b in zip(orig, back))
    orig_bs = jax.tree.leaves(variables["batch_stats"]["backbone"])
    back_bs = jax.tree.leaves(new_bs["backbone"])
    assert all(np.allclose(a, b) for a, b in zip(orig_bs, back_bs))


def test_head_surgery_keeps_fresh_head(model_vars):
    """A 2-class checkpoint's fc must NOT clobber the fresh 6-class head."""
    model, variables = model_vars
    sd = export_resnet_torch_state(variables["params"], variables["batch_stats"],
                                   stage_sizes=STAGES)
    sd["fc.weight"] = np.zeros((2, 256), np.float32)  # 2-class abnormal head
    sd["fc.bias"] = np.zeros((2,), np.float32)
    head_before = np.asarray(variables["params"]["head"]["fc"]["kernel"])
    new_p, _, _ = import_resnet_torch_state(
        jax.tree.map(np.asarray, variables["params"]),
        jax.tree.map(np.asarray, variables["batch_stats"]), sd,
        stage_sizes=STAGES)
    np.testing.assert_array_equal(np.asarray(new_p["head"]["fc"]["kernel"]),
                                  head_before)


def test_load_torch_pth(tmp_path, model_vars):
    import torch

    model, variables = model_vars
    sd = export_resnet_torch_state(variables["params"], variables["batch_stats"],
                                   stage_sizes=STAGES)
    path = str(tmp_path / "ckpt.pth")
    torch.save({"model_state_dict": {k: torch.from_numpy(np.asarray(v))
                                     for k, v in sd.items()},
                "epoch": 3}, path)
    loaded = load_torch_checkpoint(path)
    assert set(loaded) == set(sd)
    np.testing.assert_allclose(loaded["conv1.weight"], sd["conv1.weight"])
