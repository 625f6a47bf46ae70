"""Model-zoo structural tests (tiny shapes to keep CPU compile time low)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endoscopy_tpu.config.loader import default_config
from endoscopy_tpu.models import build_model, l2_normalize
from endoscopy_tpu.models.heads import ClassifierHead, build_head
from endoscopy_tpu.models.modelwemb import ModelwEmb
from endoscopy_tpu.models.resnet import ResNet


def tiny_backbone():
    return ResNet(stage_sizes=(1, 1, 1, 1), num_filters=8, dtype=jnp.float32)


def tiny_se_backbone():
    return ResNet(stage_sizes=(1, 1, 1, 1), num_filters=8, use_se=True,
                  dtype=jnp.float32)


@pytest.fixture(scope="module")
def x():
    return jax.random.uniform(jax.random.key(7), (2, 32, 32, 3), jnp.float32)


def test_resnet_features_shape(x):
    model = tiny_backbone()
    vars_ = model.init(jax.random.key(0), x, train=False)
    fts = model.apply(vars_, x, train=False)
    assert fts.shape == (2, 8 * 8 * 4)  # num_filters * 2^3 * expansion
    assert fts.dtype == jnp.float32


def test_se_adds_gate_params(x):
    se = tiny_se_backbone().init(jax.random.key(0), x, train=False)
    flat = jax.tree_util.tree_flatten_with_path(se["params"])[0]
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert any("se" in n and "fc_down" in n for n in names)


def test_classifier_head_logits(x):
    model = ClassifierHead(backbone=tiny_backbone(), head=build_head(6))
    vars_ = model.init(jax.random.key(0), x, train=False)
    logits = model.apply(vars_, x, train=False)
    assert logits.shape == (2, 6)


def test_modelwemb_contract(x):
    """(logits, fts, fts_low) with L2-normalized fts_low
    (custom_model.py:207-213)."""
    model = ModelwEmb(backbone=tiny_backbone(), num_classes=6, low_dim=16)
    vars_ = model.init(jax.random.key(0), x, train=False)
    logits, fts, fts_low = model.apply(vars_, x, train=False)
    assert logits.shape == (2, 6)
    assert fts.shape == (2, 256)
    assert fts_low.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(fts_low), axis=1),
                               np.ones(2), rtol=1e-5)


def test_batchnorm_mutable_in_train(x):
    model = tiny_backbone()
    vars_ = model.init(jax.random.key(0), x, train=False)
    y, updates = model.apply(vars_, x + 1.0, train=True, mutable=["batch_stats"])
    # running stats must move
    before = jax.tree.leaves(vars_["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_build_model_dispatch():
    cfg = default_config()
    cfg.MODEL.NAME = "resnet50"
    cfg.MODEL.TYPE_SEMI = "CoMatch"
    assert isinstance(build_model(cfg), ModelwEmb)
    cfg.MODEL.TYPE_SEMI = "FixMatch"
    cfg.MODEL.IS_TRIPLET = True
    assert isinstance(build_model(cfg), ModelwEmb)
    cfg.MODEL.IS_TRIPLET = False
    m = build_model(cfg)
    assert isinstance(m, ClassifierHead)


def test_l2_normalize_matches_reference_power_norm(rng):
    x = rng.normal(size=(4, 8)).astype(np.float32)
    out = np.asarray(l2_normalize(jnp.asarray(x)))
    ref = x / np.sqrt((x ** 2).sum(axis=1, keepdims=True))
    np.testing.assert_allclose(out, ref, rtol=1e-6)
