"""Optimizer/schedule tests against the reference's timm semantics
(lr_scheduler.py:14-116, optimizer.py:13-52)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from endoscopy_tpu.config.loader import default_config
from endoscopy_tpu.optim import build_optimizer, build_schedule, weight_decay_mask
from endoscopy_tpu.optim.schedules import cosine_schedule, linear_schedule, step_schedule


def test_warmup_linear_ramp():
    sch = step_schedule(base_lr=1e-3, decay_t=100, decay_rate=0.8,
                        warmup_lr_init=5e-4, warmup_t=10)
    assert float(sch(0)) == pytest.approx(5e-4)
    # timm warmup: lr(t) = init + t*(base-init)/warmup_t
    assert float(sch(5)) == pytest.approx(5e-4 + 5 * (1e-3 - 5e-4) / 10)
    assert float(sch(10)) == pytest.approx(1e-3)


def test_step_decay():
    sch = step_schedule(base_lr=1e-3, decay_t=100, decay_rate=0.8,
                        warmup_lr_init=5e-4, warmup_t=10)
    assert float(sch(150)) == pytest.approx(1e-3 * 0.8, rel=1e-4)
    assert float(sch(250)) == pytest.approx(1e-3 * 0.8 ** 2, rel=1e-4)


def test_cosine_endpoints():
    sch = cosine_schedule(base_lr=1e-3, num_steps=1000, warmup_lr_init=5e-4,
                          warmup_t=0, lr_min=5e-6)
    assert float(sch(0)) == pytest.approx(1e-3)
    assert float(sch(1000)) == pytest.approx(5e-6, abs=1e-9)
    assert float(sch(500)) == pytest.approx(5e-6 + 0.5 * (1e-3 - 5e-6))


def test_linear_decay():
    # lr_scheduler.py:97-104: v - (v - v*rate) * (t-warm)/(total-warm)
    sch = linear_schedule(base_lr=1e-3, num_steps=1000, warmup_lr_init=5e-4,
                          warmup_t=100, lr_min_rate=0.01)
    assert float(sch(100)) == pytest.approx(1e-3)
    assert float(sch(1000)) == pytest.approx(1e-5, rel=1e-4)
    mid = 1e-3 - (1e-3 - 1e-5) * 0.5
    assert float(sch(550)) == pytest.approx(mid, rel=1e-4)


def test_build_schedule_uses_epoch_steps():
    cfg = default_config()
    cfg.TRAIN.SCH_NAME = "step"
    cfg.TRAIN.WARMUP_EPOCHS = 2
    sch = build_schedule(cfg, n_iter_per_epoch=10)
    # warmup_t = 20 steps
    assert float(sch(19)) < float(cfg.TRAIN.BASE_LR)
    assert float(sch(20)) == pytest.approx(float(cfg.TRAIN.BASE_LR))


def test_weight_decay_mask_skips_vectors():
    params = {"conv": {"kernel": jnp.zeros((3, 3, 4, 8)), "bias": jnp.zeros(8)},
              "bn": {"scale": jnp.zeros(8)}}
    mask = weight_decay_mask(params)
    assert mask["conv"]["kernel"] is True
    assert mask["conv"]["bias"] is False
    assert mask["bn"]["scale"] is False


def test_adam_has_no_decay():
    """Adam uses wd=0 (optimizer.py:51): params should not shrink with zero grads."""
    params = {"w": jnp.ones((4, 4))}
    opt = build_optimizer(params, "Adam", lr=0.1)
    state = opt.init(params)
    grads = {"w": jnp.zeros((4, 4))}
    updates, _ = opt.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), 0.0)


def test_adamw_decays_matrices_only():
    params = {"w": jnp.ones((4, 4)), "b": jnp.ones(4)}
    opt = build_optimizer(params, "AdamW", lr=0.1)
    state = opt.init(params)
    grads = jax.tree.map(jnp.zeros_like, params)
    updates, _ = opt.update(grads, state, params)
    assert np.abs(np.asarray(updates["w"])).max() > 0  # decayed
    np.testing.assert_allclose(np.asarray(updates["b"]), 0.0)  # skipped
