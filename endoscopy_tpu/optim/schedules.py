"""Step-granularity LR schedules (reference: lr_scheduler.py:14-116).

All three reference schedules share the timm linear-warmup prefix:
``lr(t) = warmup_lr_init + t * (base_lr - warmup_lr_init)/warmup_t`` for
``t < warmup_t``. After warmup:

- cosine: timm CosineLRScheduler with cycle_limit=1, lr_min=5e-6,
  warmup_prefix=False — the cosine runs on the *global* step over t_initial
  (lr_scheduler.py:33-44).
- linear: custom LinearLRScheduler decaying base→base*lr_min_rate(0.01)
  linearly over the post-warmup span (lr_scheduler.py:97-104).
- step: timm StepLRScheduler, lr = base * decay_rate^(t // decay_t)
  (lr_scheduler.py:54-62).

Schedules are pure functions of the optax step count, so they live inside the
jitted update (the reference calls ``step_update(global_step)`` per iteration,
fixmatch.py:124 — same granularity).
"""

from __future__ import annotations

import jax.numpy as jnp


def _warmup(t, base_lr: float, warmup_lr_init: float, warmup_t: int):
    if warmup_t <= 0:
        return jnp.full_like(t, base_lr, dtype=jnp.float32)
    slope = (base_lr - warmup_lr_init) / warmup_t
    return warmup_lr_init + t * slope


def cosine_schedule(base_lr: float, num_steps: int, warmup_lr_init: float,
                    warmup_t: int, lr_min: float = 5e-6):
    def fn(step):
        t = jnp.asarray(step, jnp.float32)
        warm = _warmup(t, base_lr, warmup_lr_init, warmup_t)
        # timm warmup_prefix=False: cosine phase uses the global step / t_initial
        cos = lr_min + 0.5 * (base_lr - lr_min) * (
            1.0 + jnp.cos(jnp.pi * jnp.minimum(t, num_steps) / num_steps))
        return jnp.where(t < warmup_t, warm, cos)
    return fn


def linear_schedule(base_lr: float, num_steps: int, warmup_lr_init: float,
                    warmup_t: int, lr_min_rate: float = 0.01):
    def fn(step):
        t = jnp.asarray(step, jnp.float32)
        warm = _warmup(t, base_lr, warmup_lr_init, warmup_t)
        total = max(num_steps - warmup_t, 1)
        frac = jnp.clip((t - warmup_t) / total, 0.0, 1.0)
        lin = base_lr - (base_lr - base_lr * lr_min_rate) * frac
        return jnp.where(t < warmup_t, warm, lin)
    return fn


def step_schedule(base_lr: float, decay_t: int, decay_rate: float,
                  warmup_lr_init: float, warmup_t: int):
    def fn(step):
        t = jnp.asarray(step, jnp.float32)
        warm = _warmup(t, base_lr, warmup_lr_init, warmup_t)
        k = jnp.floor(t / max(decay_t, 1))
        stepped = base_lr * jnp.power(decay_rate, k)
        return jnp.where(t < warmup_t, warm, stepped)
    return fn


def build_schedule(config, n_iter_per_epoch: int):
    """Schedule factory (lr_scheduler.py:14-64)."""
    num_steps = int(config.TRAIN.EPOCHS * n_iter_per_epoch)
    warmup_t = int(config.TRAIN.WARMUP_EPOCHS * n_iter_per_epoch)
    decay_t = int(config.TRAIN.DECAY_EPOCHS * n_iter_per_epoch)
    base_lr = float(config.TRAIN.BASE_LR)
    warmup_lr = float(config.TRAIN.WARMUP_LR)

    name = config.TRAIN.SCH_NAME
    if name == "cosine":
        return cosine_schedule(base_lr, num_steps, warmup_lr, warmup_t)
    if name == "linear":
        return linear_schedule(base_lr, num_steps, warmup_lr, warmup_t)
    if name == "step":
        return step_schedule(base_lr, decay_t, float(config.TRAIN.LR_DECAY),
                             warmup_lr, warmup_t)
    raise ValueError(f"unknown scheduler '{name}'")
