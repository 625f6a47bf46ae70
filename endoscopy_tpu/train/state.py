"""Carried training state: params, BN stats, optimizer state, EMA teacher.

One flax.struct pytree flows through every jitted step function; the EMA copy
covers params AND batch_stats exactly like the reference's state_dict sweep
(ema.py:51-59). Sharding: parameters follow parallel.param_shardings (TP on
wide head kernels, replicated elsewhere); the state is created directly with
those shardings so nothing is ever re-laid-out.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from endoscopy_tpu.optim import build_optimizer
from endoscopy_tpu.ssl_state.ema import ema_init


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any = None
    ema_batch_stats: Any = None


def create_train_state(
    model,
    sample_input: jnp.ndarray,
    opt_func: str,
    lr_schedule,
    use_ema: bool,
    seed: int = 42,
) -> tuple:
    """Initialize (state, tx). tx is returned for the step closures."""
    variables = model.init(jax.random.key(seed), sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = build_optimizer(params, opt_func=opt_func, lr=lr_schedule)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=ema_init(params) if use_ema else None,
        ema_batch_stats=ema_init(batch_stats) if use_ema else None,
    )
    return state, tx
