"""Optimizer factory (reference: optimizer.py:29-52).

Weight-decay split follows the reference policy (optimizer.py:13-27): 1-D
parameters (biases, norm scales/offsets) get no decay; matrices/conv kernels
do. Decay constants match the reference: SGD(momentum .9, nesterov, wd .05),
AdamW(wd .05), Adam(wd 0).

Implemented as optax chains with a pytree decay mask; the learning rate is a
schedule function evaluated per optimizer step inside the jitted update.
"""

from __future__ import annotations

from typing import Callable, Union

import jax
import jax.numpy as jnp
import optax


def weight_decay_mask(params) -> object:
    """True (decay) for ndim>1 leaves; False for vectors/scalars
    (optimizer.py:20-25 skips 1-D params and biases)."""
    return jax.tree.map(lambda p: p.ndim > 1, params)


def build_optimizer(
    params,
    opt_func: str = "Adam",
    lr: Union[float, Callable] = 1e-3,
) -> optax.GradientTransformation:
    opt_lower = opt_func.lower()
    mask = weight_decay_mask(params)

    if opt_lower == "sgd":
        return optax.chain(
            optax.add_decayed_weights(0.05, mask=mask),
            optax.sgd(learning_rate=lr, momentum=0.9, nesterov=True),
        )
    if opt_lower == "adamw":
        return optax.adamw(learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=0.05, mask=mask)
    if opt_lower == "adam":
        return optax.adam(learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8)
    raise ValueError(f"unknown optimizer '{opt_func}'")
