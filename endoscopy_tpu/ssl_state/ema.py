"""EMA teacher as pure pytree updates (reference: ema.py:40-62).

The reference sweeps the full ``state_dict`` — parameters AND buffers (BN
running stats) — with ``ema = d*ema + (1-d)*model`` per optimizer step
(ema.py:51-59). Here the EMA copy is a pytree carried inside the jitted train
step, so the update fuses with the optimizer and costs one elementwise pass
over HBM instead of a Python loop over tensors.
"""

from __future__ import annotations

import jax


def ema_init(tree):
    """Deep-copy initialization (ema.py:44)."""
    return jax.tree.map(lambda x: x, tree)


def ema_update(ema_tree, model_tree, decay: float):
    """ema = decay*ema + (1-decay)*model over every leaf (ema.py:58-59)."""
    return jax.tree.map(lambda e, m: decay * e + (1.0 - decay) * m,
                        ema_tree, model_tree)


def ema_set(ema_tree, model_tree):
    """Hard copy (ema.py:61-62)."""
    return jax.tree.map(lambda e, m: m, ema_tree, model_tree)
