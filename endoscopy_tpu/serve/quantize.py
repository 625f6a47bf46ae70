"""Weight-only int8 post-training quantization for the serving export.

Production model compression the reference leaves to the reader (its
deployment path is a notebook over full-precision state_dicts,
``/root/reference/Inference.ipynb`` + ``supervised.py:238-268``). The
TPU-native shape of PTQ: quantize every conv/dense kernel to int8 with a
per-output-channel absmax scale on the host, and put the *dequantize* in
the exported graph — the StableHLO artifact then carries int8 constants
(4x smaller than f32, 2x smaller than bf16) and XLA fuses the
``convert(int8)*scale`` back-to-bf16 into the weight load at compile time.

Why weight-only (W8A16) and not full int8: activations keep the model
dtype, so no calibration data is needed, accuracy loss is negligible at
8 bits per-channel, and the transform is a pure pytree map — the model
code is untouched. Scales live on the last axis (flax convention: kernels
are ``(..., out_features)`` for Dense and ``(H, W, I, O)`` for Conv, so
the output channel is always axis -1).

Contract: ``dequantize_tree(quantize_tree(params), dtype)`` has the exact
structure of ``params`` with every eligible kernel replaced by its
quantize→dequantize round-trip; everything else (biases, BN/LN scales,
embeddings, batch_stats) passes through bit-identical.
"""

from __future__ import annotations

from typing import Any

_Q, _S = "__wq_int8__", "__wq_scale__"


def _is_qnode(node: Any) -> bool:
    return isinstance(node, dict) and _Q in node and _S in node


def _eligible(path, w) -> bool:
    """Quantize matmul/conv kernels only: the parameters that dominate both
    artifact size and serving-time HBM weight traffic. 1-D leaves (biases,
    norm scales) and norm statistics are numerically sensitive and tiny —
    skipping them costs <1% of the size win."""
    if getattr(w, "ndim", 0) < 2:
        return False
    leaf_name = str(getattr(path[-1], "key", path[-1])) if path else ""
    return leaf_name == "kernel"


def quantize_tree(params):
    """Host-side pytree map: eligible kernels → ``{int8 q, f32 scale}``.

    Per-output-channel symmetric absmax: ``scale = max|w| / 127`` over all
    axes but the last, ``q = clip(round(w / scale), -127, 127)``. An
    all-zero channel gets scale 1 (q is then all-zero too).
    """
    import jax.numpy as jnp
    from jax import tree_util

    def q(path, w):
        if not _eligible(path, w):
            return w
        axes = tuple(range(w.ndim - 1))
        scale = jnp.max(jnp.abs(w), axis=axes, keepdims=True) / 127.0
        scale = jnp.where(scale == 0, jnp.ones_like(scale), scale)
        qv = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        return {_Q: qv, _S: scale.astype(jnp.float32)}

    return tree_util.tree_map_with_path(q, params)


def dequantize_tree(qparams, dtype):
    """Graph-side inverse: q-nodes → ``q.astype(dtype) * scale`` leaves.

    Called inside the exported/jitted function so the artifact stores the
    int8 constants and the convert+scale is part of the compiled program.
    """
    from jax import tree_util

    def dq(node):
        if _is_qnode(node):
            return node[_Q].astype(dtype) * node[_S].astype(dtype)
        return node

    return tree_util.tree_map(dq, qparams, is_leaf=_is_qnode)


def quantized_fraction(qparams) -> float:
    """Fraction of parameter scalars stored as int8 (diagnostic)."""
    from jax import tree_util

    total = quant = 0
    for node in tree_util.tree_leaves(
            qparams, is_leaf=_is_qnode):
        if _is_qnode(node):
            quant += node[_Q].size
            total += node[_Q].size
        else:
            total += getattr(node, "size", 0)
    return (quant / total) if total else 0.0
