"""AOT model export for production serving (jax.export → StableHLO).

The exported artifact is the EXACT eval forward the trainers use — canonical
uint8 batch → center-crop + ImageNet-normalize (aug.views.eval_view,
dataset.py:216-231) → backbone → softmax probabilities — with the weights
baked in as constants. When the checkpoint was trained with an EMA teacher,
the EMA weights are exported, matching the reference's eval/inference-on-EMA
semantics (fixmatch.py:137-140).

Two properties make the artifact deployment-grade:

- **Symbolic batch dimension**: one export serves any batch size (ragged
  final batches included) — no padding, no per-size recompiles at the
  serving site.
- **Multi-platform lowering**: ``platforms=("cpu", "tpu")`` bakes both
  lowerings into one file, so the same artifact runs on a TPU serving fleet
  and on CPU canaries/CI.

Input contract: uint8 NHWC batches at ``canonical_size(config)`` (the same
canonical batches the data pipeline ships; ``data.pipeline.decode_canonical``
produces them from image files). Output: float32 ``(batch, NUM_CLASSES)``
softmax probabilities.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence, Tuple

import numpy as np


def load_eval_params(config, checkpoint: str):
    """Build the model and restore eval-time weights from a checkpoint dir.

    Standalone (no data pipeline needed, unlike cli.evaluate): initializes a
    TrainState skeleton as the orbax restore target, then selects EMA
    weights when present (fixmatch.py:137-140). Returns
    ``(model, params, batch_stats)``.
    """
    import jax.numpy as jnp

    from endoscopy_tpu.ckpt.orbax_io import restore_checkpoint
    from endoscopy_tpu.data.pipeline import canonical_size
    from endoscopy_tpu.models import build_model
    from endoscopy_tpu.optim.schedules import build_schedule
    from endoscopy_tpu.train.state import create_train_state

    model = build_model(config)
    size = canonical_size(config)
    sample = jnp.zeros((1, size, size, 3), jnp.float32)
    use_ema = bool(config.TRAIN.USE_EMA)
    state, _ = create_train_state(
        model, sample, config.TRAIN.OPT_NAME,
        build_schedule(config, n_iter_per_epoch=1), use_ema=use_ema)
    state, _meta = restore_checkpoint(checkpoint, state)
    if use_ema and state.ema_params is not None:
        return model, state.ema_params, state.ema_batch_stats
    return model, state.params, state.batch_stats


def make_infer_fn(model, params, batch_stats, img_size: int, dtype,
                  is_reprod: bool = False, quantize: str | None = None):
    """Closure over baked weights: canonical uint8 batch → softmax probs.

    Mirrors the trainers' jitted eval step (train/common.py::_build_eval_step)
    minus the loss/mask plumbing: the deployed graph IS the evaluated graph —
    including the DATA.IS_REPROD paper-reproduction eval transform when the
    checkpoint was trained with it (resize + mean/std-0.5 normalize instead
    of center-crop + ImageNet normalize).

    ``quantize="int8"`` applies weight-only PTQ (serve/quantize.py): kernels
    are held as int8 constants and dequantized inside the graph, so an
    export of this closure bakes the compressed weights into the artifact.
    """
    import jax
    import jax.numpy as jnp

    from endoscopy_tpu.aug.views import eval_view, reproduce_eval_view
    from endoscopy_tpu.train.common import apply_eval, model_logits

    view = reproduce_eval_view if is_reprod else eval_view

    if quantize is not None:
        if quantize != "int8":
            raise ValueError(f"unknown quantize mode {quantize!r} "
                             "(supported: 'int8')")
        from endoscopy_tpu.serve.quantize import dequantize_tree, quantize_tree

        qparams = quantize_tree(params)

        def infer(batch_u8):
            x = view(batch_u8, img_size, dtype)
            p = dequantize_tree(qparams, dtype)
            logits = model_logits(model, apply_eval(model, p, batch_stats, x))
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        return infer

    def infer(batch_u8):
        x = view(batch_u8, img_size, dtype)
        logits = model_logits(model, apply_eval(model, params, batch_stats, x))
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    return infer


def export_model(config, checkpoint: str, out_path: str,
                 platforms: Sequence[str] = ("cpu", "tpu"),
                 batch: int | None = None,
                 quantize: str | None = None) -> Tuple[int, int]:
    """Export the eval forward of ``checkpoint`` to ``out_path``.

    ``batch=None`` exports a symbolic batch dimension (any size at call
    time); an int pins it. ``quantize="int8"`` ships int8 kernel constants
    with in-graph dequant (weight-only PTQ, serve/quantize.py).
    Returns ``(canonical_input_size, num_classes)``.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from endoscopy_tpu.data.pipeline import canonical_size

    model, params, batch_stats = load_eval_params(config, checkpoint)
    size = canonical_size(config)
    dtype = (jnp.bfloat16
             if config.TRAIN.get("DTYPE", "bfloat16") == "bfloat16"
             else jnp.float32)
    infer = make_infer_fn(model, params, batch_stats,
                          int(config.DATA.IMG_SIZE), dtype,
                          is_reprod=bool(config.DATA.get("IS_REPROD", False)),
                          quantize=quantize)

    if batch is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = int(batch)
    spec = jax.ShapeDtypeStruct((b, size, size, 3), jnp.uint8)
    exported = jax_export.export(
        jax.jit(infer), platforms=list(platforms))(spec)
    Path(out_path).write_bytes(exported.serialize())
    return size, int(config.MODEL.NUM_CLASSES)


def load_exported(path: str):
    """Deserialize an exported artifact → ``fn(batch_u8) -> probs``.

    Needs only jax at the serving site; the module rehydrates the StableHLO
    program with its baked weights and compiles for the local backend.
    The returned callable carries the artifact's own contract as attributes:
    ``input_size`` (canonical edge), ``num_classes``, and ``batch``
    (pinned size, or None when the batch dimension is symbolic).
    """
    import jax.numpy as jnp
    from jax import export as jax_export

    exported = jax_export.deserialize(Path(path).read_bytes())

    def infer(batch_u8: np.ndarray) -> np.ndarray:
        return np.asarray(exported.call(jnp.asarray(batch_u8, jnp.uint8)))

    in_shape = exported.in_avals[0].shape
    infer.input_size = int(in_shape[1])
    infer.batch = int(in_shape[0]) if isinstance(in_shape[0], int) else None
    infer.num_classes = int(exported.out_avals[0].shape[-1])
    return infer
