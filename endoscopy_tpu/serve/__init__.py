"""Deployment/serving subsystem: AOT export of trained models.

The reference serves predictions by re-running its full torch stack inside
a notebook (Inference.ipynb); here the trained model is lowered once to a
self-contained portable artifact (StableHLO via jax.export) and served from
any process with jax installed — no model code, config, or checkpoint
needed at the serving site.
"""

from endoscopy_tpu.serve.export import (
    export_model,
    load_eval_params,
    load_exported,
    make_infer_fn,
)

__all__ = [
    "export_model",
    "load_eval_params",
    "load_exported",
    "make_infer_fn",
]
