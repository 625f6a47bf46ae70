"""Transfer-weight initialization (reference build.py:92-151, 180-194).

The reference's accuracy story rests on initializing the trunk from a
previously trained checkpoint: ImageNet timm weights → a 2-class "abnormal"
classifier → the N-class pathology model, where each hop loads the full
state_dict and then swaps the classification head
(``/root/reference/code/build.py:113-131, 157-165, 180-188``).

Here the same capability consumes ``MODEL.PRE_TRAIN`` / ``MODEL.PRE_TRAIN_PATH``:

- ``PRE_TRAIN_PATH`` → a torch ``.pth`` checkpoint (imported through the
  per-architecture key maps in torch_import.py) or an orbax checkpoint
  directory saved by this framework (grafted by matching param paths).
  Trunk tensors whose path+shape match are copied; head tensors with
  differing class counts keep their fresh initialization — exactly the
  reference surgery.
- ``PRE_TRAIN`` truthy with no path → the reference would download ImageNet
  weights via timm; this environment has no network, so a loud warning is
  printed and training starts from random init.

After grafting, the EMA teacher is re-synced to the new params, matching the
reference's ModelEMA deepcopy-at-construction (ema.py:40-49) which happens
after the transfer load.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Tuple

import numpy as np

from endoscopy_tpu.ckpt.torch_import import (
    ImportReport,
    arch_for_model,
    import_torch_state,
    load_torch_checkpoint,
)
from endoscopy_tpu.config.loader import is_none


def _flatten(tree: Any, prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], Any]:
    out: Dict[Tuple[str, ...], Any] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
    elif tree is not None:
        out[prefix] = tree
    return out


def graft_tree(dst: Any, src: Any) -> Tuple[Any, int, List[str]]:
    """Copy every leaf of ``src`` whose path AND shape match into ``dst``.

    Returns (new_tree, n_copied, mismatched_paths). Mismatched paths are the
    head-surgery leaves (class-count changes) plus anything structural; the
    caller decides whether they are expected.
    """
    import jax
    import jax.numpy as jnp

    src_flat = _flatten(src)
    copied = [0]
    mismatched: List[str] = []

    def visit(path, leaf):
        key = tuple(getattr(p, "key", str(p)) for p in path)
        if key in src_flat:
            cand = np.asarray(src_flat[key])
            if tuple(cand.shape) == tuple(np.shape(leaf)):
                copied[0] += 1
                return jnp.asarray(cand, dtype=np.asarray(leaf).dtype)
            mismatched.append("/".join(key))
        return leaf

    new = jax.tree_util.tree_map_with_path(visit, dst)
    return new, copied[0], mismatched


def _restore_orbax_raw(path: str) -> Dict[str, Any]:
    """Restore an orbax checkpoint directory WITHOUT a target structure —
    needed because the donor model's head widths differ from the current
    model's (the whole point of the surgery)."""
    import orbax.checkpoint as ocp

    from endoscopy_tpu.ckpt.orbax_io import wait_until_finished

    wait_until_finished()  # a just-issued async save of this path must be durable

    state_dir = os.path.join(path, "state")
    if not os.path.isdir(state_dir):
        state_dir = path
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(state_dir)


def load_pretrained_into(
    params: Any,
    batch_stats: Any,
    path: str,
    model_name: str,
) -> Tuple[Any, Any, str]:
    """Load a checkpoint file/dir into (params, batch_stats); returns the
    updated trees plus a human-readable report line. Raises on empty import
    (wrong architecture / wrong file)."""
    if os.path.isdir(path):
        donor = _restore_orbax_raw(path)
        donor_params = donor.get("params", donor)
        donor_bs = donor.get("batch_stats", {})
        params, n_p, miss_p = graft_tree(params, donor_params)
        batch_stats, n_b, _ = graft_tree(batch_stats, donor_bs)
        if n_p == 0:
            raise ValueError(
                f"orbax transfer from '{path}' grafted 0 params — donor "
                f"structure does not match model '{model_name}'")
        report = (f"orbax graft: {n_p} params + {n_b} batch_stats copied, "
                  f"{len(miss_p)} shape-mismatched (head surgery): {miss_p[:4]}")
        return params, batch_stats, report

    state_dict = load_torch_checkpoint(path)
    arch = arch_for_model(model_name)
    scope = "backbone" if (isinstance(params, dict) and "backbone" in params) else None
    params, batch_stats, rep = import_torch_state(
        params, batch_stats, state_dict, arch, backbone_scope=scope)
    if rep.imported == 0:
        raise ValueError(
            f"torch transfer from '{path}' imported 0 tensors for arch "
            f"'{arch}' — unmapped keys e.g. {rep.unmapped[:8]}")
    if rep.unmapped:
        print(f"WARNING: torch import left {len(rep.unmapped)} keys unmapped, "
              f"e.g. {rep.unmapped[:8]}")
    return params, batch_stats, f"torch import ({arch}): {rep.summary()}"


def apply_pretrain(trainer, config) -> bool:
    """Consume MODEL.PRE_TRAIN / MODEL.PRE_TRAIN_PATH on a configured trainer
    (state already initialized). Returns True if weights were loaded.

    Mirrors build.py:180-194: trunk from the checkpoint, fresh head, EMA
    teacher synced to the result.
    """
    path = config.MODEL.get("PRE_TRAIN_PATH")
    pre_train = config.MODEL.get("PRE_TRAIN")
    if is_none(path):
        if pre_train and not is_none(pre_train):
            print(
                "WARNING: MODEL.PRE_TRAIN is set but MODEL.PRE_TRAIN_PATH is "
                "None. The reference downloads ImageNet weights via timm "
                "(build.py:180); this environment has no network access — "
                "point PRE_TRAIN_PATH at a local .pth or orbax checkpoint. "
                "Training will start from RANDOM init.")
        return False
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"MODEL.PRE_TRAIN_PATH '{path}' does not exist")

    state = trainer.state
    params, batch_stats, report = load_pretrained_into(
        state.params, state.batch_stats, path, config.MODEL.NAME)
    new_state = state.replace(params=params, batch_stats=batch_stats)
    if state.ema_params is not None:
        # ModelEMA deep-copies the transferred model (ema.py:44-49)
        import jax
        new_state = new_state.replace(
            ema_params=jax.tree.map(lambda p: p, params),
            ema_batch_stats=jax.tree.map(lambda b: b, batch_stats))
    trainer.state = new_state
    print(f"Loaded checkpoint abnormal/pretrained: {report}")
    return True


def carry_stage_weights(trainer, prev_params, prev_batch_stats) -> None:
    """Progressive resizing stage handoff (learn.py:40-55): stage N+1 trains
    the SAME weights at the new image size. Grafts the previous stage's
    final params/batch_stats into the freshly jitted stage state; EMA
    restarts from the carried weights."""
    state = trainer.state
    params, n_p, miss = graft_tree(state.params, prev_params)
    batch_stats, _, _ = graft_tree(state.batch_stats, prev_batch_stats)
    if n_p == 0:
        raise ValueError("progressive-resize carry grafted 0 params")
    if miss:
        print(f"WARNING: progressive-resize carry skipped {len(miss)} "
              f"size-dependent params: {miss[:4]}")
    new_state = state.replace(params=params, batch_stats=batch_stats)
    if state.ema_params is not None:
        import jax
        new_state = new_state.replace(
            ema_params=jax.tree.map(lambda p: p, params),
            ema_batch_stats=jax.tree.map(lambda b: b, batch_stats))
    trainer.state = new_state
