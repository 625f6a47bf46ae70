"""Orbax checkpointing with the reference's resume contract.

The reference checkpoint dict is {epoch, best_valid_*, model_state_dict,
optimizer, scheduler, [ema_state_dict]} (fixmatch.py:181-202); restore brings
back optimizer + scheduler step + EMA + epoch (fixmatch.py:204-236). Here the
whole TrainState pytree (params, batch_stats, opt_state, EMA, step — the
schedule is a pure function of step, so "scheduler state" is the step) plus a
small metadata dict round-trips through one Orbax directory per save.

Directory layout: <save_dir>/<name>/  (default name: epoch_<N>); a sidecar
meta.json carries {epoch, best_valid_*}.
"""

from __future__ import annotations

import atexit
import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

# One long-lived checkpointer so saves run ASYNC: orbax snapshots the device
# arrays and writes in the background while training continues (the jitted
# steps build NEW buffers functionally, so in-flight saves never see torn
# state). wait_until_finished() is called before any dependent operation.
_CKPTR: Optional[ocp.StandardCheckpointer] = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
        atexit.register(wait_until_finished)
    return _CKPTR


def wait_until_finished() -> None:
    """Block until all in-flight async saves are durable."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def _primary_host() -> bool:
    """Exactly one process may perform filesystem surgery (renames, deletes,
    metadata writes) on a checkpoint dir shared across hosts."""
    return jax.process_index() == 0


def _barrier(tag: str) -> None:
    """Cross-process sync so no host races ahead of process 0's surgery.
    No-op single-process (the common path pays nothing)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def save_checkpoint(save_dir: str, name: str, state: Any,
                    metadata: Dict, block: bool = False) -> str:
    """Multi-host note: every process calls this (orbax coordinates the
    array writes internally); the surrounding rename/delete/meta surgery
    runs on process 0 only, fenced by barriers."""
    path = os.path.abspath(os.path.join(save_dir, name))
    os.makedirs(save_dir, exist_ok=True)
    ckptr = _checkpointer()
    ckptr.wait_until_finished()  # one save in flight at a time
    state_dir = os.path.join(path, "state")
    if os.path.isdir(state_dir):
        # Re-saving an already-complete epoch (happens on resume, which
        # restarts AT the saved epoch). force=True would delete the old
        # state before the async write is durable — a crash mid-save would
        # then lose the only copy. Write to a sibling temp name, block,
        # then swap atomically.
        import shutil
        tmp_dir = os.path.join(path, "state.resave")
        old_dir = os.path.join(path, "state.old")
        if _primary_host():
            for d in (tmp_dir, old_dir):
                if os.path.isdir(d):
                    shutil.rmtree(d)
        _barrier(f"ckpt-resave-clean:{name}")
        ckptr.save(tmp_dir, state, force=True)
        ckptr.wait_until_finished()
        _barrier(f"ckpt-resave-written:{name}")
        if _primary_host():
            os.rename(state_dir, old_dir)
            os.rename(tmp_dir, state_dir)
            shutil.rmtree(old_dir)
        _barrier(f"ckpt-resave-swapped:{name}")
    else:
        ckptr.save(state_dir, state, force=True)
    if _primary_host():
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(metadata, f)
    if block:
        ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, target: Any) -> Tuple[Any, Dict]:
    """Restore into the structure of ``target`` (an abstract or concrete
    TrainState pytree)."""
    wait_until_finished()  # a just-issued save of this path must be durable
    path = os.path.abspath(path)
    if not os.path.isdir(os.path.join(path, "state")):
        raise FileNotFoundError(
            f"checkpoint '{path}' has no finalized state/ dir (crashed "
            f"mid-save?); use latest_checkpoint() to find a complete one")
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        state = ckptr.restore(os.path.join(path, "state"), abstract)
    meta_file = os.path.join(path, "meta.json")
    metadata = {}
    if os.path.exists(meta_file):
        with open(meta_file) as f:
            metadata = json.load(f)
    return state, metadata


def latest_checkpoint(save_dir: str) -> Optional[str]:
    """Highest COMPLETE epoch_<N> directory under save_dir.

    Async saves write the orbax state into a temp dir and atomically rename
    it to ``<dir>/state`` on finalize, while ``meta.json`` is written
    eagerly — so a crash mid-save leaves a directory with metadata but no
    ``state``. Such incomplete checkpoints are skipped; any save still in
    flight in THIS process is flushed first."""
    wait_until_finished()
    if not os.path.isdir(save_dir):
        return None
    best, best_n = None, -1
    for d in os.listdir(save_dir):
        m = re.fullmatch(r"epoch_(\d+)", d)
        if not m:
            continue
        state_dir = os.path.join(save_dir, d, "state")
        old_dir = os.path.join(save_dir, d, "state.old")
        if not os.path.isdir(state_dir) and os.path.isdir(old_dir):
            # crash landed between the two renames of a re-save swap
            # (save_checkpoint): the previous durable state is still in
            # state.old — promote it back. Several hosts may scan a shared
            # dir concurrently; the losers of the rename just re-check.
            try:
                os.rename(old_dir, state_dir)
            except OSError:
                pass
        if int(m.group(1)) > best_n and os.path.isdir(state_dir):
            best, best_n = os.path.join(save_dir, d), int(m.group(1))
    return best
