"""Worker for the real 2-process DCN tests (tests/test_multiprocess.py).

Each of two processes owns 2 virtual CPU devices (4 global), initializes
``jax.distributed`` against a localhost coordinator, and drives one FixMatch
train step plus one ``evaluate_one`` through the REAL multi-process branches:
``_shard``'s ``make_array_from_process_local_data`` path and
``_fetch_batch_rows``'s addressable-shard reassembly
(endoscopy_tpu/train/common.py). This is the multi-host data-parallel path
of SURVEY.md §2.3 (input pipeline sharding over DCN) — the reference has no
distributed anything (learn.py:35-38), so the contract under test is
equivalence with the single-process step, asserted by the parent test.

Phases (argv[4], default "train"):
- train:  one train step + evaluate_one, report losses/metrics.
- save:   one train step, then save the checkpoint TWICE so the second save
          executes the multi-host resave swap (rename/delete fenced by
          barriers on process 0 only, ckpt/orbax_io.py:70-92 — the race fix
          of commit 6ab9490) under a real ``jax.distributed`` runtime.
          Reports a sha256 digest of every state leaf.
- resume: fresh processes restore via latest_checkpoint(), report the
          restored digest (parent asserts equality with the saved one), then
          run one more train step to prove the restored state is usable.

Usage: python tests/_dcn_worker.py <process_id> <coordinator_port> <out_json>
           [phase] [ckpt_dir]
"""

import hashlib
import json
import os
import sys
import time


def _log(proc_id: int, msg: str) -> None:
    # timestamped progress so a parent-side timeout shows where we hung
    print(f"[worker {proc_id} +{time.monotonic() - _T0:7.1f}s] {msg}",
          flush=True)


_T0 = time.monotonic()


def _digest(tree) -> str:
    """Deterministic sha256 over every leaf (replicated arrays read via one
    addressable replica, so all processes produce the same digest)."""
    import jax
    import numpy as np

    h = hashlib.sha256()
    leaves, treedef = jax.tree.flatten(tree)
    h.update(str(treedef).encode())
    for leaf in leaves:
        if hasattr(leaf, "addressable_data"):
            leaf = leaf.addressable_data(0)
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    return h.hexdigest()


def main() -> None:
    proc_id = int(sys.argv[1])
    port = sys.argv[2]
    out_path = sys.argv[3]
    phase = sys.argv[4] if len(sys.argv) > 4 else "train"
    ckpt_dir = sys.argv[5] if len(sys.argv) > 5 else ""

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    _log(proc_id, f"initializing jax.distributed (port {port})")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=proc_id,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())
    _log(proc_id, "distributed runtime up")

    import jax.numpy as jnp
    import numpy as np

    from endoscopy_tpu.config.loader import default_config
    from endoscopy_tpu.models import build_model
    from endoscopy_tpu.train.fixmatch import FixMatch

    cfg = default_config()
    cfg.MODEL.NAME = "resnet_tiny"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.DATA.IMG_SIZE = 32
    cfg.DATA.BATCH_SIZE = 8  # global; this process holds 4 rows
    cfg.DATA.MU = 2
    cfg.TRAIN.EVAL_STEP = 1
    cfg.TRAIN.DTYPE = "float32"
    cfg.TRAIN.SEED = 11
    cfg.TRAIN.MESH_DATA = 4
    cfg.TRAIN.MESH_MODEL = 1

    trainer = FixMatch(model=build_model(cfg), opt_func="SGD")
    trainer.train_dl = trainer.valid_dl = None
    trainer.get_config(cfg, labeled_targets=np.arange(4))
    _log(proc_id, "trainer built")

    # Identical global batch in both processes and in the parent's reference
    # run; each process contributes its half through _shard.
    rng = np.random.default_rng(3)
    size = int(32 * 1.2)
    x_lb = rng.integers(0, 255, (8, size, size, 3)).astype(np.uint8)
    targets = rng.integers(0, 4, 8).astype(np.int64)
    u = rng.integers(0, 255, (16, size, size, 3)).astype(np.uint8)
    lo, hi = proc_id * 4, (proc_id + 1) * 4
    weights = jnp.ones(4, jnp.float32)

    def one_step():
        state, loss, _ = trainer._train_step(
            trainer.state,
            *trainer._shard(x_lb[lo:hi], targets[lo:hi], u[2 * lo:2 * hi]),
            weights, jax.random.key(99))
        jax.block_until_ready(state)
        trainer.state = state
        return float(loss)

    result = {"process_id": proc_id, "process_count": jax.process_count(),
              "phase": phase}

    if phase == "resume":
        from endoscopy_tpu.ckpt.orbax_io import (latest_checkpoint,
                                                 restore_checkpoint)

        path = latest_checkpoint(ckpt_dir)
        assert path is not None, f"no checkpoint under {ckpt_dir}"
        _log(proc_id, f"restoring {path}")
        trainer.state, meta = restore_checkpoint(path, trainer.state)
        result["restored_digest"] = _digest(trainer.state)
        result["meta_epoch"] = meta.get("epoch")
        # restored state must be live: one more distributed step on it
        result["post_resume_loss"] = one_step()
        _log(proc_id, "resume phase done")
    else:
        loss = one_step()
        result["train_loss"] = loss
        _log(proc_id, "train step done")

        if phase == "save":
            from endoscopy_tpu.ckpt.orbax_io import save_checkpoint

            save_checkpoint(ckpt_dir, "epoch_0", trainer.state,
                            {"epoch": 0}, block=True)
            _log(proc_id, "first save done")
            # second save of the same name runs the multi-host resave swap
            # (temp write + fenced renames on process 0, orbax_io.py:70-92)
            save_checkpoint(ckpt_dir, "epoch_0", trainer.state,
                            {"epoch": 0}, block=True)
            _log(proc_id, "resave (swap branch) done")
            result["saved_digest"] = _digest(trainer.state)
        else:
            # Eval: every host iterates the FULL valid set (common.py
            # _fetch_batch_rows contract); the global array holds each
            # host's copy, metrics come out identical everywhere.
            eval_u8 = rng.integers(0, 255, (8, 32, 32, 3)).astype(np.uint8)
            eval_t = rng.integers(0, 4, 8).astype(np.int64)
            mask = np.ones(8, bool)
            trainer.valid_dl = [(eval_u8, eval_t, mask)]
            summary_loss, metric = trainer.evaluate_one()
            result["eval_loss"] = float(summary_loss.avg)
            result["macro_f1"] = float(metric["macro/f1"])
            _log(proc_id, "eval done")

    with open(out_path, "w") as f:
        json.dump(result, f)
    _log(proc_id, "wrote result")


if __name__ == "__main__":
    main()
