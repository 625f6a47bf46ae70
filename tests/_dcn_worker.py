"""Worker for the real 2-process DCN test (tests/test_multiprocess.py).

Each of two processes owns 2 virtual CPU devices (4 global), initializes
``jax.distributed`` against a localhost coordinator, and drives one FixMatch
train step plus one ``evaluate_one`` through the REAL multi-process branches:
``_shard``'s ``make_array_from_process_local_data`` path and
``_fetch_batch_rows``'s addressable-shard reassembly
(endoscopy_tpu/train/common.py). This is the multi-host data-parallel path
of SURVEY.md §2.3 (input pipeline sharding over DCN) — the reference has no
distributed anything (learn.py:35-38), so the contract under test is
equivalence with the single-process step, asserted by the parent test.

Usage: python tests/_dcn_worker.py <process_id> <coordinator_port> <out_json>
"""

import json
import os
import sys


def main() -> None:
    proc_id = int(sys.argv[1])
    port = sys.argv[2]
    out_path = sys.argv[3]

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=proc_id,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())

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

    # Identical global batch in both processes and in the parent's reference
    # run; each process contributes its half through _shard.
    rng = np.random.default_rng(3)
    size = int(32 * 1.2)
    x_lb = rng.integers(0, 255, (8, size, size, 3)).astype(np.uint8)
    targets = rng.integers(0, 4, 8).astype(np.int64)
    u = rng.integers(0, 255, (16, size, size, 3)).astype(np.uint8)
    lo, hi = proc_id * 4, (proc_id + 1) * 4

    weights = jnp.ones(4, jnp.float32)
    state, loss, _ = trainer._train_step(
        trainer.state,
        *trainer._shard(x_lb[lo:hi], targets[lo:hi], u[2 * lo:2 * hi]),
        weights, jax.random.key(99))
    jax.block_until_ready(state)
    trainer.state = state

    # Eval: every host iterates the FULL valid set (common.py _fetch_batch_rows
    # contract); the global array holds each host's copy, metrics come out
    # identical everywhere.
    eval_u8 = rng.integers(0, 255, (8, 32, 32, 3)).astype(np.uint8)
    eval_t = rng.integers(0, 4, 8).astype(np.int64)
    mask = np.ones(8, bool)
    trainer.valid_dl = [(eval_u8, eval_t, mask)]
    summary_loss, metric = trainer.evaluate_one()

    with open(out_path, "w") as f:
        json.dump({
            "process_id": proc_id,
            "process_count": jax.process_count(),
            "train_loss": float(loss),
            "eval_loss": float(summary_loss.avg),
            "macro_f1": float(metric["macro/f1"]),
        }, f)


if __name__ == "__main__":
    main()
