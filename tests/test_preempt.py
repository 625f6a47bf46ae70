"""Graceful preemption (train/preempt.py): SIGTERM → epoch-boundary
checkpoint → exit 143 → resume.

The reference's only resilience is crash-restart from the last FREQ_EVAL
save (learn.py:79-81); preemption support is a TPU-pod production concern
with no reference counterpart. Fast tier: the signal flag itself and the
fit-loop break+save via the programmatic request() hook. Slow tier: a real
learn-CLI subprocess receives SIGTERM mid-training and must exit 143 with
a resumable checkpoint.
"""

import os
import signal

import numpy as np
import pandas as pd
import pytest

from endoscopy_tpu.train import preempt


@pytest.fixture(autouse=True)
def _clean_flag():
    preempt.reset()
    yield
    preempt.reset()


def test_install_routes_sigterm_to_flag():
    old = signal.getsignal(signal.SIGTERM)
    try:
        preempt.install()
        assert not preempt.requested()
        os.kill(os.getpid(), signal.SIGTERM)  # delivered synchronously here
        assert preempt.requested()
        preempt.reset()
        assert not preempt.requested()
    finally:
        signal.signal(signal.SIGTERM, old)


# ---------------------------------------------------------------------------
# fit-loop behavior, driven via the programmatic request() hook
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from endoscopy_tpu.data.synthetic import make_synthetic_dataset

    root = str(tmp_path_factory.mktemp("preempt_synth"))
    return make_synthetic_dataset(root, num_classes=4, n_train=32, n_valid=12,
                                  n_unlabeled=24, img_size=48)


def _cfg(img_root, **overrides):
    from endoscopy_tpu.config.loader import default_config

    cfg = default_config()
    cfg.DATA.PATH = img_root
    cfg.DATA.IMG_SIZE = 32
    cfg.DATA.BATCH_SIZE = 8
    cfg.DATA.MU = 2
    cfg.MODEL.NUM_CLASSES = 4
    cfg.MODEL.NAME = "resnet_tiny"
    cfg.TRAIN.DTYPE = "float32"
    cfg.TRAIN.EVAL_STEP = 2
    cfg.TRAIN.SAVE_CP = ""
    for k, v in overrides.items():
        section, key = k.split(".")
        cfg[section][key] = v
    return cfg


@pytest.mark.slow
def test_supervised_fit_stops_and_saves_on_preemption(dataset, tmp_path):
    """With the flag raised before fit(), the loop must run exactly ONE
    epoch (of 50 configured), write a resume checkpoint, and return."""
    from endoscopy_tpu.ckpt.orbax_io import latest_checkpoint
    from endoscopy_tpu.data.manifest import build_supervised_manifests
    from endoscopy_tpu.data.pipeline import (CanonicalLoader, EvalLoader,
                                             canonical_size)
    from endoscopy_tpu.models import build_model
    from endoscopy_tpu.train.supervised import SupLearning

    img_root, anno_csv, _, _ = dataset
    save_dir = str(tmp_path / "cp")
    cfg = _cfg(img_root, **{"TRAIN.EPOCHS": 50, "TRAIN.FREQ_EVAL": 100,
                            "TRAIN.SAVE_CP": save_dir})
    df = pd.read_csv(anno_csv)
    train_m, valid_m, cls_num_list = build_supervised_manifests(cfg, df)
    size = canonical_size(cfg)
    trainer = SupLearning(model=build_model(cfg), opt_func="Adam")
    trainer.get_dataloader(CanonicalLoader(train_m, 8, size, seed=0),
                           EvalLoader(valid_m, 8, size))
    trainer.get_config(cfg, cls_num_list=cls_num_list,
                       labeled_targets=train_m.targets)

    preempt.request()
    trainer.fit()
    assert trainer.epoch == 1, "fit ran past the preemption boundary"
    ckpt = latest_checkpoint(save_dir)
    assert ckpt is not None and ckpt.endswith("epoch_1")

    # and the checkpoint resumes
    preempt.reset()
    trainer2 = SupLearning(model=build_model(cfg), opt_func="Adam")
    trainer2.get_dataloader(CanonicalLoader(train_m, 8, size, seed=0),
                            EvalLoader(valid_m, 8, size))
    trainer2.get_config(cfg, cls_num_list=cls_num_list,
                        labeled_targets=train_m.targets)
    trainer2.load_checkpoint(ckpt, is_train=True)
    assert trainer2.epoch_start == 1


@pytest.mark.slow
def test_fixmatch_base_fit_stops_on_preemption(dataset, tmp_path):
    """Same contract through BaseTrainer.fit (FixMatch/CoMatch/SemiFormer
    path), including the no-double-save interaction with an eval epoch."""
    from endoscopy_tpu.ckpt.orbax_io import latest_checkpoint
    from endoscopy_tpu.data.manifest import build_ssl_manifests
    from endoscopy_tpu.data.pipeline import (CanonicalLoader, EvalLoader,
                                             canonical_size)
    from endoscopy_tpu.models import build_model
    from endoscopy_tpu.train.fixmatch import FixMatch

    img_root, anno_csv, _, _ = dataset
    save_dir = str(tmp_path / "cp")
    cfg = _cfg(img_root, **{"TRAIN.IS_SSL": True, "TRAIN.EPOCHS": 50,
                            "TRAIN.FREQ_EVAL": 1,
                            "TRAIN.SAVE_CP": save_dir})
    df = pd.read_csv(anno_csv)
    labeled, unlabeled, valid, _ = build_ssl_manifests(cfg, df)
    size = canonical_size(cfg)
    trainer = FixMatch(model=build_model(cfg), opt_func="Adam")
    trainer.get_dataloader(
        (CanonicalLoader(labeled, 8, size, seed=0),
         CanonicalLoader(unlabeled, 8 * 2, size, seed=1)),
        EvalLoader(valid, 8, size))
    trainer.get_config(cfg, labeled_targets=labeled.targets)

    preempt.request()
    trainer.fit()
    assert trainer.epoch == 1
    # FREQ_EVAL=1: the eval-path save covers epoch 1; the preemption hook
    # must not write a second checkpoint on top of it
    cp_root = save_dir
    assert sorted(os.listdir(cp_root)) == ["epoch_1"]
    assert latest_checkpoint(cp_root).endswith("epoch_1")


# ---------------------------------------------------------------------------
# Real signal through the real CLI (subprocess)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_learn_cli_sigterm_checkpoints_and_exits_143(dataset, tmp_path):
    import subprocess
    import sys
    import time

    import yaml

    img_root, anno_csv, _, _ = dataset
    save_dir = str(tmp_path / "cp")
    cfg = _cfg(img_root, **{"TRAIN.EPOCHS": 200, "TRAIN.FREQ_EVAL": 1000,
                            "TRAIN.SAVE_CP": save_dir})
    cfg.DATA.ANNO = anno_csv
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump({k: dict(v) for k, v in cfg.items()}, f)

    env = dict(os.environ, ETPU_PLATFORM="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "endoscopy_tpu.cli.learn",
         "--config-1", str(cfg_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
    try:
        # wait until at least one epoch completed, then preempt
        deadline = time.monotonic() + 600
        for line in proc.stdout:
            if line.startswith("Epoch 1 |"):
                break
            assert time.monotonic() < deadline, "epoch 1 never completed"
        proc.send_signal(signal.SIGTERM)
        tail = proc.stdout.read()
        rc = proc.wait(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()  # direct child PID only — never pattern-kill
    assert rc == 143, f"rc={rc}\n{tail}"
    assert "[preempt]" in tail
    epochs = sorted(os.listdir(save_dir))
    assert epochs, "no checkpoint saved on preemption"

    # resume from the preemption checkpoint and finish a short run
    from endoscopy_tpu.ckpt.orbax_io import latest_checkpoint

    ckpt = latest_checkpoint(save_dir)
    # SIGTERM landed asynchronously, so the saved epoch N may be >1; resume
    # must TRAIN (not hit the resume-at-final-epoch eval-only path), so run
    # to N+1 with eval every epoch
    saved_epoch = int(ckpt.rsplit("epoch_", 1)[1])
    cfg2 = _cfg(img_root, **{"TRAIN.EPOCHS": saved_epoch + 1,
                             "TRAIN.FREQ_EVAL": 1,
                             "TRAIN.SAVE_CP": ""})
    cfg2.DATA.ANNO = anno_csv
    cfg2.MODEL.PRE_TRAIN_RESUME = ckpt
    cfg2_path = tmp_path / "cfg2.yaml"
    with open(cfg2_path, "w") as f:
        yaml.safe_dump({k: dict(v) for k, v in cfg2.items()}, f)
    out = subprocess.run(
        [sys.executable, "-m", "endoscopy_tpu.cli.learn",
         "--config-1", str(cfg2_path)],
        capture_output=True, text=True, timeout=900, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "macro-F1" in out.stdout
