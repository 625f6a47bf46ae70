"""Kvasir-Capsule transfer capability end-to-end (BASELINE.md target 5):
pathology checkpoint → 11-class EZBM two-stage through the real CLI
(`--trainer ezbm` + a kvasir_capsule_transfer-shaped config with the
'path' INPUT_NAME schema of resource/kvasir_capsule/fold_0.csv)."""

import os

import numpy as np
import pandas as pd
import pytest
import yaml

pytestmark = pytest.mark.slow  # heavy tier

from endoscopy_tpu.data.synthetic import make_synthetic_dataset


def test_capsule_ezbm_transfer_cli(tmp_path, capsys):
    from endoscopy_tpu.cli import learn as learn_cli

    # 11-class synthetic set with the capsule CSV schema (column 'path')
    img_root, anno_csv, _, _ = make_synthetic_dataset(
        str(tmp_path / "capsule"), num_classes=11, n_train=44, n_valid=22,
        n_unlabeled=11, img_size=40)
    df = pd.read_csv(anno_csv).rename(columns={"image": "path"})
    capsule_csv = str(tmp_path / "fold_0.csv")
    df.to_csv(capsule_csv, index=False)

    # donor: a 4-class pathology checkpoint (trunk transfers, head fresh)
    donor_root, donor_csv, _, _ = make_synthetic_dataset(
        str(tmp_path / "patho"), num_classes=4, n_train=16, n_valid=8,
        n_unlabeled=4, img_size=40)
    donor_yaml = {
        "DATA": {"PATH": donor_root, "ANNO": donor_csv, "IMG_SIZE": 32,
                 "BATCH_SIZE": 4, "NUM_WORKERS": 0},
        "MODEL": {"NAME": "resnet_tiny", "NUM_CLASSES": 4},
        "TRAIN": {"IS_SSL": False, "EPOCHS": 2, "EVAL_STEP": 1,
                  "FREQ_EVAL": 1, "DTYPE": "float32", "STEPS_PER_CALL": 1,
                  "MESH_DATA": 1,
                  "SAVE_CP": str(tmp_path / "ckpt_patho")}}
    p1 = str(tmp_path / "patho.yaml")
    yaml.safe_dump(donor_yaml, open(p1, "w"))
    learn_cli.main(["--config-1", p1])
    donor_ckpt = os.path.join(str(tmp_path / "ckpt_patho"), "epoch_1")
    assert os.path.isdir(donor_ckpt)

    # capsule stage: EZBM two-stage with the donor as PRE_TRAIN_PATH
    capsule_yaml = {
        "DATA": {"PATH": img_root, "ANNO": capsule_csv, "INPUT_NAME": "path",
                 "IMG_SIZE": 32, "BATCH_SIZE": 4, "NUM_WORKERS": 0,
                 "IS_CROP": True},
        "MODEL": {"NAME": "resnet_tiny", "NUM_CLASSES": 11,
                  "IS_TRIPLET": True, "LOW_DIM": 8, "PRE_TRAIN": True,
                  "PRE_TRAIN_PATH": donor_ckpt},
        "TRAIN": {"IS_SSL": False, "EPOCHS": 2, "FREQ_EVAL": 1,
                  "CLS_WEIGHT": True, "USE_EMA": False, "LAMBDA_C": 4.0,
                  "EXPANSION": "balance", "DTYPE": "float32",
                  "STEPS_PER_CALL": 1, "MESH_DATA": 1, "SAVE_CP": ""}}
    p2 = str(tmp_path / "capsule.yaml")
    yaml.safe_dump(capsule_yaml, open(p2, "w"))
    capsys.readouterr()  # drop donor-stage output
    learn_cli.main(["--config-1", p2, "--trainer", "ezbm"])

    # capability, not just wiring: the per-epoch stage-1 train losses must
    # DECREASE and every eval macro-F1 must be finite (EZBM.fit prints
    # "s{1,2} ep N: train L valid V F1 F" per eval epoch; ezbm.py:364-411)
    import re

    out = capsys.readouterr().out
    s1 = [float(v) for v in
          re.findall(r"s1 ep \d+: train ([0-9.]+)", out)]
    assert len(s1) >= 2, out
    assert s1[-1] < s1[0], f"EZBM stage-1 loss did not decrease: {s1}"
    f1s = [float(v) for v in re.findall(r"F1 ([0-9.]+)", out)]
    assert f1s and all(np.isfinite(f1s)), out
