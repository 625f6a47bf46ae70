"""Offline L1 CLI utilities: preprocess tree + split manifests
(reference Preprocess.ipynb / Split.ipynb contracts)."""

import os

import numpy as np
import pandas as pd
import pytest


def _write_jpeg_tree(root, classes=("a", "b"), per_class=3, size=40):
    import cv2

    rng = np.random.default_rng(0)
    for cls in classes:
        d = os.path.join(root, cls)
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            img = rng.integers(0, 255, (size, size + 6, 3)).astype(np.uint8)
            cv2.imwrite(os.path.join(d, f"{i}.jpg"), img)


def test_preprocess_cli_mirrors_tree(tmp_path):
    pytest.importorskip("cv2")
    from endoscopy_tpu.cli.preprocess import main

    src = tmp_path / "raw"
    dst = tmp_path / "out"
    _write_jpeg_tree(str(src))
    main(["--src", str(src), "--dst", str(dst), "--min-edge", "24",
          "--workers", "2"])
    import cv2

    for cls in ("a", "b"):
        for i in range(3):
            p = dst / cls / f"{i}.jpg"
            assert p.is_file()
            img = cv2.imread(str(p))
            assert min(img.shape[:2]) == 24  # resized to min edge


def test_split_cli_mock_ssl_contract(tmp_path):
    from endoscopy_tpu.cli.split_data import main, split_dataframe
    from endoscopy_tpu.data.manifest import build_ssl_manifests

    rng = np.random.default_rng(1)
    df = pd.DataFrame({
        "image": [f"im_{i}.jpg" for i in range(200)],
        "target": rng.integers(0, 4, 200),
    })
    src = tmp_path / "labels.csv"
    out = tmp_path / "fold_0.csv"
    df.to_csv(src, index=False)

    main(["--csv", str(src), "--out", str(out), "--valid-frac", "0.2",
          "--labeled-frac", "0.1", "--stratify"])
    got = pd.read_csv(out)

    # reference schema columns present and consistent
    assert set(got.columns) >= {"image", "target", "is_valid", "is_labeled"}
    assert int(got["is_valid"].sum()) == pytest.approx(40, abs=4)
    # valid rows always labeled; train labeled fraction ~10%
    assert got.loc[got["is_valid"], "is_labeled"].all()
    train = got[~got["is_valid"]]
    assert 0.05 <= train["is_labeled"].mean() <= 0.2
    # every class keeps at least one labeled train example
    assert (train[train["is_labeled"]].groupby("target").size() >= 1).all()

    # the SSL manifest builder consumes the CSV directly (mock split path)
    from endoscopy_tpu.config.loader import default_config

    cfg = default_config()
    cfg.DATA.PATH = str(tmp_path)
    cfg.DATA.INPUT_NAME = "image"
    cfg.DATA.TARGET_NAME = "target"
    cfg.DATA.MOCKUP_SSL = True
    labeled, unlabeled, valid, cls_num_list = build_ssl_manifests(cfg, got)
    assert len(labeled) == int(train["is_labeled"].sum())
    assert len(unlabeled) == int((~train["is_labeled"]).sum())
    assert len(valid) == int(got["is_valid"].sum())
    assert sum(cls_num_list) == len(labeled)


def test_split_reproducible_and_plain():
    from endoscopy_tpu.cli.split_data import split_dataframe

    df = pd.DataFrame({"image": [f"{i}.jpg" for i in range(50)],
                       "target": [i % 3 for i in range(50)]})
    a = split_dataframe(df, seed=7)
    b = split_dataframe(df, seed=7)
    assert (a["is_valid"] == b["is_valid"]).all()
    assert int(a["is_valid"].sum()) == 10
    assert "is_labeled" not in a.columns


def test_eda_cli_describes_manifest(tmp_path, capsys):
    """cli.eda mirrors the reference EDA notebooks' value_counts flows:
    class counts, train/valid + mock-SSL breakdowns, imbalance ratio."""
    from endoscopy_tpu.cli.eda import describe, main

    df = pd.DataFrame({
        "image": [f"i{i}.jpg" for i in range(20)],
        "target": [0] * 12 + [1] * 6 + [2] * 2,
        "is_valid": [True, False] * 10,
        "is_labeled": [True] * 10 + [False] * 10,
    })
    csv = tmp_path / "anno.csv"
    df.to_csv(csv, index=False)

    stats = describe(df)
    assert stats["rows"] == 20
    assert stats["classes"] == {0: 12, 1: 6, 2: 2}
    assert stats["imbalance_ratio"] == 6.0
    assert stats["train_rows"] == 10 and stats["valid_rows"] == 10
    assert stats["labeled_rows"] + stats["unlabeled_rows"] == 10

    out = tmp_path / "dist.png"
    main(["--csv", str(csv), "--chart", str(out)])
    printed = capsys.readouterr().out
    assert "imbalance_ratio: 6.0" in printed
    assert out.is_file() and out.stat().st_size > 0


@pytest.mark.slow
def test_etpu_platform_env_overrides_backend():
    """ETPU_PLATFORM=cpu must pin a fresh process to the CPU backend even on
    hosts whose sitecustomize overwrites JAX_PLATFORMS at `import jax` time
    (the config-update route in endoscopy_tpu/__init__ beats the env var)."""
    import subprocess
    import sys

    env = dict(os.environ, ETPU_PLATFORM="cpu", ETPU_CPU_DEVICES="2")
    out = subprocess.run(
        [sys.executable, "-c",
         "import endoscopy_tpu, jax; print(jax.devices())"],
        env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-800:]
    assert "CpuDevice(id=0)" in out.stdout and "CpuDevice(id=1)" in out.stdout
