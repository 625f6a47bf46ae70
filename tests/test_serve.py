"""Serving subsystem: AOT export (jax.export) of the eval forward.

The artifact must be self-contained (weights baked in), batch-size-symbolic,
numerically identical to the trainers' eval path, and must select EMA
weights when the checkpoint carries them (fixmatch.py:137-140 eval-on-EMA).
"""

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.slow  # heavy tier

from endoscopy_tpu.config.loader import default_config
from endoscopy_tpu.data.synthetic import make_synthetic_dataset

IMG = 32


def make_config(img_root, **overrides):
    cfg = default_config()
    cfg.DATA.PATH = img_root
    cfg.DATA.IMG_SIZE = IMG
    cfg.DATA.BATCH_SIZE = 8
    cfg.MODEL.NUM_CLASSES = 4
    cfg.MODEL.NAME = "resnet_tiny"
    cfg.TRAIN.DTYPE = "float32"
    cfg.TRAIN.USE_EMA = False
    cfg.TRAIN.SAVE_CP = ""
    for k, v in overrides.items():
        section, key = k.split(".")
        cfg[section][key] = v
    return cfg


def _save_state(cfg, ckpt_root, mutate_ema=False):
    """Create a fresh TrainState (optionally with a perturbed EMA copy) and
    save it as an epoch_1 checkpoint, returning its path."""
    import jax
    import jax.numpy as jnp

    from endoscopy_tpu.ckpt.orbax_io import save_checkpoint
    from endoscopy_tpu.data.pipeline import canonical_size
    from endoscopy_tpu.models import build_model
    from endoscopy_tpu.optim.schedules import build_schedule
    from endoscopy_tpu.train.state import create_train_state

    model = build_model(cfg)
    size = canonical_size(cfg)
    state, _ = create_train_state(
        model, jnp.zeros((1, size, size, 3), jnp.float32),
        cfg.TRAIN.OPT_NAME, build_schedule(cfg, n_iter_per_epoch=1),
        use_ema=bool(cfg.TRAIN.USE_EMA))
    if mutate_ema:
        state = state.replace(
            ema_params=jax.tree.map(lambda x: x * 0.5, state.params))
    path = save_checkpoint(str(ckpt_root), "epoch_1", state,
                           {"epoch": 1}, block=True)
    return model, state, path


def test_export_roundtrip_symbolic_batch(dataset_root, tmp_path):
    """Exported probs == the live eval forward, at two different batch
    sizes through ONE symbolic-batch artifact."""
    import jax.numpy as jnp

    from endoscopy_tpu.data.pipeline import canonical_size
    from endoscopy_tpu.serve.export import (export_model, load_exported,
                                            make_infer_fn)

    cfg = make_config(dataset_root)
    model, state, ckpt = _save_state(cfg, tmp_path / "cp")
    out = tmp_path / "model.jaxexport"
    size, n_classes = export_model(cfg, ckpt, str(out), platforms=("cpu",))
    assert size == canonical_size(cfg) and n_classes == 4

    infer = load_exported(str(out))
    live = make_infer_fn(model, state.params, state.batch_stats, IMG,
                         jnp.float32)
    rng = np.random.default_rng(0)
    for b in (4, 7):  # symbolic batch: ragged sizes, no recompile/pad
        batch = rng.integers(0, 255, (b, size, size, 3)).astype(np.uint8)
        got = infer(batch)
        assert got.shape == (b, 4)
        np.testing.assert_allclose(got.sum(axis=-1), 1.0, rtol=1e-5)
        np.testing.assert_allclose(got, np.asarray(live(batch)), atol=1e-5)


def test_export_uses_ema_weights(dataset_root, tmp_path):
    """A checkpoint trained with EMA serves the EMA weights, not the raw
    params (the reference evaluates/infers on the EMA model)."""
    import jax.numpy as jnp

    from endoscopy_tpu.serve.export import (export_model, load_exported,
                                            make_infer_fn)

    cfg = make_config(dataset_root, **{"TRAIN.USE_EMA": True})
    model, state, ckpt = _save_state(cfg, tmp_path / "cp", mutate_ema=True)
    out = tmp_path / "m.jaxexport"
    size, _ = export_model(cfg, ckpt, str(out), platforms=("cpu",))

    batch = np.random.default_rng(1).integers(
        0, 255, (4, size, size, 3)).astype(np.uint8)
    got = load_exported(str(out))(batch)
    ema_live = make_infer_fn(model, state.ema_params, state.ema_batch_stats,
                             IMG, jnp.float32)(batch)
    raw_live = make_infer_fn(model, state.params, state.batch_stats,
                             IMG, jnp.float32)(batch)
    np.testing.assert_allclose(got, np.asarray(ema_live), atol=1e-5)
    assert not np.allclose(got, np.asarray(raw_live), atol=1e-5)


def test_multiplatform_export_and_cli(dataset_root, tmp_path):
    """cpu+tpu lowering in one artifact; export + infer CLIs end-to-end on a
    CSV of image paths (thresholded pseudo-label rule included)."""
    from endoscopy_tpu.cli import export_model as export_cli
    from endoscopy_tpu.cli import infer as infer_cli

    cfg = make_config(dataset_root, **{"TRAIN.SAVE_CP": str(tmp_path / "cp")})
    _model, _state, _ckpt = _save_state(cfg, tmp_path / "cp")

    import yaml
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump({k: dict(v) for k, v in cfg.items()}, f)

    out = tmp_path / "model.jaxexport"
    export_cli.main(["--config", str(cfg_path), "--checkpoint", "latest",
                     "--out", str(out), "--platforms", "cpu,tpu"])
    assert out.stat().st_size > 0

    # serve a CSV through the canonical decode path
    import os
    files = []
    for root, _, names in os.walk(dataset_root):
        files.extend(os.path.relpath(os.path.join(root, n), dataset_root)
                     for n in names if n.endswith(".jpg"))
    files = sorted(files)[:10]
    csv = tmp_path / "imgs.csv"
    pd.DataFrame({"image": files}).to_csv(csv, index=False)

    from endoscopy_tpu.data.pipeline import canonical_size
    preds = tmp_path / "preds.csv"
    infer_cli.main(["--model", str(out), "--images", str(csv),
                    "--root", dataset_root, "--out", str(preds),
                    "--size", str(canonical_size(cfg)), "--batch", "4"])
    got = pd.read_csv(preds)
    assert len(got) == len(files)
    assert got["pred"].between(0, 3).all()
    assert got["max_prob"].between(0.0, 1.0).all()

    # thresholded pseudo-label mode (supervised.py:238-268)
    infer_cli.main(["--model", str(out), "--images", str(csv),
                    "--root", dataset_root, "--out", str(preds),
                    "--size", str(canonical_size(cfg)), "--thres", "0.99"])
    got = pd.read_csv(preds)
    assert "max_prob" not in got.columns
    assert got["pred"].between(0, 3).all()


def test_infer_cli_pinned_batch_ragged_csv(dataset_root, tmp_path):
    """A pinned-batch artifact (export_model --batch N) must serve a CSV
    whose row count is not a multiple of N: the infer CLI zero-pads the
    ragged final batch and drops the pad rows."""
    import os

    from endoscopy_tpu.cli import infer as infer_cli
    from endoscopy_tpu.data.pipeline import canonical_size
    from endoscopy_tpu.serve.export import export_model

    cfg = make_config(dataset_root)
    _model, _state, ckpt = _save_state(cfg, tmp_path / "cp")
    out = tmp_path / "pinned.jaxexport"
    size, _ = export_model(cfg, ckpt, str(out), platforms=("cpu",), batch=4)

    files = []
    for root, _, names in os.walk(dataset_root):
        files.extend(os.path.relpath(os.path.join(root, n), dataset_root)
                     for n in names if n.endswith(".jpg"))
    files = sorted(files)[:6]  # 6 rows: ragged final chunk of 2 vs batch 4
    assert len(files) == 6
    csv = tmp_path / "imgs.csv"
    pd.DataFrame({"image": files}).to_csv(csv, index=False)

    # no --size/--batch: the CLI reads the contract from the artifact itself
    preds = tmp_path / "preds.csv"
    infer_cli.main(["--model", str(out), "--images", str(csv),
                    "--root", dataset_root, "--out", str(preds)])
    got = pd.read_csv(preds)
    assert len(got) == 6
    assert got["pred"].between(0, 3).all()
    assert got["max_prob"].between(0.0, 1.0).all()

    # mismatching explicit values fail fast
    with pytest.raises(SystemExit):
        infer_cli.main(["--model", str(out), "--images", str(csv),
                        "--root", dataset_root, "--out", str(preds),
                        "--size", str(canonical_size(cfg) + 6)])
    with pytest.raises(SystemExit):
        infer_cli.main(["--model", str(out), "--images", str(csv),
                        "--root", dataset_root, "--out", str(preds),
                        "--batch", "8"])


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("serve_synth"))
    img_root, _, _, _ = make_synthetic_dataset(
        root, num_classes=4, n_train=16, n_valid=8, n_unlabeled=8,
        img_size=40)
    return img_root


def test_export_int8_quantized(dataset_root, tmp_path):
    """--quantize int8 ships int8 kernel constants: the artifact must be
    materially smaller than the full-precision export, agree with it to
    quantization tolerance, and keep the argmax decision on every sample."""
    from endoscopy_tpu.serve.export import export_model, load_exported

    cfg = make_config(dataset_root)
    _model, _state, ckpt = _save_state(cfg, tmp_path / "cp")
    full, quant = tmp_path / "full.jaxexport", tmp_path / "int8.jaxexport"
    size, _ = export_model(cfg, ckpt, str(full), platforms=("cpu",))
    export_model(cfg, ckpt, str(quant), platforms=("cpu",), quantize="int8")

    # kernels dominate this f32 export; int8 storage must show up in the file
    assert quant.stat().st_size < 0.55 * full.stat().st_size, (
        quant.stat().st_size, full.stat().st_size)

    f_full, f_quant = load_exported(str(full)), load_exported(str(quant))
    rng = np.random.default_rng(3)
    batch = rng.integers(0, 255, (16, size, size, 3)).astype(np.uint8)
    p_full, p_quant = f_full(batch), f_quant(batch)
    np.testing.assert_allclose(p_quant.sum(axis=-1), 1.0, rtol=1e-5)
    # per-channel W8A-f32 PTQ: softmax probs stay close, decisions identical
    np.testing.assert_allclose(p_quant, p_full, atol=0.03)
    np.testing.assert_array_equal(p_quant.argmax(-1), p_full.argmax(-1))

    with pytest.raises(ValueError, match="unknown quantize mode"):
        export_model(cfg, ckpt, str(quant), platforms=("cpu",),
                     quantize="int4")


def test_export_honors_is_reprod(dataset_root, tmp_path):
    """A DATA.IS_REPROD checkpoint must export the reproduce eval transform
    (resize + mean/std-0.5), not the ImageNet center-crop — the artifact's
    eval semantics must match the trainer's eval step."""
    import jax.numpy as jnp

    from endoscopy_tpu.serve.export import (export_model, load_exported,
                                            make_infer_fn)

    cfg = make_config(dataset_root, **{"DATA.IS_REPROD": True})
    model, state, ckpt = _save_state(cfg, tmp_path / "cp")
    out = tmp_path / "reprod.jaxexport"
    size, _ = export_model(cfg, ckpt, str(out), platforms=("cpu",))

    batch = np.random.default_rng(2).integers(
        0, 255, (4, size, size, 3)).astype(np.uint8)
    got = load_exported(str(out))(batch)
    reprod_live = make_infer_fn(model, state.params, state.batch_stats, IMG,
                                jnp.float32, is_reprod=True)(batch)
    imagenet_live = make_infer_fn(model, state.params, state.batch_stats,
                                  IMG, jnp.float32)(batch)
    np.testing.assert_allclose(got, np.asarray(reprod_live), atol=1e-5)
    assert not np.allclose(got, np.asarray(imagenet_live), atol=1e-5)
