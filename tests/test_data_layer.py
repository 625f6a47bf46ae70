"""Manifest / loader / synthetic-dataset contracts (data/ package).

These lock the host input-pipeline API that every trainer and CLI consumes:
split semantics (dataset.py:314-444), canonical sizing (dataset.py:30-36),
the RandomSampler-recycle batch contract (fixmatch.py:91-100), pad-and-mask
eval batching, and the sample(indices) random-access protocol.
"""

import numpy as np
import pandas as pd
import pytest

from endoscopy_tpu.config.loader import default_config
from endoscopy_tpu.data.manifest import (
    Manifest,
    build_ssl_manifests,
    build_supervised_manifests,
    get_cls_num_list,
    shard_for_host,
)
from endoscopy_tpu.data.pipeline import CanonicalLoader, EvalLoader, canonical_size
from endoscopy_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data_layer"))
    return make_synthetic_dataset(root, num_classes=3, n_train=18, n_valid=6,
                                  n_unlabeled=5, img_size=40)


@pytest.fixture(scope="module")
def cfg(dataset):
    img_root, _, _, _ = dataset
    c = default_config()
    c.DATA.PATH = img_root
    c.DATA.IMG_SIZE = 32
    c.MODEL.NUM_CLASSES = 3
    return c


def test_synthetic_schema(dataset):
    _, anno_csv, _, unanno_csv = dataset
    df = pd.read_csv(anno_csv)
    assert set(df.columns) == {"image", "target", "is_valid", "is_labeled"}
    assert df.is_valid.sum() == 6 and len(df) == 24
    # every class has labeled AND unlabeled train rows (mock-SSL split)
    train = df[~df.is_valid]
    for cls in range(3):
        rows = train[train.target == cls]
        assert rows.is_labeled.any() and (~rows.is_labeled).any()
    udf = pd.read_csv(unanno_csv)
    assert set(udf.columns) == {"image", "pred"} and (udf["pred"] == 1).all()


def test_split_builders(cfg, dataset):
    _, anno_csv, unl_root, unanno_csv = dataset
    df = pd.read_csv(anno_csv)
    train_m, valid_m, cls_num_list = build_supervised_manifests(cfg, df)
    assert len(train_m) == 18 and len(valid_m) == 6
    assert cls_num_list == [6, 6, 6]
    assert get_cls_num_list(train_m.targets, 5) == [6, 6, 6, 0, 0]

    lab, unl, val, cnl = build_ssl_manifests(cfg, df)
    assert len(lab) + len(unl) == 18 and len(val) == 6
    assert (unl.targets == 0).all()  # unlabeled pools carry no label

    # real-SSL branch: unlabeled comes from the UNANNO csv's pred==1 rows
    c2 = cfg.copy()
    c2.DATA.MOCKUP_SSL = False
    c2.DATA.UNANNO_PATH = unl_root
    lab2, unl2, _, _ = build_ssl_manifests(c2, df, pd.read_csv(unanno_csv))
    assert len(lab2) == 18 and len(unl2) == 5


def test_canonical_size(cfg):
    assert canonical_size(cfg) == int(32 * 1.2)
    c = cfg.copy()
    c.DATA.IS_CROP = False
    assert canonical_size(c) == 32
    c.DATA.IS_CROP = True
    c.DATA.IMG_SIZE = 112
    assert canonical_size(c) == 134  # bench/loader canonical for the flagship


def test_canonical_loader_contract(cfg, dataset):
    _, anno_csv, _, _ = dataset
    df = pd.read_csv(anno_csv)
    m = Manifest.from_df(df[~df.is_valid], cfg.DATA.PATH)
    size = canonical_size(cfg)

    dl = CanonicalLoader(m, 4, size, seed=0)
    it = iter(dl)
    seen = []
    # infinite wrap-around: 6 batches of 4 > 18 rows without StopIteration
    for _ in range(6):
        imgs, targets = next(it)
        assert imgs.shape == (4, size, size, 3) and imgs.dtype == np.uint8
        assert targets.shape == (4,)
        seen.append(targets)
    # same seed reproduces the exact batch sequence
    dl2 = CanonicalLoader(m, 4, size, seed=0)
    for ref, (imgs, targets) in zip(seen, dl2):
        np.testing.assert_array_equal(ref, targets)
    # cached and streaming agree pixel-exactly
    idx = np.array([1, 4, 17])
    streaming = CanonicalLoader(m, 4, size, cache=False, seed=0, num_workers=0)
    np.testing.assert_array_equal(dl.sample(idx), streaming.sample(idx))


def test_cache_limit_degrades_to_streaming(cfg, dataset, capsys):
    _, anno_csv, _, _ = dataset
    df = pd.read_csv(anno_csv)
    m = Manifest.from_df(df, cfg.DATA.PATH)
    dl = CanonicalLoader(m, 4, 38, cache=True, cache_limit_bytes=1024)
    assert dl._cache is None  # degraded
    assert "streaming instead" in capsys.readouterr().out
    imgs, _ = next(iter(dl))
    assert imgs.shape == (4, 38, 38, 3)


def test_eval_loader_pad_and_mask(cfg, dataset):
    _, anno_csv, _, _ = dataset
    df = pd.read_csv(anno_csv)
    m = Manifest.from_df(df[df.is_valid], cfg.DATA.PATH)  # 6 rows
    ev = EvalLoader(m, 4, 38)
    batches = list(ev)
    assert len(batches) == len(ev) == 2
    (i1, t1, m1), (i2, t2, m2) = batches
    assert i1.shape == i2.shape == (4, 38, 38, 3)
    assert m1.all() and m2.tolist() == [True, True, False, False]
    np.testing.assert_array_equal(t1, m.targets[:4])


def test_shard_for_host_strided(monkeypatch, cfg, dataset):
    import endoscopy_tpu.data.manifest as mod

    _, anno_csv, _, _ = dataset
    df = pd.read_csv(anno_csv)
    m = Manifest.from_df(df, cfg.DATA.PATH)
    assert shard_for_host(m) is m  # single process: no-op
    monkeypatch.setattr(mod.jax, "process_count", lambda: 2)
    monkeypatch.setattr(mod.jax, "process_index", lambda: 1)
    sm = shard_for_host(m)
    assert len(sm) == len(m) // 2
    np.testing.assert_array_equal(sm.targets, m.targets[1::2])


def test_preprocess_ops():
    from endoscopy_tpu.data.preprocess import (
        crop_square,
        elliptical_deformation,
        resize_aspect_ratio,
    )

    img = np.zeros((100, 160, 3), np.uint8)
    img[20:80, 40:140] = 200  # bright content region in a black frame
    out = crop_square(img)
    assert out.shape[0] == out.shape[1] == 60

    r = resize_aspect_ratio(img, min_edge=50)
    assert min(r.shape[:2]) == 50 and r.shape[1] == 80

    grad = (np.mgrid[0:60, 0:60][0][..., None] * np.ones(3) * 4).astype(np.uint8)
    d = elliptical_deformation(grad, strength=0.0)
    np.testing.assert_array_equal(d, grad)  # strength 0 is the identity
    d2 = elliptical_deformation(grad, strength=0.3)
    assert d2.shape == grad.shape and not np.array_equal(d2, grad)
