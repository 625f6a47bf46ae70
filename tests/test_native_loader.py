"""Native C++ loader: builds, decodes real JPEGs, matches cv2 within
resampling tolerance, and respects the batch contract."""

import numpy as np
import pandas as pd
import pytest

from endoscopy_tpu.data.manifest import Manifest
from endoscopy_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("native"))
    return make_synthetic_dataset(root, num_classes=3, n_train=20, n_valid=4,
                                  n_unlabeled=4, img_size=56)


def test_native_loader_batches(dataset):
    from endoscopy_tpu.data.native_loader import NativeCanonicalLoader

    img_root, anno_csv, _, _ = dataset
    df = pd.read_csv(anno_csv)
    m = Manifest.from_df(df, img_root)
    loader = NativeCanonicalLoader(m, batch_size=8, size=48, num_threads=2)
    it = iter(loader)
    imgs, targets = next(it)
    assert imgs.shape == (8, 48, 48, 3) and imgs.dtype == np.uint8
    assert targets.shape == (8,)
    assert imgs.std() > 0  # decoded real content
    imgs2, _ = next(it)
    assert not np.array_equal(imgs, imgs2)
    loader.close()


def test_native_decode_matches_cv2(dataset):
    import cv2

    from endoscopy_tpu.data.native_loader import NativeCanonicalLoader

    img_root, anno_csv, _, _ = dataset
    df = pd.read_csv(anno_csv).head(1)
    m = Manifest.from_df(df, img_root)
    loader = NativeCanonicalLoader(m, batch_size=1, size=48, num_threads=1,
                                   shuffle=False)
    imgs, _ = next(iter(loader))
    ref = cv2.cvtColor(cv2.imread(m.paths[0]), cv2.COLOR_BGR2RGB)
    ref = cv2.resize(ref, (48, 48), interpolation=cv2.INTER_LINEAR)
    diff = np.abs(imgs[0].astype(int) - ref.astype(int))
    # decoders/resamplers differ by a few LSB
    assert np.mean(diff) < 4.0, np.mean(diff)
    loader.close()


def test_sample_protocol_all_loaders(tmp_path):
    """sample(indices) returns identical decoded rows for cached, streaming,
    and native loaders — the triplet/EZBM random-access contract."""
    from endoscopy_tpu.data.manifest import Manifest
    from endoscopy_tpu.data.pipeline import CanonicalLoader
    from endoscopy_tpu.data.synthetic import make_synthetic_dataset

    img_root, anno_csv, _, _ = make_synthetic_dataset(
        str(tmp_path), num_classes=3, n_train=9, n_valid=3, n_unlabeled=3,
        img_size=40)
    import pandas as pd
    df = pd.read_csv(anno_csv)
    m = Manifest.from_df(df[~df["is_valid"]], img_root)
    idx = np.asarray([0, 3, 5])

    cached = CanonicalLoader(m, 4, 32, cache=True)
    streaming = CanonicalLoader(m, 4, 32, cache=False)
    np.testing.assert_array_equal(cached.sample(idx), streaming.sample(idx))

    try:
        from endoscopy_tpu.data.native_loader import NativeCanonicalLoader
        native = NativeCanonicalLoader(m, 4, 32)
    except RuntimeError:
        return  # toolchain/libjpeg unavailable: cv2-backed loaders suffice
    native_rows = native.sample(idx)
    assert native_rows.shape == (3, 32, 32, 3)
    # native decode is libjpeg+own bilinear vs cv2: allow small pixel drift
    diff = np.abs(native_rows.astype(np.int32)
                  - cached.sample(idx).astype(np.int32))
    assert diff.mean() < 8.0
    native.close()


@pytest.mark.slow  # full triplet-training e2e through the C++ loader ≈ 40 s
def test_triplet_training_with_streaming_and_native_loader(tmp_path):
    """MODEL.IS_TRIPLET trains through loaders without a RAM cache
    (VERDICT weak-6: used to crash on loader internals)."""
    import pandas as pd

    from endoscopy_tpu.config.loader import default_config
    from endoscopy_tpu.data.manifest import build_supervised_manifests
    from endoscopy_tpu.data.pipeline import CanonicalLoader, EvalLoader
    from endoscopy_tpu.data.synthetic import make_synthetic_dataset
    from endoscopy_tpu.models import build_model
    from endoscopy_tpu.train.supervised import SupLearning

    img_root, anno_csv, _, _ = make_synthetic_dataset(
        str(tmp_path), num_classes=3, n_train=12, n_valid=6, n_unlabeled=3,
        img_size=40)
    cfg = default_config()
    cfg.DATA.PATH = img_root
    cfg.DATA.IMG_SIZE = 32
    cfg.DATA.BATCH_SIZE = 4
    cfg.MODEL.NUM_CLASSES = 3
    cfg.MODEL.NAME = "resnet_tiny"
    cfg.MODEL.IS_TRIPLET = True
    cfg.MODEL.LOW_DIM = 8
    cfg.TRAIN.DTYPE = "float32"
    cfg.TRAIN.EPOCHS = 1
    cfg.TRAIN.STEPS_PER_CALL = 1
    cfg.TRAIN.MESH_DATA = 1  # triplet concat (3B=12) not divisible by 8

    df = pd.read_csv(anno_csv)
    train_m, valid_m, cls_num_list = build_supervised_manifests(cfg, df)

    loaders = [CanonicalLoader(train_m, 4, 32, cache=False, seed=0)]
    try:
        from endoscopy_tpu.data.native_loader import NativeCanonicalLoader
        loaders.append(NativeCanonicalLoader(train_m, 4, 32, seed=0))
    except RuntimeError:
        pass
    for train_dl in loaders:
        trainer = SupLearning(model=build_model(cfg), opt_func="Adam")
        trainer.get_dataloader(train_dl, EvalLoader(valid_m, 4, 32))
        trainer.get_config(cfg, cls_num_list=cls_num_list,
                           labeled_targets=train_m.targets)
        loss = trainer.train_one(epoch=1)
        assert np.isfinite(loss.avg)


def test_corrupt_files_are_loud(tmp_path):
    """Robustness contract for corrupt inputs: the infinite stream stays
    fixed-shape but WARNS about skipped files (silent data loss is not
    allowed), sample() RAISES naming the bad row (a specific-row request
    cannot be substituted), and an all-corrupt manifest raises instead of
    blocking forever on an empty queue."""
    import cv2

    from endoscopy_tpu.data.native_loader import NativeCanonicalLoader

    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        p = str(tmp_path / f"{i}.jpg")
        cv2.imwrite(p, rng.integers(0, 255, (48, 48, 3), np.uint8))
        paths.append(p)
    open(paths[3], "wb").close()  # zero-byte file
    m = Manifest(paths=np.array(paths, dtype=object),
                 targets=np.arange(6, dtype=np.int64))

    loader = NativeCanonicalLoader(m, batch_size=6, size=32, num_threads=1)
    # the prefetcher may recycle past the bad file several times before the
    # first drain, so the count is >=1 skip EVENTS, not unique files
    with pytest.warns(RuntimeWarning, match=r"skipped \d+ unreadable"):
        imgs, targets = next(iter(loader))
    assert imgs.shape == (6, 32, 32, 3)
    assert (targets != 3).all()  # the corrupt row never enters the stream

    with pytest.raises(RuntimeError, match="could not decode 1 of 2"):
        loader.sample(np.array([0, 3]))
    out = loader.sample(np.array([0, 5]))  # valid rows still work
    assert out.shape == (2, 32, 32, 3) and out.std() > 0
    loader.close()

    for p in paths:  # all-corrupt: raise, don't hang
        open(p, "wb").close()
    loader = NativeCanonicalLoader(m, batch_size=4, size=32, num_threads=1)
    with pytest.raises(RuntimeError, match="no decodable image"):
        next(iter(loader))
    loader.close()
