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
