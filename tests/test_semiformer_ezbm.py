"""SemiFormer (Conformer dual-head) and EZBM trainer tests, tiny shapes."""

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.slow  # heavy tier: run fast suite with -m 'not slow'

import jax
import jax.numpy as jnp

from endoscopy_tpu.config.loader import default_config
from endoscopy_tpu.data.manifest import build_ssl_manifests, build_supervised_manifests
from endoscopy_tpu.data.pipeline import CanonicalLoader, EvalLoader, canonical_size
from endoscopy_tpu.data.synthetic import make_synthetic_dataset
from endoscopy_tpu.models.conformer import Conformer
from endoscopy_tpu.models.modelwemb import ModelwEmb
from endoscopy_tpu.models.resnet import ResNet
from endoscopy_tpu.train.ezbm import EZBM
from endoscopy_tpu.train.semiformer import SemiFormer


def tiny_conformer(num_classes=4):
    return Conformer(num_classes=num_classes, patch_size=16, channel_ratio=1,
                     embed_dim=24, depth=3, num_heads=2, mlp_ratio=2.0,
                     dtype=jnp.float32)


def test_conformer_dual_head_contract():
    """(conv_cls, trans_cls) tuple (models/conformer.py:418-444)."""
    model = tiny_conformer()
    x = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3))
    vars_ = model.init(jax.random.key(1), x, train=False)
    conv_cls, trans_cls = model.apply(vars_, x, train=False)
    assert conv_cls.shape == (2, 4)
    assert trans_cls.shape == (2, 4)
    # cls_token exists and is excluded from weight decay (ndim check)
    assert vars_["params"]["cls_token"].shape == (1, 1, 24)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sf"))
    return make_synthetic_dataset(root, num_classes=4, n_train=24, n_valid=8,
                                  n_unlabeled=8, img_size=72)


def make_cfg(img_root, img_size):
    cfg = default_config()
    cfg.DATA.PATH = img_root
    cfg.DATA.IMG_SIZE = img_size
    cfg.DATA.BATCH_SIZE = 4
    cfg.DATA.MU = 2
    cfg.MODEL.NUM_CLASSES = 4
    cfg.TRAIN.DTYPE = "float32"
    cfg.TRAIN.SAVE_CP = ""
    cfg.TRAIN.MESH_DATA = 4
    return cfg


def test_semiformer_both_phases(dataset):
    img_root, anno_csv, _, _ = dataset
    cfg = make_cfg(img_root, 64)
    cfg.TRAIN.IS_SSL = True
    cfg.MODEL.TYPE_SEMI = "SemiFormer"
    cfg.TRAIN.EVAL_STEP = 2
    cfg.TRAIN.EVAL_STEP_SUP = 1  # epoch 0 = warmup, epoch >= 1 = fixmatch

    df = pd.read_csv(anno_csv)
    labeled, unlabeled, valid, _ = build_ssl_manifests(cfg, df)
    size = canonical_size(cfg)
    trainer = SemiFormer(model=tiny_conformer(), opt_func="Adam")
    trainer.get_dataloader(
        (CanonicalLoader(labeled, cfg.DATA.BATCH_SIZE, size),
         CanonicalLoader(unlabeled, cfg.DATA.BATCH_SIZE * cfg.DATA.MU, size, seed=1)),
        EvalLoader(valid, cfg.DATA.BATCH_SIZE, size))
    trainer.get_config(cfg, labeled_targets=labeled.targets)

    warm = trainer.train_one(epoch=0)   # warmup phase (semiformer.py:72-100)
    assert np.isfinite(warm.avg)
    fm = trainer.train_one(epoch=1)     # fixmatch phase (semiformer.py:101-145)
    assert np.isfinite(fm.avg)

    vl, metric = trainer.evaluate_one()  # summed-logit eval
    assert np.isfinite(vl.avg)


def test_ezbm_two_stages(dataset):
    img_root, anno_csv, _, _ = dataset
    cfg = make_cfg(img_root, 32)
    cfg.TRAIN.IS_SSL = False
    cfg.MODEL.IS_TRIPLET = True
    cfg.TRAIN.EPOCHS = 2
    cfg.TRAIN.FREQ_EVAL = 1
    cfg.TRAIN.LAMBDA_C = 4.0

    df = pd.read_csv(anno_csv)
    train_m, valid_m, cls_num_list = build_supervised_manifests(cfg, df)
    size = canonical_size(cfg)
    backbone = ResNet(stage_sizes=(1, 1, 1, 1), num_filters=8, dtype=jnp.float32)
    model = ModelwEmb(backbone=backbone, num_classes=4, low_dim=16)
    trainer = EZBM(model=model, opt_func="Adam")
    trainer.get_dataloader(CanonicalLoader(train_m, cfg.DATA.BATCH_SIZE, size),
                           EvalLoader(valid_m, cfg.DATA.BATCH_SIZE, size))
    trainer.get_config(cfg, cls_num_list=cls_num_list,
                       labeled_targets=train_m.targets)

    s1 = trainer.train_one_stage_1(epoch=1)
    assert np.isfinite(s1.avg)
    assert len(trainer.mem_features) == trainer.n_iter_per_epoch

    # stage 2 setup mirrors fit(): fresh optimizer, fc-only mask
    from endoscopy_tpu.optim import build_optimizer
    trainer._tx2 = build_optimizer(trainer.state.params, "Adam",
                                   trainer.lr_schedule)
    trainer._opt_state2 = trainer._tx2.init(trainer.state.params)
    backbone_before = jax.tree.leaves(trainer.state.params["backbone"])
    s2 = trainer.train_one_stage_2(epoch=1)
    assert np.isfinite(s2.avg)
    backbone_after = jax.tree.leaves(trainer.state.params["backbone"])
    # frozen backbone unchanged in stage 2 (ezbm.py:390-392)
    assert all(np.array_equal(b, a) for b, a in zip(backbone_before, backbone_after))


def test_ezbm_lam_semantics():
    """lam = n_i/(n_i+n_j); balance→0.5, reverse→1-lam (ezbm.py:156-162)."""
    counts = np.array([100.0, 10.0])
    y = np.array([0, 1])
    yd = np.array([1, 0])
    lam = counts[y] / (counts[y] + counts[yd])
    np.testing.assert_allclose(lam, [100 / 110, 10 / 110])
    np.testing.assert_allclose(1 - lam, [10 / 110, 100 / 110])
