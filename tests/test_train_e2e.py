"""End-to-end integration: synthetic dataset → trainers run real jitted steps
on the 8-device CPU mesh, loss finite, eval produces metrics, checkpoint
round-trips. Mirrors the reference flow learn.py:26-82 on the MOCKUP_SSL
contract (dataset.py:344-359)."""

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.slow  # heavy tier: run fast suite with -m 'not slow'

from endoscopy_tpu.config.loader import default_config
from endoscopy_tpu.data.manifest import build_ssl_manifests, build_supervised_manifests
from endoscopy_tpu.data.pipeline import CanonicalLoader, EvalLoader, canonical_size
from endoscopy_tpu.data.synthetic import make_synthetic_dataset
from endoscopy_tpu.models import build_model
from endoscopy_tpu.train.fixmatch import FixMatch
from endoscopy_tpu.train.supervised import SupLearning

IMG = 32


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    return make_synthetic_dataset(root, num_classes=4, n_train=32, n_valid=12,
                                  n_unlabeled=24, img_size=48)


def make_config(img_root, **overrides):
    cfg = default_config()
    cfg.DATA.PATH = img_root
    cfg.DATA.IMG_SIZE = IMG
    cfg.DATA.BATCH_SIZE = 8
    cfg.DATA.MU = 2
    cfg.MODEL.NUM_CLASSES = 4
    cfg.MODEL.NAME = "resnet_tiny"
    cfg.TRAIN.DTYPE = "float32"
    cfg.TRAIN.EVAL_STEP = 2
    cfg.TRAIN.EPOCHS = 1
    cfg.TRAIN.SAVE_CP = ""
    for k, v in overrides.items():
        section, key = k.split(".")
        cfg[section][key] = v
    return cfg


def test_supervised_e2e(dataset, tmp_path):
    img_root, anno_csv, _, _ = dataset
    cfg = make_config(img_root)
    df = pd.read_csv(anno_csv)
    train_m, valid_m, cls_num_list = build_supervised_manifests(cfg, df)
    size = canonical_size(cfg)
    train_dl = CanonicalLoader(train_m, cfg.DATA.BATCH_SIZE, size, seed=0)
    valid_dl = EvalLoader(valid_m, cfg.DATA.BATCH_SIZE, size)

    trainer = SupLearning(model=build_model(cfg), opt_func="Adam")
    trainer.get_dataloader(train_dl, valid_dl)
    trainer.get_config(cfg, cls_num_list=cls_num_list,
                       labeled_targets=train_m.targets)
    loss = trainer.train_one(epoch=1)
    assert np.isfinite(loss.avg)

    valid_loss, metric = trainer.evaluate_one()
    assert np.isfinite(valid_loss.avg)
    assert 0.0 <= metric["macro/f1"] <= 1.0

    # checkpoint round-trip restores params exactly
    trainer.epoch = 1
    path = trainer.save_checkpoint(str(tmp_path))
    import jax
    before = jax.tree.leaves(trainer.state.params)
    trainer.state = jax.tree.map(lambda x: x * 0, trainer.state)
    trainer.load_checkpoint(path, is_train=True)
    after = jax.tree.leaves(trainer.state.params)
    assert all(np.allclose(b, a) for b, a in zip(before, after))


def test_fixmatch_e2e(dataset):
    img_root, anno_csv, _, _ = dataset
    cfg = make_config(img_root, **{"TRAIN.IS_SSL": True})
    df = pd.read_csv(anno_csv)
    labeled, unlabeled, valid, _ = build_ssl_manifests(cfg, df)
    assert len(unlabeled) > 0
    size = canonical_size(cfg)
    lab_dl = CanonicalLoader(labeled, cfg.DATA.BATCH_SIZE, size, seed=0)
    unl_dl = CanonicalLoader(unlabeled, cfg.DATA.BATCH_SIZE * cfg.DATA.MU, size, seed=1)
    valid_dl = EvalLoader(valid, cfg.DATA.BATCH_SIZE, size)

    trainer = FixMatch(model=build_model(cfg), opt_func="Adam")
    trainer.get_dataloader((lab_dl, unl_dl), valid_dl)
    trainer.get_config(cfg, labeled_targets=labeled.targets)

    loss = trainer.train_one(epoch=1)
    assert np.isfinite(loss.avg)

    # EMA teacher must differ from student after steps but stay close
    import jax
    p = jax.tree.leaves(trainer.state.params)
    e = jax.tree.leaves(trainer.state.ema_params)
    assert any(not np.allclose(a, b) for a, b in zip(p, e))

    valid_loss, metric = trainer.evaluate_one()
    assert np.isfinite(valid_loss.avg)


def test_pseudo_label_inference(dataset):
    """Stage-1 real-SSL contract: inference() emits argmax×[maxprob>THRES]
    (supervised.py:238-268)."""
    img_root, anno_csv, unl_root, unanno_csv = dataset
    cfg = make_config(img_root)
    df = pd.read_csv(anno_csv)
    train_m, valid_m, cls = build_supervised_manifests(cfg, df)
    size = canonical_size(cfg)
    trainer = SupLearning(model=build_model(cfg), opt_func="Adam")
    trainer.get_dataloader(
        CanonicalLoader(train_m, cfg.DATA.BATCH_SIZE, size),
        EvalLoader(valid_m, cfg.DATA.BATCH_SIZE, size))
    trainer.get_config(cfg, cls_num_list=cls, labeled_targets=train_m.targets)

    from endoscopy_tpu.data.manifest import Manifest
    udf = pd.read_csv(unanno_csv)
    unl_m = Manifest.from_df(udf, unl_root)
    unl_dl = EvalLoader(unl_m, cfg.DATA.BATCH_SIZE, size)
    preds = trainer.inference(unl_dl)
    assert len(preds) == len(unl_m)
    assert all(0 <= v < cfg.MODEL.NUM_CLASSES for v in preds.values())


def test_fit_trains_fresh_run_with_one_epoch(dataset):
    """A FRESH run with TRAIN.EPOCHS == 1 must train its single epoch; only
    a RESUMED trainer already at the final epoch evaluates without training
    (fixmatch.py:238-241)."""
    img_root, anno_csv, _, _ = dataset
    cfg = make_config(img_root, **{"TRAIN.FREQ_EVAL": 5})
    df = pd.read_csv(anno_csv)
    train_m, valid_m, cls_num_list = build_supervised_manifests(cfg, df)
    size = canonical_size(cfg)
    train_dl = CanonicalLoader(train_m, cfg.DATA.BATCH_SIZE, size, seed=0)
    valid_dl = EvalLoader(valid_m, cfg.DATA.BATCH_SIZE, size)

    trainer = SupLearning(model=build_model(cfg), opt_func="Adam")
    trainer.get_dataloader(train_dl, valid_dl)
    trainer.get_config(cfg, cls_num_list=cls_num_list,
                       labeled_targets=train_m.targets)
    assert int(trainer.state.step) == 0
    trainer.fit()
    assert int(trainer.state.step) > 0  # the one epoch actually trained

    # simulate resume-at-final-epoch: eval-only, no further training
    trainer._resumed = True
    trainer.epoch_start = int(cfg.TRAIN.EPOCHS)
    step_before = int(trainer.state.step)
    trainer.fit()
    assert int(trainer.state.step) == step_before


def test_evaluate_cli_e2e(dataset, tmp_path):
    """cli.evaluate drives checkpoint load + report + confusion heatmap +
    misclassified dump end-to-end (Eval_v1.ipynb flows)."""
    import yaml

    from endoscopy_tpu.cli import evaluate as eval_cli
    from endoscopy_tpu.cli import learn as learn_cli

    img_root, anno_csv, _, _ = dataset
    cfg = make_config(img_root)
    cfg.DATA.ANNO = anno_csv
    cfg.TRAIN.IS_SSL = False
    cfg.TRAIN.USE_EMA = False
    cfg.TRAIN.SAVE_CP = str(tmp_path / "cp")
    cfg.TRAIN.FREQ_EVAL = 1
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump({k: dict(v) for k, v in cfg.items()}, f)

    learn_cli.main(["--config-1", str(cfg_path)])
    from endoscopy_tpu.ckpt.orbax_io import latest_checkpoint

    ckpt = latest_checkpoint(cfg.TRAIN.SAVE_CP)
    assert ckpt is not None

    mis = tmp_path / "mis.csv"
    conf = tmp_path / "conf.png"
    eval_cli.main(["--config", str(cfg_path), "--checkpoint", ckpt,
                   "--report", "--confusion", str(conf),
                   "--misclassified", str(mis)])
    assert mis.is_file()
    got = pd.read_csv(mis) if mis.stat().st_size > 1 else None
    # columns contract even when every sample is classified correctly
    if got is not None and len(got):
        assert set(got.columns) == {"path", "target", "pred"}


def test_pseudo_label_cli_e2e(dataset, tmp_path):
    """cli.pseudo_label drives ckpt load + thresholded pseudo-labels to CSV
    (the stage-1 -> stage-2 real-SSL bridge, Train.ipynb cells 20-23)."""
    import yaml

    from endoscopy_tpu.cli import learn as learn_cli
    from endoscopy_tpu.cli import pseudo_label as pl_cli
    from endoscopy_tpu.ckpt.orbax_io import latest_checkpoint

    img_root, anno_csv, unl_root, unanno_csv = dataset
    cfg = make_config(img_root)
    cfg.DATA.ANNO = anno_csv
    cfg.DATA.UNANNO_PATH = unl_root
    cfg.TRAIN.IS_SSL = False
    cfg.TRAIN.USE_EMA = False
    cfg.TRAIN.SAVE_CP = str(tmp_path / "cp")
    cfg.TRAIN.FREQ_EVAL = 1
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump({k: dict(v) for k, v in cfg.items()}, f)

    learn_cli.main(["--config-1", str(cfg_path)])
    ckpt = latest_checkpoint(cfg.TRAIN.SAVE_CP)
    out = tmp_path / "pred.csv"
    pl_cli.main(["--config", str(cfg_path), "--checkpoint", ckpt,
                 "--unlabeled-csv", unanno_csv, "--out", str(out)])
    got = pd.read_csv(out)
    assert "pred" in got.columns and len(got) == len(pd.read_csv(unanno_csv))
    # pred = argmax * [max_prob > THRES]: ints in class range or 0
    assert got["pred"].between(0, cfg.MODEL.NUM_CLASSES - 1).all()


def test_preview_views_ssl_and_triplet(dataset, tmp_path):
    """preview_views renders the reference's is_visual one-batch grids
    (dataset.py:361-368, 427-437; learn.py:51) from the on-device view fns:
    SSL FixMatch -> 3 images, CoMatch -> 4, supervised triplet -> 3."""
    from endoscopy_tpu.cli.learn import build_data
    from endoscopy_tpu.eval.visualize import preview_views

    img_root, anno_csv, _, _ = dataset
    cfg = make_config(img_root)
    cfg.DATA.ANNO = anno_csv
    cfg.DATA.MOCKUP_SSL = True
    cfg.TRAIN.IS_SSL = True
    cfg.MODEL.TYPE_SEMI = "FixMatch"

    train_dl, _, _, _ = build_data(cfg, "FixMatch")
    out = tmp_path / "prev_fm.png"
    imgs = preview_views(cfg, train_dl, save_path=str(out))
    assert len(imgs) == 3
    assert all(np.isfinite(im).all() and im.shape[:2] == (IMG, IMG)
               for im in imgs)

    cfg.MODEL.TYPE_SEMI = "CoMatch"
    train_dl, _, _, _ = build_data(cfg, "CoMatch")
    imgs = preview_views(cfg, train_dl)
    assert len(imgs) == 4

    cfg.TRAIN.IS_SSL = False
    cfg.MODEL.IS_TRIPLET = True
    train_dl, _, _, _ = build_data(cfg)
    imgs = preview_views(cfg, train_dl, save_path=str(tmp_path / "prev_t.png"))
    assert len(imgs) == 3


def test_preview_does_not_consume_loader_rng(dataset):
    """--preview must not change the training batch order: preview_views
    reads through the loaders' random-access sample() protocol, so a seeded
    run with preview trains on the same batches as one without."""
    from endoscopy_tpu.eval.visualize import preview_views

    img_root, anno_csv, _, _ = dataset
    cfg = make_config(img_root)
    cfg.DATA.ANNO = anno_csv
    cfg.TRAIN.IS_SSL = False
    cfg.MODEL.IS_TRIPLET = False
    df = pd.read_csv(anno_csv)
    train_m, _, _ = build_supervised_manifests(cfg, df)
    size = canonical_size(cfg)

    with_prev = CanonicalLoader(train_m, cfg.DATA.BATCH_SIZE, size, seed=0)
    without = CanonicalLoader(train_m, cfg.DATA.BATCH_SIZE, size, seed=0)
    preview_views(cfg, with_prev)

    (img_a, tgt_a) = next(iter(with_prev))
    (img_b, tgt_b) = next(iter(without))
    np.testing.assert_array_equal(tgt_a, tgt_b)
    np.testing.assert_array_equal(img_a, img_b)


def test_supervised_reproduce_mode(dataset):
    """DATA.IS_REPROD selects the paper-reproduction transforms
    (reproduce_transform, dataset.py:111-132) in BOTH the train step and the
    eval step: one epoch runs, loss finite, metrics computed."""
    img_root, anno_csv, _, _ = dataset
    cfg = make_config(img_root, **{"DATA.IS_REPROD": True})
    df = pd.read_csv(anno_csv)
    train_m, valid_m, cls_num_list = build_supervised_manifests(cfg, df)
    size = canonical_size(cfg)
    trainer = SupLearning(model=build_model(cfg), opt_func="Adam")
    trainer.get_dataloader(
        CanonicalLoader(train_m, cfg.DATA.BATCH_SIZE, size, seed=0),
        EvalLoader(valid_m, cfg.DATA.BATCH_SIZE, size))
    trainer.get_config(cfg, cls_num_list=cls_num_list,
                       labeled_targets=train_m.targets)
    loss = trainer.train_one(epoch=1)
    assert np.isfinite(loss.avg)
    valid_loss, metric = trainer.evaluate_one()
    assert np.isfinite(valid_loss.avg)
    assert 0.0 <= metric["macro/f1"] <= 1.0


def test_is_reprod_rejected_outside_supervised(dataset):
    """DATA.IS_REPROD is the supervised paper-reproduction path; SSL/EZBM
    trainers must refuse it loudly instead of silently mismatching train
    and eval transforms."""
    img_root, anno_csv, _, _ = dataset
    cfg = make_config(img_root, **{"DATA.IS_REPROD": True,
                                   "TRAIN.IS_SSL": True})
    df = pd.read_csv(anno_csv)
    labeled, unlabeled, valid, _ = build_ssl_manifests(cfg, df)
    size = canonical_size(cfg)
    trainer = FixMatch(model=build_model(cfg), opt_func="Adam")
    trainer.get_dataloader(
        (CanonicalLoader(labeled, cfg.DATA.BATCH_SIZE, size, seed=0),
         CanonicalLoader(unlabeled, cfg.DATA.BATCH_SIZE * cfg.DATA.MU, size,
                         seed=1)),
        EvalLoader(valid, cfg.DATA.BATCH_SIZE, size))
    with pytest.raises(ValueError, match="IS_REPROD"):
        trainer.get_config(cfg, labeled_targets=labeled.targets)


def test_supervised_margin_branch_e2e(dataset):
    """MODEL.MARGIN selects the angular-penalty branch (reference
    supervised.py:117-119: AngularPenaltySMLoss on backbone features against
    the bias-free fc kernel): one epoch trains, loss finite and decreasing
    over a few epochs, eval produces metrics."""
    img_root, anno_csv, _, _ = dataset
    cfg = make_config(img_root, **{"MODEL.MARGIN": "arcface"})
    df = pd.read_csv(anno_csv)
    train_m, valid_m, cls_num_list = build_supervised_manifests(cfg, df)
    size = canonical_size(cfg)
    trainer = SupLearning(model=build_model(cfg), opt_func="Adam")
    trainer.get_dataloader(
        CanonicalLoader(train_m, cfg.DATA.BATCH_SIZE, size, seed=0),
        EvalLoader(valid_m, cfg.DATA.BATCH_SIZE, size))
    trainer.get_config(cfg, cls_num_list=cls_num_list,
                       labeled_targets=train_m.targets)
    assert trainer.margin == "arcface"  # the branch under test is live
    first = trainer.train_one(epoch=1)
    assert np.isfinite(first.avg)
    last = first
    for epoch in range(2, 5):
        last = trainer.train_one(epoch=epoch)
    assert last.avg < first.avg, (
        f"margin branch not learning: {first.avg} -> {last.avg}")
    valid_loss, metric = trainer.evaluate_one()
    assert np.isfinite(valid_loss.avg)
    assert 0.0 <= metric["macro/f1"] <= 1.0


def test_is_freeze_trains_head_only(dataset):
    """TRAIN.IS_FREEZE freezes the backbone and trains the head only
    (reference freeze policy fixmatch.py:40-52): after one FixMatch step the
    backbone params are bit-identical while head params moved. EMA still
    tracks the full tree."""
    import jax

    img_root, anno_csv, _, _ = dataset
    cfg = make_config(img_root, **{"TRAIN.IS_SSL": True,
                                   "TRAIN.IS_FREEZE": True})
    df = pd.read_csv(anno_csv)
    labeled, unlabeled, valid, _ = build_ssl_manifests(cfg, df)
    size = canonical_size(cfg)
    trainer = FixMatch(model=build_model(cfg), opt_func="Adam")
    trainer.get_dataloader(
        (CanonicalLoader(labeled, cfg.DATA.BATCH_SIZE, size, seed=0),
         CanonicalLoader(unlabeled, cfg.DATA.BATCH_SIZE * cfg.DATA.MU, size,
                         seed=1)),
        EvalLoader(valid, cfg.DATA.BATCH_SIZE, size))
    trainer.get_config(cfg, labeled_targets=labeled.targets)

    before = jax.tree.map(np.asarray, trainer.state.params)
    trainer.train_one(epoch=1)
    after = jax.tree.map(np.asarray, trainer.state.params)

    def flat(tree):
        return {jax.tree_util.keystr(p): v
                for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]}

    b, a = flat(before), flat(after)
    backbone = [k for k in b if k.startswith("['backbone']")]
    head = [k for k in b if not k.startswith("['backbone']")]
    assert backbone and head
    assert all(np.array_equal(b[k], a[k]) for k in backbone), \
        "frozen backbone params moved"
    assert any(not np.array_equal(b[k], a[k]) for k in head), \
        "head params did not train"


def test_rdw_branch_in_trainer(dataset, monkeypatch):
    """TRAIN_RULE=RDW routes per-epoch effective-number weights into the
    step (reference supervised.py:324-331): the trainer consults
    rdw_weights with the CURRENT epoch each train_one call."""
    import endoscopy_tpu.train.supervised as sup_mod

    seen = []
    real = sup_mod.rdw_weights
    monkeypatch.setattr(
        sup_mod, "rdw_weights",
        lambda epoch, cls: (seen.append(epoch), real(epoch, cls))[1])

    img_root, anno_csv, _, _ = dataset
    cfg = make_config(img_root, **{"TRAIN.TRAIN_RULE": "RDW"})
    df = pd.read_csv(anno_csv)
    train_m, valid_m, cls_num_list = build_supervised_manifests(cfg, df)
    size = canonical_size(cfg)
    trainer = SupLearning(model=build_model(cfg), opt_func="Adam")
    trainer.get_dataloader(
        CanonicalLoader(train_m, cfg.DATA.BATCH_SIZE, size, seed=0),
        EvalLoader(valid_m, cfg.DATA.BATCH_SIZE, size))
    trainer.get_config(cfg, cls_num_list=cls_num_list,
                       labeled_targets=train_m.targets)
    trainer.train_one(epoch=1)
    trainer.train_one(epoch=30)
    assert seen == [1, 30]
