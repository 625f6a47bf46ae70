"""Transfer-learning pipeline: MODEL.PRE_TRAIN_PATH consumption, the
abnormal→pathology surgery (build.py:180-194), and progressive-resizing
weight carry (learn.py:40-55)."""

import numpy as np
import pandas as pd
import pytest

from endoscopy_tpu.ckpt.transfer import apply_pretrain, carry_stage_weights
from endoscopy_tpu.config.loader import default_config
from endoscopy_tpu.data.manifest import build_supervised_manifests
from endoscopy_tpu.data.pipeline import CanonicalLoader, EvalLoader, canonical_size
from endoscopy_tpu.data.synthetic import make_synthetic_dataset
from endoscopy_tpu.models import build_model
from endoscopy_tpu.train.supervised import SupLearning

IMG = 32


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_transfer"))
    return make_synthetic_dataset(root, num_classes=4, n_train=16, n_valid=8,
                                  n_unlabeled=8, img_size=48)


def make_config(img_root, num_classes=4, img_size=IMG, **overrides):
    cfg = default_config()
    cfg.DATA.PATH = img_root
    cfg.DATA.IMG_SIZE = img_size
    cfg.DATA.BATCH_SIZE = 8
    cfg.MODEL.NUM_CLASSES = num_classes
    cfg.MODEL.NAME = "resnet_tiny"
    cfg.TRAIN.DTYPE = "float32"
    cfg.TRAIN.EVAL_STEP = 1
    cfg.TRAIN.EPOCHS = 1
    cfg.TRAIN.SAVE_CP = ""
    for k, v in overrides.items():
        section, key = k.split(".")
        cfg[section][key] = v
    return cfg


def make_trainer(dataset, cfg):
    img_root, anno_csv, _, _ = dataset
    df = pd.read_csv(anno_csv)
    train_m, valid_m, cls_num_list = build_supervised_manifests(cfg, df)
    size = canonical_size(cfg)
    train_dl = CanonicalLoader(train_m, cfg.DATA.BATCH_SIZE, size, seed=0)
    valid_dl = EvalLoader(valid_m, cfg.DATA.BATCH_SIZE, size)
    # synthetic targets are 0..3; a 2-class donor only needs valid logits
    targets = np.clip(train_m.targets, 0, cfg.MODEL.NUM_CLASSES - 1)
    trainer = SupLearning(model=build_model(cfg), opt_func="Adam")
    trainer.get_dataloader(train_dl, valid_dl)
    trainer.get_config(cfg, cls_num_list=cls_num_list[:cfg.MODEL.NUM_CLASSES],
                       labeled_targets=targets)
    return trainer


def _backbone_leaves(params):
    import jax
    return [np.asarray(x) for x in jax.tree.leaves(params["backbone"])]


def test_orbax_abnormal_to_pathology_transfer(dataset, tmp_path):
    """Train-free surgery: a 2-class donor checkpoint initializes a 4-class
    model's trunk; the head keeps its fresh init; EMA syncs."""
    donor_cfg = make_config(dataset[0], num_classes=2, **{"TRAIN.SEED": 7})
    donor = make_trainer(dataset, donor_cfg)
    donor.epoch = 1
    ckpt_path = donor.save_checkpoint(str(tmp_path))

    cfg = make_config(dataset[0], num_classes=4,
                      **{"MODEL.PRE_TRAIN_PATH": ckpt_path,
                         "TRAIN.USE_EMA": True})
    trainer = make_trainer(dataset, cfg)
    fresh_head = np.asarray(trainer.state.params["head"]["fc"]["kernel"])

    assert apply_pretrain(trainer, cfg) is True

    for got, want in zip(_backbone_leaves(trainer.state.params),
                         _backbone_leaves(donor.state.params)):
        np.testing.assert_array_equal(got, want)
    # 4-class head kept fresh (shape differs from the 2-class donor head)
    np.testing.assert_array_equal(
        np.asarray(trainer.state.params["head"]["fc"]["kernel"]), fresh_head)
    # EMA teacher re-synced to the transferred weights (ema.py:44-49)
    import jax
    for e, p in zip(jax.tree.leaves(trainer.state.ema_params),
                    jax.tree.leaves(trainer.state.params)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(p))


def test_torch_pth_transfer(dataset, tmp_path):
    """A reference-format .pth checkpoint drives the same surgery through
    the torch key map."""
    torch = pytest.importorskip("torch")

    from endoscopy_tpu.ckpt.torch_import import export_resnet_torch_state

    donor = make_trainer(dataset, make_config(dataset[0], num_classes=2,
                                              **{"TRAIN.SEED": 3}))
    sd = export_resnet_torch_state(donor.state.params, donor.state.batch_stats,
                                   stage_sizes=(1, 1, 1, 1))
    pth = str(tmp_path / "abnormal.pth")
    torch.save({"model_state_dict": {k: torch.from_numpy(np.asarray(v))
                                     for k, v in sd.items()}}, pth)

    cfg = make_config(dataset[0], num_classes=4,
                      **{"MODEL.PRE_TRAIN_PATH": pth})
    trainer = make_trainer(dataset, cfg)
    assert apply_pretrain(trainer, cfg) is True
    for got, want in zip(_backbone_leaves(trainer.state.params),
                         _backbone_leaves(donor.state.params)):
        np.testing.assert_allclose(got, want, atol=0)


def test_pretrain_flag_without_path_warns_and_noops(dataset, capsys):
    cfg = make_config(dataset[0], **{"MODEL.PRE_TRAIN": True})
    trainer = make_trainer(dataset, cfg)
    before = _backbone_leaves(trainer.state.params)
    assert apply_pretrain(trainer, cfg) is False
    assert "RANDOM init" in capsys.readouterr().out
    for got, want in zip(_backbone_leaves(trainer.state.params), before):
        np.testing.assert_array_equal(got, want)


def test_progressive_resize_carries_parameters(dataset):
    """Stage 2 (different IMG_SIZE) starts from stage 1's weights —
    learn.py:40-55 builds the model once and keeps training it."""
    stage1 = make_trainer(dataset, make_config(dataset[0], img_size=32))
    stage1.train_one(epoch=1)  # make weights != fresh init

    stage2 = make_trainer(dataset, make_config(dataset[0], img_size=48,
                                               **{"TRAIN.USE_EMA": True}))
    carry_stage_weights(stage2, stage1.state.params, stage1.state.batch_stats)

    import jax
    for got, want in zip(jax.tree.leaves(stage2.state.params),
                         jax.tree.leaves(stage1.state.params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for e, p in zip(jax.tree.leaves(stage2.state.ema_params),
                    jax.tree.leaves(stage2.state.params)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(p))


@pytest.mark.slow  # two-stage CLI run ≈ 54 s; the unit-level carry test
# above stays in the fast tier
def test_cli_progressive_resizing_end_to_end(dataset, tmp_path, monkeypatch):
    """python -m endoscopy_tpu.cli.learn --config-1 a.yaml --config-2 b.yaml
    runs both stages and threads the carry (cli/learn.py:main)."""
    import yaml

    from endoscopy_tpu.cli import learn as learn_cli

    img_root, anno_csv, _, _ = dataset
    carried = {}
    real_carry = learn_cli.run_config

    def spy_run_config(config, model=None, trainer_override=None,
                       carry_state=None, **kw):
        if carry_state is not None:
            carried["state"] = carry_state
        return real_carry(config, model=model,
                          trainer_override=trainer_override,
                          carry_state=carry_state, **kw)

    monkeypatch.setattr(learn_cli, "run_config", spy_run_config)

    paths = []
    for i, size in enumerate((32, 48)):
        cfg = {"DATA": {"PATH": img_root, "ANNO": anno_csv, "IMG_SIZE": size,
                        "BATCH_SIZE": 8, "NUM_WORKERS": 0},
               "MODEL": {"NAME": "resnet_tiny", "NUM_CLASSES": 4},
               "TRAIN": {"IS_SSL": False, "EPOCHS": 1, "EVAL_STEP": 1,
                         "DTYPE": "float32", "SAVE_CP": "",
                         "STEPS_PER_CALL": 1}}
        p = str(tmp_path / f"stage{i}.yaml")
        with open(p, "w") as f:
            yaml.safe_dump(cfg, f)
        paths.append(p)

    learn_cli.main(["--config-1", paths[0], "--config-2", paths[1]])
    assert "state" in carried  # stage 2 received stage 1's weights


@pytest.mark.slow  # 132 s — 36% of the whole fast tier (PARITY.md budget)
def test_cli_progressive_resizing_ssl_end_to_end(dataset, tmp_path,
                                                 monkeypatch):
    """The reference's progressive-resizing pairs are FixMatch SSL runs
    (kaggle_semisupervised_real_3_1.yaml 112px -> kaggle_semisupervised_
    real_3.yaml 224px, learn.py:40-55): both SSL stages must run and stage 2
    must start from stage 1's carried parameters."""
    import yaml

    from endoscopy_tpu.cli import learn as learn_cli

    img_root, anno_csv, _, _ = dataset
    carried = {}
    real_carry = learn_cli.run_config

    def spy_run_config(config, model=None, trainer_override=None,
                       carry_state=None, **kw):
        if carry_state is not None:
            carried["state"] = carry_state
        return real_carry(config, model=model,
                          trainer_override=trainer_override,
                          carry_state=carry_state, **kw)

    monkeypatch.setattr(learn_cli, "run_config", spy_run_config)

    paths = []
    for i, size in enumerate((32, 48)):
        cfg = {"DATA": {"PATH": img_root, "ANNO": anno_csv, "IMG_SIZE": size,
                        "BATCH_SIZE": 8, "NUM_WORKERS": 0,
                        "MOCKUP_SSL": True, "MU": 2},
               "MODEL": {"NAME": "resnet_tiny", "NUM_CLASSES": 4,
                         "TYPE_SEMI": "FixMatch"},
               "TRAIN": {"IS_SSL": True, "EPOCHS": 1, "EVAL_STEP": 2,
                         "DTYPE": "float32", "SAVE_CP": "",
                         "STEPS_PER_CALL": 1}}
        p = str(tmp_path / f"ssl_stage{i}.yaml")
        with open(p, "w") as f:
            yaml.safe_dump(cfg, f)
        paths.append(p)

    learn_cli.main(["--config-1", paths[0], "--config-2", paths[1]])
    assert "state" in carried  # stage 2 received stage 1's weights
