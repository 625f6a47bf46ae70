"""Training entry point (reference: learn.py:26-84).

Usage::

    python -m endoscopy_tpu.cli.learn --config-1 configs/foo.yaml \
        [--config-2 configs/bar.yaml]

Two configs run progressive resizing (learn.py:40-55): the model is built
once from the first config; each stage re-jits at its image size with the
same parameters. Trainer dispatch follows learn.py:59-75: TRAIN.IS_SSL picks
FixMatch / CoMatch / SemiFormer by MODEL.TYPE_SEMI, else SupLearning;
MODEL.PRE_TRAIN_RESUME resumes a checkpoint (learn.py:79-81).
"""

from __future__ import annotations

import argparse

import numpy as np
import pandas as pd

from endoscopy_tpu.config.loader import get_config, is_none
from endoscopy_tpu.data.manifest import (
    build_ssl_manifests,
    build_supervised_manifests,
    shard_for_host,
)
from endoscopy_tpu.data.pipeline import CanonicalLoader, EvalLoader, canonical_size
from endoscopy_tpu.models import build_model


def _make_train_loader(manifest, bs, size, seed, workers, config):
    if config.DATA.get("LOADER") == "native":
        from endoscopy_tpu.data.native_loader import NativeCanonicalLoader
        return NativeCanonicalLoader(manifest, bs, size, seed=seed,
                                     num_threads=workers)
    return CanonicalLoader(manifest, bs, size, seed=seed, num_workers=workers)


def build_data(config, type_semi: str = "FixMatch"):
    """get_data equivalent (dataset.py:314-444) returning loaders.

    Multi-host: DATA.BATCH_SIZE is the GLOBAL batch (the reference's
    single-device semantics, dataset.py:352-357); each host loads
    batch/process_count rows from its shard_for_host manifest slice, and
    BaseTrainer._shard assembles the global array over DCN.
    """
    import jax

    df_anno = pd.read_csv(config.DATA.ANNO)
    size = canonical_size(config)
    pc = jax.process_count()
    bs_global = int(config.DATA.BATCH_SIZE)
    if bs_global % max(pc, 1):
        raise ValueError(
            f"DATA.BATCH_SIZE {bs_global} not divisible by process_count {pc}")
    bs = bs_global // max(pc, 1)
    workers = int(config.DATA.NUM_WORKERS)

    if config.TRAIN.IS_SSL:
        df_unanno = None
        if not config.DATA.MOCKUP_SSL:
            df_unanno = pd.read_csv(config.DATA.UNANNO)
        labeled, unlabeled, valid, cls_num_list = build_ssl_manifests(
            config, df_anno, df_unanno)
        # multi-host DP: each host reads its strided manifest slice; the
        # jitted step sees the concatenated global batch (SURVEY.md §2.3).
        # cls_num_list / class weights stay global (computed pre-shard).
        lab_dl = _make_train_loader(shard_for_host(labeled), bs, size, 0,
                                    workers, config)
        unl_dl = _make_train_loader(shard_for_host(unlabeled),
                                    bs * int(config.DATA.MU), size,
                                    1, workers, config)
        valid_dl = EvalLoader(valid, bs, size, num_workers=workers)
        return (lab_dl, unl_dl), valid_dl, cls_num_list, labeled.targets

    train, valid, cls_num_list = build_supervised_manifests(
        config, df_anno, is_full_sup=True)
    train_dl = _make_train_loader(shard_for_host(train), bs, size, 0,
                                  workers, config)
    valid_dl = EvalLoader(valid, bs, size, num_workers=workers)
    return train_dl, valid_dl, cls_num_list, train.targets


def make_trainer(config, model, trainer_override=None):
    """Trainer dispatch (learn.py:59-75); ``trainer_override='ezbm'`` selects
    the EZBM two-stage trainer (the reference drives it from notebooks)."""
    if trainer_override == "ezbm":
        from endoscopy_tpu.train.ezbm import EZBM
        return EZBM(model=model, opt_func=config.TRAIN.OPT_NAME)
    if config.TRAIN.IS_SSL:
        type_semi = config.MODEL.TYPE_SEMI
        if type_semi == "FixMatch":
            from endoscopy_tpu.train.fixmatch import FixMatch
            return FixMatch(model=model, opt_func=config.TRAIN.OPT_NAME)
        if type_semi == "CoMatch":
            from endoscopy_tpu.train.comatch import CoMatch
            return CoMatch(model=model, opt_func=config.TRAIN.OPT_NAME)
        if type_semi == "SemiFormer":
            from endoscopy_tpu.train.semiformer import SemiFormer
            return SemiFormer(model=model, opt_func=config.TRAIN.OPT_NAME)
        raise ValueError(f"unknown TYPE_SEMI {type_semi}")
    from endoscopy_tpu.train.supervised import SupLearning
    return SupLearning(model=model, opt_func=config.TRAIN.OPT_NAME)


def run_config(config, model=None, trainer_override=None, carry_state=None,
               preview=None):
    """One training stage. ``carry_state=(params, batch_stats)`` threads the
    previous progressive-resizing stage's weights into this stage
    (learn.py:40-55: the model is built once; stage 2 trains the SAME
    weights at the new image size). ``preview`` saves a one-batch
    augmentation-view grid PNG before training (the reference renders it
    inline on every run, learn.py:51; headless TPU pods opt in via a path)."""
    type_semi = config.MODEL.TYPE_SEMI
    train_dl, valid_dl, cls_num_list, labeled_targets = build_data(
        config, type_semi)
    if preview:
        from endoscopy_tpu.eval.visualize import preview_views
        preview_views(config, train_dl, save_path=preview)
        print(f"augmentation preview saved to {preview}")
    if model is None:
        model = build_model(config)
    trainer = make_trainer(config, model, trainer_override)
    trainer.get_dataloader(train_dl, valid_dl)
    if config.TRAIN.IS_SSL and trainer_override != "ezbm":
        trainer.get_config(config, labeled_targets=labeled_targets)
    else:
        trainer.get_config(config, cls_num_list=cls_num_list,
                           labeled_targets=labeled_targets)
    from endoscopy_tpu.ckpt.transfer import apply_pretrain, carry_stage_weights
    if carry_state is not None:
        carry_stage_weights(trainer, *carry_state)
    else:
        # abnormal→pathology / ImageNet transfer init (build.py:180-194)
        apply_pretrain(trainer, config)
    if not is_none(config.MODEL.PRE_TRAIN_RESUME):
        trainer.load_checkpoint(config.MODEL.PRE_TRAIN_RESUME, is_train=True)
    trainer.fit()
    return trainer, model


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="endoscopy_tpu training")
    parser.add_argument("--config-1", required=True)
    parser.add_argument("--config-2", default=None,
                        help="second stage for progressive resizing")
    parser.add_argument("--trainer", default=None, choices=[None, "ezbm"],
                        help="override trainer dispatch (e.g. EZBM two-stage)")
    parser.add_argument("--preview", default=None, metavar="PATH.png",
                        help="save a one-batch augmentation-view grid before "
                             "training (reference learn.py:51 is_visual)")
    args = parser.parse_args(argv)

    # SIGTERM (pod preemption/eviction) → checkpoint at the next epoch
    # boundary → exit 143 (resumable via MODEL.PRE_TRAIN_RESUME)
    from endoscopy_tpu.train import preempt
    preempt.install()

    configs = [get_config(args.config_1)]
    if args.config_2:
        configs.append(get_config(args.config_2))

    model = None
    carry_state = None
    for idx, config in enumerate(configs):
        print(f"=== stage {idx} | IMG_SIZE={config.DATA.IMG_SIZE} ===")
        preview = args.preview
        if preview and len(configs) > 1:
            import os
            stem, ext = os.path.splitext(preview)
            preview = f"{stem}_stage{idx}{ext or '.png'}"
        trainer, model = run_config(config, model=model,
                                    trainer_override=args.trainer,
                                    carry_state=carry_state,
                                    preview=preview)
        # progressive resizing carries the trained weights (learn.py:53-55)
        carry_state = (trainer.state.params, trainer.state.batch_stats)
        if preempt.requested():
            print("[preempt] exiting 143 (checkpoint saved; resume with "
                  "MODEL.PRE_TRAIN_RESUME)", flush=True)
            raise SystemExit(143)


if __name__ == "__main__":
    main()
