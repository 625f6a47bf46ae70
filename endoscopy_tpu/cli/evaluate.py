"""Evaluation entry point (reference: Eval_v1.ipynb flows).

Loads a checkpoint, runs validation with the reference's reporting options —
metric dict, classification report (per-class P/R/F1), confusion matrix
(fixmatch.py:169-177) — and optionally dumps the misclassified-sample mask
(supervised.py:198-236, Eval_v1.ipynb cells 21-25).

Usage::

    python -m endoscopy_tpu.cli.evaluate --config <yaml> --checkpoint <dir> \
        [--report] [--confusion out.png] [--misclassified out.csv]
"""

from __future__ import annotations

import argparse

import numpy as np
import pandas as pd

from endoscopy_tpu.cli.learn import build_data, make_trainer
from endoscopy_tpu.config.loader import get_config
from endoscopy_tpu.models import build_model


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--report", action="store_true")
    parser.add_argument("--confusion", default=None,
                        help="write confusion-matrix heatmap PNG here")
    parser.add_argument("--misclassified", default=None,
                        help="write misclassified validation rows here")
    args = parser.parse_args(argv)

    config = get_config(args.config)
    train_dl, valid_dl, cls_num_list, labeled_targets = build_data(
        config, config.MODEL.TYPE_SEMI)
    trainer = make_trainer(config, build_model(config))
    trainer.get_dataloader(train_dl, valid_dl)
    if config.TRAIN.IS_SSL:
        trainer.get_config(config, labeled_targets=labeled_targets)
    else:
        trainer.get_config(config, cls_num_list=cls_num_list,
                           labeled_targets=labeled_targets)
    trainer.load_checkpoint(args.checkpoint, is_train=False)

    valid_loss, metric = trainer.evaluate_one(show_metric=True,
                                              show_report=args.report)
    print(f"Valid Loss: {valid_loss.avg:.4f}")
    print(f"macro-F1: {metric['macro/f1']:.4f}")
    print(metric["sen/spec"])

    if args.confusion or args.misclassified:
        params, batch_stats = trainer._eval_params()
        preds, targets = [], []
        for batch_u8, t, mask in trainer.valid_dl:
            _, _, probs = trainer._eval_step(
                params, batch_stats, *trainer._shard(batch_u8, t, mask))
            keep = np.asarray(mask)
            probs = trainer._fetch_batch_rows(probs, len(keep))
            preds.append(probs.argmax(axis=1)[keep])
            targets.append(np.asarray(t)[keep])
        preds = np.concatenate(preds)
        targets = np.concatenate(targets)

        if args.confusion:
            from endoscopy_tpu.eval.visualize import show_cfs_matrix
            show_cfs_matrix(targets, preds, int(config.MODEL.NUM_CLASSES),
                            save_path=args.confusion)
            print("wrote", args.confusion)

        if args.misclassified:
            wrong = preds != targets
            df = pd.DataFrame({
                "path": trainer.valid_dl.manifest.paths[: len(wrong)][wrong],
                "target": targets[wrong],
                "pred": preds[wrong],
            })
            df.to_csv(args.misclassified, index=False)
            print(f"wrote {args.misclassified}: {wrong.sum()} misclassified")


if __name__ == "__main__":
    main()
