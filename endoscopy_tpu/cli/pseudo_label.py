"""Stage-2 of the real-SSL pipeline: pseudo-label the unlabeled pool.

Reference flow (SURVEY.md §3.4, Train.ipynb cells 20-23): a trained binary
abnormal classifier runs ``inference()`` over the full unlabeled Hyper-Kvasir
pool, emitting ``pred = argmax * [max_prob > THRES]`` per image
(supervised.py:238-268); the result CSV (image, pred) becomes DATA.UNANNO for
the FixMatch/CoMatch real-SSL configs, which train on ``pred == 1`` rows
(dataset.py:374).

Usage::

    python -m endoscopy_tpu.cli.pseudo_label --config configs/abnorm.yaml \
        --checkpoint <ckpt_dir> --unlabeled-csv in.csv --out out.csv
"""

from __future__ import annotations

import argparse

import pandas as pd

from endoscopy_tpu.config.loader import get_config
from endoscopy_tpu.data.manifest import Manifest, build_supervised_manifests
from endoscopy_tpu.data.pipeline import CanonicalLoader, EvalLoader, canonical_size
from endoscopy_tpu.models import build_model
from endoscopy_tpu.train.supervised import SupLearning


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--unlabeled-csv", required=True)
    parser.add_argument("--unlabeled-root", default=None,
                        help="defaults to DATA.UNANNO_PATH")
    parser.add_argument("--out", required=True)
    args = parser.parse_args(argv)

    config = get_config(args.config)
    df_anno = pd.read_csv(config.DATA.ANNO)
    train_m, valid_m, cls_num_list = build_supervised_manifests(config, df_anno)
    size = canonical_size(config)

    trainer = SupLearning(model=build_model(config),
                          opt_func=config.TRAIN.OPT_NAME)
    trainer.get_dataloader(
        CanonicalLoader(train_m, config.DATA.BATCH_SIZE, size, cache=False),
        EvalLoader(valid_m, config.DATA.BATCH_SIZE, size, cache=False))
    trainer.get_config(config, cls_num_list=cls_num_list,
                       labeled_targets=train_m.targets)
    trainer.load_checkpoint(args.checkpoint, is_train=False)

    df_unl = pd.read_csv(args.unlabeled_csv)
    root = args.unlabeled_root or config.DATA.UNANNO_PATH
    unl_m = Manifest.from_df(df_unl, root, config.DATA.INPUT_NAME,
                             target_name=None)
    unl_dl = EvalLoader(unl_m, config.DATA.BATCH_SIZE, size, cache=False)

    preds = trainer.inference(unl_dl)
    df_unl = df_unl.copy()
    df_unl["pred"] = [preds[i] for i in range(len(df_unl))]
    df_unl.to_csv(args.out, index=False)
    kept = int((df_unl["pred"] == 1).sum())
    print(f"wrote {args.out}: {kept}/{len(df_unl)} rows pass pred==1")


if __name__ == "__main__":
    main()
