"""Macro-F1 parity runbook: run BASELINE.md configs 1-5 and emit the table.

The reference optimizes and checkpoints on Hyper-Kvasir macro-F1
(/root/reference/code/supervised.py:344-358). Its images are not present in
this build environment, so the dataset-level parity table could never be
produced here — this tool is the ONE COMMAND that produces it the day a
data-bearing TPU VM is available (VERDICT r3 item 5):

    # real data (Hyper-Kvasir + Kvasir-Capsule trees under DATA_ROOT, laid
    # out as ./data is in the reference configs: DATA_ROOT/hyper_kvasir/...,
    # DATA_ROOT/kvasir_capsule/...):
    python tools/run_parity.py --data-root /path/to/data --out PARITY_TABLE_REAL.md

    # plumbing validation on synthetic data (runs in CI; scaled-down
    # stand-ins of all five rows through the same code path):
    python tools/run_parity.py --synthetic --out /tmp/parity_table.md

Rows (BASELINE.md "Baselines to measure with real data"):
  1. supervised ResNet-50            configs/local_supervised.yaml
  2. FixMatch (real unlabeled pool)  configs/kaggle_semisupervised_real_3_1.yaml
  3. CoMatch                         configs/kaggle_semisupervised_real_1.yaml
  4. SemiFormer                      configs/kaggle_semisupervised_real_2.yaml
  5. Kvasir-Capsule EZBM transfer    configs/kvasir_capsule_transfer.yaml

Pretrained-donor note: rows 2-5 chain from earlier supervised checkpoints
(MODEL.PRE_TRAIN_PATH). When the donor checkpoint is absent the row still
runs with PRE_TRAIN disabled and the table says so — produce donors first
with row 1 / the abnormal configs for reference-faithful numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROWS = [
    (1, "supervised_resnet50", "configs/local_supervised.yaml", None),
    (2, "fixmatch_real_pool", "configs/kaggle_semisupervised_real_3_1.yaml",
     None),
    (3, "comatch", "configs/kaggle_semisupervised_real_1.yaml", None),
    (4, "semiformer", "configs/kaggle_semisupervised_real_2.yaml", None),
    (5, "capsule_ezbm", "configs/kvasir_capsule_transfer.yaml", "ezbm"),
]


def _rebase(path: str, data_root: str) -> str:
    """'./data/hyper_kvasir/x' -> '<data_root>/hyper_kvasir/x'."""
    p = path.replace("\\", "/")
    if p.startswith("./data/"):
        return os.path.join(data_root, p[len("./data/"):])
    return path


def _prepare_real(config, name: str, data_root: str, work_dir: str):
    notes = []
    for key in ("PATH", "ANNO", "UNANNO_PATH", "UNANNO"):
        if config.DATA.get(key):
            config.DATA[key] = _rebase(str(config.DATA[key]), data_root)
    pre = config.MODEL.get("PRE_TRAIN_PATH")
    if config.MODEL.get("PRE_TRAIN") and pre:
        if not os.path.exists(str(pre)):
            notes.append(f"donor checkpoint '{pre}' absent; ran PRE_TRAIN=False")
            config.MODEL.PRE_TRAIN = False
    config.TRAIN.LOG_DIR = os.path.join(work_dir, name, "logs")
    config.TRAIN.SAVE_CP = os.path.join(work_dir, name, "ckpt")
    return config, notes


def _best_f1(trainer, log_dir: str):
    """Max metric/macro_f1 across the run: JSONL first, trainer attr
    fallback (EZBM logs only through its best_valid_score tracker)."""
    best = None
    if log_dir and os.path.isdir(log_dir):
        for fn in os.listdir(log_dir):
            if not fn.endswith(".jsonl"):
                continue
            with open(os.path.join(log_dir, fn)) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                    except ValueError:
                        continue
                    v = rec.get("metric/macro_f1")
                    if v is not None:
                        best = v if best is None else max(best, v)
    if best is None:
        v = getattr(trainer, "best_valid_score", None)
        best = float(v) if v is not None else None
    return best


def _synthetic_rows(work_dir: str):
    """Scaled-down stand-ins of all five rows on generated data — validates
    the exact plumbing (config -> run_config -> trainer -> table) in CI."""
    import pandas as pd
    import yaml

    from endoscopy_tpu.data.synthetic import make_synthetic_dataset

    img_root, anno_csv, unl_root, unanno_csv = make_synthetic_dataset(
        os.path.join(work_dir, "synth"), num_classes=4, n_train=32,
        n_valid=12, n_unlabeled=16, img_size=40)
    # capsule-schema copy (column 'path') for the EZBM row
    df = pd.read_csv(anno_csv).rename(columns={"image": "path"})
    capsule_csv = os.path.join(work_dir, "synth", "fold_0.csv")
    df.to_csv(capsule_csv, index=False)

    base_data = {"PATH": img_root, "ANNO": anno_csv, "IMG_SIZE": 32,
                 "BATCH_SIZE": 8, "MOCKUP_SSL": True, "MU": 2,
                 "IS_CROP": True, "NUM_WORKERS": 0}
    base_train = {"EPOCHS": 2, "EVAL_STEP": 4, "FREQ_EVAL": 1,
                  "DTYPE": "float32", "STEPS_PER_CALL": 1, "MESH_DATA": 1,
                  "SAVE_CP": ""}

    def cfg(name, type_semi, is_ssl, extra_model=None, extra_train=None,
            extra_data=None):
        y = {"DATA": dict(base_data, **(extra_data or {})),
             "MODEL": dict({"NAME": "resnet_tiny", "NUM_CLASSES": 4,
                            "TYPE_SEMI": type_semi}, **(extra_model or {})),
             "TRAIN": dict(base_train, IS_SSL=is_ssl, **(extra_train or {}))}
        path = os.path.join(work_dir, f"{name}.yaml")
        with open(path, "w") as f:
            yaml.safe_dump(y, f)
        return path

    return [
        (1, "supervised_resnet50",
         cfg("supervised", "FixMatch", False), None),
        (2, "fixmatch_real_pool",
         cfg("fixmatch", "FixMatch", True), None),
        (3, "comatch",
         cfg("comatch", "CoMatch", True,
             extra_model={"LOW_DIM": 8}), None),
        (4, "semiformer",
         cfg("semiformer", "SemiFormer", True,
             extra_model={"NAME": "conformer", "EMBED_DIM": 24, "DEPTH": 3,
                          "NUM_HEADS": 2, "MLP_RATIO": 2.0},
             extra_data={"IMG_SIZE": 64},
             extra_train={"EVAL_STEP_SUP": 1}), None),
        (5, "capsule_ezbm",
         cfg("ezbm", "FixMatch", False,
             extra_model={"IS_TRIPLET": True, "LOW_DIM": 8},
             extra_train={"CLS_WEIGHT": True, "USE_EMA": False,
                          "LAMBDA_C": 4.0, "EXPANSION": "balance"},
             extra_data={"ANNO": capsule_csv, "INPUT_NAME": "path"}),
         "ezbm"),
    ]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--data-root", default=None,
                    help="dataset root (hyper_kvasir/, kvasir_capsule/)")
    ap.add_argument("--synthetic", action="store_true",
                    help="generate synthetic data; validate plumbing only")
    ap.add_argument("--out", default="PARITY_TABLE_REAL.md")
    ap.add_argument("--work-dir", default="./parity_runs")
    ap.add_argument("--rows", default="1,2,3,4,5",
                    help="comma-separated row numbers to run")
    args = ap.parse_args(argv)
    if not args.synthetic and not args.data_root:
        ap.error("--data-root is required unless --synthetic")

    # Absolute work dir: synthetic rows write configs under it and the main
    # loop re-reads them — a CWD-relative path would be re-joined onto REPO
    # below and break when invoked from outside the repo root.
    args.work_dir = os.path.abspath(args.work_dir)
    os.makedirs(args.work_dir, exist_ok=True)
    want = {int(r) for r in args.rows.split(",")}

    from endoscopy_tpu.cli.learn import run_config
    from endoscopy_tpu.config.loader import get_config

    rows = _synthetic_rows(args.work_dir) if args.synthetic else ROWS
    results = []
    for num, name, cfg_path, trainer_override in rows:
        if num not in want:
            continue
        config = get_config(os.path.join(REPO, cfg_path)
                            if not os.path.isabs(cfg_path) else cfg_path)
        notes = []
        if args.synthetic:
            config.TRAIN.LOG_DIR = os.path.join(args.work_dir, name, "logs")
            notes.append("synthetic plumbing run (not a parity number)")
        else:
            config, notes = _prepare_real(config, name, args.data_root,
                                          args.work_dir)
        print(f"=== parity row {num}: {name} ({cfg_path}) ===", flush=True)
        t0 = time.time()
        trainer, _ = run_config(config, trainer_override=trainer_override)
        f1 = _best_f1(trainer, config.TRAIN.get("LOG_DIR"))
        results.append({"row": num, "name": name, "config": cfg_path,
                        "epochs": int(config.TRAIN.EPOCHS),
                        "best_macro_f1": f1,
                        "minutes": (time.time() - t0) / 60.0,
                        "notes": "; ".join(notes)})

    lines = [
        "# Macro-F1 parity table",
        "",
        f"Mode: {'synthetic plumbing validation' if args.synthetic else 'REAL data'}"
        f" | generated by tools/run_parity.py",
        "",
        "| # | run | config | epochs | best macro-F1 | wall (min) | notes |",
        "|---|-----|--------|--------|---------------|------------|-------|",
    ]
    for r in results:
        f1 = "n/a" if r["best_macro_f1"] is None else f"{r['best_macro_f1']:.4f}"
        lines.append(
            f"| {r['row']} | {r['name']} | `{r['config']}` | {r['epochs']} "
            f"| {f1} | {r['minutes']:.1f} | {r['notes']} |")
    table = "\n".join(lines) + "\n"
    with open(args.out, "w") as f:
        f.write(table)
    print(table)
    return 0


if __name__ == "__main__":
    sys.exit(main())
