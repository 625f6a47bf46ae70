"""Serve predictions from an exported artifact — no model code or checkpoint.

Loads a ``cli.export_model`` artifact, decodes a CSV of image paths through
the canonical pipeline (cv2 BGR→RGB bilinear, the exact training contract),
and writes per-image predictions. With ``--thres`` the output follows the
reference's thresholded pseudo-label rule ``pred = argmax × [max_prob >
THRES]`` (supervised.py:238-268); otherwise ``pred = argmax`` plus
``max_prob``. The ragged final batch is zero-padded to ``--batch`` and the
pad rows dropped, so pinned-batch artifacts work and symbolic-batch
artifacts compile exactly one batch size.

Usage::

    python -m endoscopy_tpu.cli.infer --model model.jaxexport \
        --images in.csv --root <image_root> --out preds.csv \
        [--size 134] [--column image] [--batch 32] [--thres 0.9]

``--size``/``--batch`` default to the contract recorded in the artifact
itself (``load_exported`` exposes ``input_size``/``batch``/``num_classes``);
passing mismatching values fails fast instead of feeding wrong shapes.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

from endoscopy_tpu.serve.export import load_exported


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--images", required=True,
                        help="CSV with an image-path column")
    parser.add_argument("--root", default="",
                        help="prefix joined to each image path")
    parser.add_argument("--out", required=True)
    parser.add_argument("--size", type=int, default=None,
                        help="canonical input edge; defaults to the size "
                             "recorded in the artifact itself")
    parser.add_argument("--column", default="image")
    parser.add_argument("--batch", type=int, default=None,
                        help="serving batch; defaults to the artifact's "
                             "pinned batch, else 32")
    parser.add_argument("--thres", type=float, default=None,
                        help="emit pred = argmax * [max_prob > thres]")
    args = parser.parse_args(argv)

    from endoscopy_tpu.data.pipeline import decode_canonical

    infer = load_exported(args.model)
    if args.size is None:
        args.size = infer.input_size
    elif args.size != infer.input_size:
        raise SystemExit(
            f"--size {args.size} does not match the artifact's input edge "
            f"{infer.input_size}")
    if args.batch is None:
        args.batch = infer.batch or 32
    elif infer.batch is not None and args.batch != infer.batch:
        raise SystemExit(
            f"--batch {args.batch} does not match the artifact's pinned "
            f"batch {infer.batch}")
    df = pd.read_csv(args.images)
    paths = [os.path.join(args.root, p) if args.root else p
             for p in df[args.column].astype(str)]

    preds, maxp = [], []
    for lo in range(0, len(paths), args.batch):
        chunk = paths[lo:lo + args.batch]
        batch = np.stack([decode_canonical(p, args.size) for p in chunk])
        # Pad the ragged final batch to --batch: pinned-batch artifacts
        # (export_model --batch N) reject other sizes, and symbolic-batch
        # artifacts would pay a second compile for the ragged size.
        if len(chunk) < args.batch:
            pad = np.zeros((args.batch - len(chunk),) + batch.shape[1:],
                           batch.dtype)
            batch = np.concatenate([batch, pad], axis=0)
        probs = infer(batch)[:len(chunk)]
        preds.append(np.argmax(probs, axis=-1))
        maxp.append(np.max(probs, axis=-1))
    preds = np.concatenate(preds) if preds else np.zeros(0, np.int64)
    maxp = np.concatenate(maxp) if maxp else np.zeros(0, np.float32)

    out = df.copy()
    if args.thres is not None:
        out["pred"] = preds * (maxp > args.thres)
    else:
        out["pred"] = preds
        out["max_prob"] = maxp
    out.to_csv(args.out, index=False)
    print(f"wrote {len(out)} predictions to {args.out}")


if __name__ == "__main__":
    main()
