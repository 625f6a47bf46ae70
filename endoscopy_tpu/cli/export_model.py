"""Export a trained checkpoint to a self-contained serving artifact.

The deployment counterpart of the reference's Inference.ipynb: instead of
re-running the training stack to predict, lower the eval forward once
(weights baked in, symbolic batch dim, cpu+tpu lowerings) and ship one file.

Usage::

    python -m endoscopy_tpu.cli.export_model --config <yaml> \
        --checkpoint <ckpt_dir | latest> --out model.jaxexport \
        [--batch N] [--platforms cpu,tpu]

``--checkpoint latest`` resolves the newest complete checkpoint under
TRAIN.SAVE_CP. Serve with ``endoscopy_tpu.cli.infer`` or
``endoscopy_tpu.serve.load_exported``.
"""

from __future__ import annotations

import argparse

from endoscopy_tpu.config.loader import get_config
from endoscopy_tpu.serve.export import export_model


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True,
                        help="checkpoint dir, or 'latest' under TRAIN.SAVE_CP")
    parser.add_argument("--out", required=True)
    parser.add_argument("--batch", type=int, default=None,
                        help="pin the batch dim (default: symbolic, any size)")
    parser.add_argument("--platforms", default="cpu,tpu")
    parser.add_argument("--quantize", default=None, choices=["int8"],
                        help="weight-only PTQ: int8 kernel constants with "
                             "in-graph dequant (~4x smaller artifact)")
    args = parser.parse_args(argv)

    config = get_config(args.config)
    ckpt = args.checkpoint
    if ckpt == "latest":
        from endoscopy_tpu.ckpt.orbax_io import latest_checkpoint

        ckpt = latest_checkpoint(config.TRAIN.SAVE_CP)
        if ckpt is None:
            raise FileNotFoundError(
                f"no complete checkpoint under {config.TRAIN.SAVE_CP}")
    size, n_classes = export_model(
        config, ckpt, args.out, platforms=args.platforms.split(","),
        batch=args.batch, quantize=args.quantize)
    quant = f", {args.quantize} weights" if args.quantize else ""
    print(f"exported {ckpt} -> {args.out} "
          f"(input uint8 [b,{size},{size},3], output f32 [b,{n_classes}]"
          f"{quant})")


if __name__ == "__main__":
    main()
