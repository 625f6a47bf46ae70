"""Real-TPU compile smoke for every RandAugment kernel configuration.

VERDICT r4 item 2: both flag-gated kernel candidates passed interpret-mode
verification but died in Mosaic (`tpu_compile_helper exit 1`) on the real
toolchain — interpret mode validates semantics only, none of Mosaic's
layout/lowering legality. This tool compiles + runs each configuration on
the attached TPU with tiny batches and prints the FULL diagnostic for any
failure, so a kernel config can never ship TPU-unverified again.

Usage:
    python tools/pallas_compile_smoke.py [--img 224] [--only <name>]

Configs covered (x = the axes that differ in production):
    io dtype (f32 / bf16) x crop fusion (off / roll path) x image size
    (112 / --img). The two round-4 candidates this matrix originally
    diagnosed are resolved: the dynamic-sublane-slice crop path was removed
    (Mosaic requires provably 8-aligned dynamic sublane starts) and bf16
    block I/O was fixed by upcasting to f32 in VMEM before the crop
    rotations (sublane dynamic_rotate has no packed-16-bit lowering). Raw
    diagnostics: perf_runs/2026-08-19_pallas_smoke.log.

`tests/test_pallas_kernel.py::test_tpu_compile_smoke_all_configs` runs the
same matrix when a TPU backend is present (slow tier).
"""
from __future__ import annotations

import argparse
import sys
import traceback

sys.path.insert(0, ".")


def configs(img: int):
    # (name, io_dtype, crop_mode, size); crop_mode: None | "roll"
    for size in sorted({112, img}):
        for dt in ("f32", "bf16"):
            for crop in (None, "roll"):
                yield f"{dt}-crop_{crop or 'off'}-{size}", dt, crop, size


def run_one(name: str, dt: str, crop: str | None, size: int) -> tuple[bool, str]:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from endoscopy_tpu.ops import randaugment_kernel as rk

    dtype = jnp.float32 if dt == "f32" else jnp.bfloat16
    key = jax.random.PRNGKey(0)
    b = 4
    if crop is None:
        x = jnp.asarray(np.random.randint(0, 256, (b, size, size, 3)), dtype)
        out = rk._randaugment_mc_pallas(x, key)
    else:
        pad = size + 2 * (size // 8)  # reflect-padded input, production-like
        x = jnp.asarray(np.random.randint(0, 256, (b, pad, pad, 3)), dtype)
        tops = jnp.asarray(np.random.randint(0, pad - size, (b,)), jnp.int32)
        lefts = jnp.asarray(np.random.randint(0, pad - size, (b,)), jnp.int32)
        out = rk._randaugment_mc_pallas(
            x, key, crop_offsets=(tops, lefts), crop_size=size)
    np.asarray(out[0, 0, 0])  # force execution
    return True, f"ok shape={out.shape} dtype={out.dtype}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--only", type=str, default=None)
    args = ap.parse_args()

    import jax
    print("backend:", jax.default_backend(), jax.devices())
    failures = []
    for name, dt, crop, size in configs(args.img):
        if args.only and args.only not in name:
            continue
        try:
            ok, msg = run_one(name, dt, crop, size)
            print(f"[{name:24s}] {msg}", flush=True)
        except Exception as e:  # noqa: BLE001 - we want the full diagnostic
            failures.append(name)
            print(f"[{name:24s}] FAILED: {type(e).__name__}", flush=True)
            traceback.print_exc()
            print("-" * 70, flush=True)
    if failures:
        print("FAILED configs:", failures)
        sys.exit(1)
    print("all configs compile + run")


if __name__ == "__main__":
    main()
