"""Host input-pipeline throughput microbench (PERF.md open item: can the
1-core host feed the TPU's ~8k img/s?).

Generates an N-image JPEG tree once (cached), then measures decoded
images/sec for each loader mode:

- CanonicalLoader(cache=True)  — steady-state numpy slicing (after one
  full decode pass, timed separately as 'cache build').
- CanonicalLoader(cache=False) — cv2 thread-pool streaming.
- NativeCanonicalLoader        — C++ fread→libjpeg→bilinear core.

Usage: python tools/bench_loader.py [--n 10000] [--size 134] [--batch 224]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_tree(root: str, n: int, src_px: int = 336) -> str:
    """n JPEGs at the reference's preprocessed size (min-edge 336,
    Preprocess.ipynb cell 42)."""
    import cv2
    import numpy as np

    done_marker = os.path.join(root, f".done_{n}_{src_px}")
    if os.path.exists(done_marker):
        return root
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 255, (src_px, src_px, 3), np.uint8)
        cv2.imwrite(os.path.join(root, f"{i}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 85])
    open(done_marker, "w").close()
    return root


def bench_iter(loader, batches: int, batch_size: int) -> float:
    it = iter(loader)
    next(it)  # warm up producer/queue
    t0 = time.perf_counter()
    for _ in range(batches):
        next(it)
    dt = time.perf_counter() - t0
    return batches * batch_size / dt


def main() -> None:
    import numpy as np

    from endoscopy_tpu.data.manifest import Manifest
    from endoscopy_tpu.data.pipeline import CanonicalLoader

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--size", type=int, default=134,
                    help="canonical size (112px * 1.2 crop headroom)")
    ap.add_argument("--batch", type=int, default=224,
                    help="unlabeled SSL batch (B=32 * MU=7)")
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--root", default="./data/loader_bench")
    args = ap.parse_args()

    build_tree(args.root, args.n)
    paths = np.array([os.path.join(args.root, f"{i}.jpg")
                      for i in range(args.n)], dtype=object)
    manifest = Manifest(paths=paths,
                        targets=np.zeros(args.n, np.int64))
    results = {}

    streaming = CanonicalLoader(manifest, args.batch, args.size, cache=False,
                                num_workers=args.workers)
    results["streaming_img_per_sec"] = bench_iter(streaming, args.batches,
                                                  args.batch)

    try:
        from endoscopy_tpu.data.native_loader import NativeCanonicalLoader
        native = NativeCanonicalLoader(manifest, args.batch, args.size,
                                       num_threads=args.workers)
        results["native_img_per_sec"] = bench_iter(native, args.batches,
                                                   args.batch)
        native.close()
    except RuntimeError as e:
        results["native_img_per_sec"] = f"unavailable: {e}"

    # cache build rate on a subset (full 10k decode is the same rate)
    sub = Manifest(paths=paths[:1000], targets=np.zeros(1000, np.int64))
    t0 = time.perf_counter()
    cached = CanonicalLoader(sub, args.batch, args.size, cache=True,
                             num_workers=args.workers)
    results["cache_build_img_per_sec"] = 1000 / (time.perf_counter() - t0)
    results["cached_img_per_sec"] = bench_iter(cached, args.batches, args.batch)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
