"""Canonical uint8 host loaders.

TPU-first input contract (SURVEY.md §7 step 3): the host produces ONE
canonical uint8 NHWC batch per role — decoded with cv2 (imread → BGR2RGB,
matching the reference dataset.py:249-253) and bilinearly resized to the
*canonical* edge (IMG_SIZE × DATA.CANONICAL_SCALE, the crop headroom of the
reference's ``Resize(int(size*1.2))`` weak view, dataset.py:30-36). All
per-view augmentation happens on device (aug/views.py), so the host never
runs RandAugment/ColorJitter and a single decode feeds every view.

Loader contracts (consumed by trainers, train/*.py):

- :class:`CanonicalLoader` — infinite shuffled batches ``(imgs_u8, targets)``
  with the reference's RandomSampler-recycle semantics (fixmatch.py:91-100):
  reshuffled epochs, wrap-around fixed-size batches, so every compiled step
  sees one static shape. Random access via ``sample(indices)`` (the
  triplet/EZBM protocol, dataset.py:279-306).
- :class:`EvalLoader` — one deterministic pass, last batch padded and masked
  (``(imgs_u8, targets, mask)``) so evaluation is one compiled shape too.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Tuple

import numpy as np

from endoscopy_tpu.data.manifest import Manifest

# RAM bound for CanonicalLoader(cache=True): above this estimated cache size
# the loader silently degrades to streaming (the ~99k-image real unlabeled
# pool at 134px canonical is ~5.3 GB — too big for a 1-core TPU-VM host).
DEFAULT_CACHE_LIMIT_BYTES = int(
    os.environ.get("ENDOSCOPY_TPU_CACHE_LIMIT", 2 * 1024 ** 3))


def canonical_size(config) -> int:
    """Canonical host-batch edge: IMG_SIZE × CANONICAL_SCALE when IS_CROP
    (the reference's ``int(size * 1.2)`` resize before crops,
    dataset.py:30-36), else IMG_SIZE."""
    img_size = int(config.DATA.IMG_SIZE)
    if config.DATA.IS_CROP:
        return int(img_size * float(config.DATA.CANONICAL_SCALE))
    return img_size


def decode_canonical(path: str, size: int) -> np.ndarray:
    """cv2 imread → BGR2RGB → bilinear resize to (size, size) uint8
    (dataset.py:249-253 + the canonical resize)."""
    import cv2

    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(f"cv2 could not read image: {path}")
    return _canonicalize_bgr(img, size)


def decode_canonical_bytes(data: bytes, size: int) -> np.ndarray:
    """In-memory variant of :func:`decode_canonical` for the serving path:
    encoded image bytes (JPEG/PNG/...) → canonical uint8 (size, size, 3)."""
    import cv2

    img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError("cv2 could not decode the image payload")
    return _canonicalize_bgr(img, size)


def _canonicalize_bgr(img: np.ndarray, size: int) -> np.ndarray:
    import cv2

    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if img.shape[0] != size or img.shape[1] != size:
        img = cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
    return np.ascontiguousarray(img, dtype=np.uint8)


class _Decoder:
    """Threaded, order-preserving batch decode (executor.map keeps order)."""

    def __init__(self, num_workers: int) -> None:
        self._pool = (ThreadPoolExecutor(num_workers) if num_workers > 0
                      else None)

    def decode_batch(self, paths, size: int) -> np.ndarray:
        if self._pool is None:
            rows = [decode_canonical(p, size) for p in paths]
        else:
            rows = list(self._pool.map(
                lambda p: decode_canonical(p, size), paths))
        return np.stack(rows) if rows else np.zeros((0, size, size, 3), np.uint8)

    def close(self) -> None:
        if self._pool is not None:
            self._pool.shutdown(wait=False)


class CanonicalLoader:
    """Infinite shuffled canonical-batch loader with random access.

    cache=True decodes the whole manifest once (threaded) into a uint8 array
    and serves batches as pure numpy slices; above the RAM bound it degrades
    to cv2 thread-pool streaming with a prefetch depth of one batch.
    """

    def __init__(self, manifest: Manifest, batch_size: int, size: int,
                 cache: bool = True, seed: Optional[int] = None,
                 num_workers: int = 2, shuffle: bool = True,
                 cache_limit_bytes: int = DEFAULT_CACHE_LIMIT_BYTES) -> None:
        self.manifest = manifest
        self.batch_size = int(batch_size)
        self.size = int(size)
        self.shuffle = bool(shuffle)
        self.rng = np.random.default_rng(seed)
        self._decoder = _Decoder(int(num_workers))

        est_bytes = len(manifest) * size * size * 3
        if cache and est_bytes > cache_limit_bytes:
            print(f"CanonicalLoader: cache would need {est_bytes / 1e9:.1f} GB "
                  f"(> {cache_limit_bytes / 1e9:.1f} GB bound); streaming instead")
            cache = False
        self._cache: Optional[np.ndarray] = None
        if cache and len(manifest):
            self._cache = self._decoder.decode_batch(manifest.paths, self.size)

    # -- random access (triplet/EZBM protocol) ------------------------------

    def sample(self, indices: np.ndarray) -> np.ndarray:
        """Decoded canonical rows for arbitrary manifest indices. Cached and
        streaming loaders return identical pixels (same cv2 pipeline)."""
        indices = np.asarray(indices, np.int64)
        if self._cache is not None:
            return self._cache[indices]
        return self._decoder.decode_batch(self.manifest.paths[indices], self.size)

    # -- infinite iteration --------------------------------------------------

    def _index_stream(self) -> Iterator[int]:
        n = len(self.manifest)
        while True:
            order = (self.rng.permutation(n) if self.shuffle
                     else np.arange(n))
            yield from order

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        stream = self._index_stream()
        targets = self.manifest.targets

        def take_batch() -> np.ndarray:
            return np.fromiter(
                (next(stream) for _ in range(self.batch_size)),
                np.int64, count=self.batch_size)

        if self._cache is not None:
            while True:
                idx = take_batch()
                yield self._cache[idx], targets[idx]
        else:
            # one-batch async prefetch: batch k+1 decodes (on a dedicated
            # assembly thread fanning out to the decode pool) while the
            # caller's train step consumes batch k.
            assembler = ThreadPoolExecutor(1)
            try:
                idx = take_batch()
                fut = assembler.submit(self._decoder.decode_batch,
                                       self.manifest.paths[idx], self.size)
                while True:
                    imgs, cur_idx = fut.result(), idx
                    idx = take_batch()
                    fut = assembler.submit(self._decoder.decode_batch,
                                           self.manifest.paths[idx], self.size)
                    yield imgs, targets[cur_idx]
            finally:
                assembler.shutdown(wait=False)

    def close(self) -> None:
        self._decoder.close()


class EvalLoader:
    """One deterministic pad-and-mask pass (SURVEY.md §7 hard parts: no
    ragged last batch — the final batch repeats row 0 with mask=False so the
    compiled eval step keeps a single shape).

    cache=None (default) auto-caches under the same RAM bound as
    CanonicalLoader — validation sets are re-read every eval epoch
    (reference dataset.py:408-411 sequential valid loader), so decoding
    once and serving numpy slices removes the per-eval-epoch decode cost;
    cache=False forces streaming."""

    def __init__(self, manifest: Manifest, batch_size: int, size: int,
                 num_workers: int = 2, cache: Optional[bool] = None,
                 cache_limit_bytes: int = DEFAULT_CACHE_LIMIT_BYTES) -> None:
        self.manifest = manifest
        self.batch_size = int(batch_size)
        self.size = int(size)
        self._decoder = _Decoder(int(num_workers))
        est_bytes = len(manifest) * size * size * 3
        if cache is None:
            cache = est_bytes <= cache_limit_bytes
        elif cache and est_bytes > cache_limit_bytes:
            # same graceful degrade as CanonicalLoader: an explicit
            # cache=True above the RAM bound streams instead of OOMing
            print(f"EvalLoader: cache would need {est_bytes / 1e9:.1f} GB "
                  f"(> {cache_limit_bytes / 1e9:.1f} GB bound); streaming instead")
            cache = False
        self._cache: Optional[np.ndarray] = None
        if cache and len(manifest):
            self._cache = self._decoder.decode_batch(manifest.paths, self.size)

    def __len__(self) -> int:
        return -(-len(self.manifest) // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        n = len(self.manifest)
        bs = self.batch_size
        for start in range(0, n, bs):
            idx = np.arange(start, min(start + bs, n), dtype=np.int64)
            pad = bs - len(idx)
            mask = np.concatenate([np.ones(len(idx), bool), np.zeros(pad, bool)])
            if pad:
                idx = np.concatenate([idx, np.zeros(pad, np.int64)])
            if self._cache is not None:
                imgs = self._cache[idx]
            else:
                imgs = self._decoder.decode_batch(self.manifest.paths[idx],
                                                  self.size)
            yield imgs, self.manifest.targets[idx], mask

    def close(self) -> None:
        self._decoder.close()
