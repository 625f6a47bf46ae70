"""ctypes bindings for the native C++ loader core (native/loader.cpp).

The reference's input path is torch DataLoader worker *processes* doing
cv2/PIL decode per sample (dataset.py:249-253, 350-358). On a TPU VM the
host CPU is the scarce resource, so the native core keeps a C++ thread pool
(fread → libjpeg decode → bilinear resize) filling a bounded queue of
canonical uint8 images; Python drains whole batches through one ctypes call
with a single memcpy per image. Shuffle semantics match the reference's
RandomSampler-with-recycling contract (fixmatch.py:91-100): reshuffled
epochs, wrap-around fixed-size batches.

Selected via ``DATA.LOADER: 'native'`` (cli/learn.py). Raises RuntimeError at
construction when neither the prebuilt ``native/libendoloader.so`` nor a
local g++/libjpeg toolchain is available, so callers can fall back to the
cv2 loaders.

Corrupt-input contract (deliberate divergence from the cv2 loaders, which
raise like the reference's cv2-imread-returns-None crash): the infinite
prefetch stream cannot raise from a C++ worker, so unreadable files are
skipped to keep batches fixed-shape, a RuntimeWarning reports the running
skip count, and an all-corrupt manifest raises instead of blocking.
``sample()`` always raises on undecodable rows — specific-row requests
cannot be substituted.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

from endoscopy_tpu.data.manifest import Manifest

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libendoloader.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "loader.cpp")

_lib: Optional[ctypes.CDLL] = None
_lib_error: Optional[str] = None


def _build_so() -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC_PATH,
           "-o", _SO_PATH, "-ljpeg", "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load_lib() -> ctypes.CDLL:
    global _lib, _lib_error
    if _lib is not None:
        return _lib
    if _lib_error is not None:
        raise RuntimeError(_lib_error)
    try:
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _build_so()
            lib = ctypes.CDLL(_SO_PATH)
    except (OSError, subprocess.CalledProcessError) as exc:
        _lib_error = f"native loader unavailable: {exc}"
        raise RuntimeError(_lib_error) from exc

    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.c_int]
    lib.loader_next.restype = None
    lib.loader_next.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64)]
    lib.loader_dropped.restype = ctypes.c_int64
    lib.loader_dropped.argtypes = [ctypes.c_void_p]
    lib.loader_destroy.restype = None
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class _Handle:
    """Owns one C++ Loader instance."""

    def __init__(self, paths, size: int, num_threads: int, queue_depth: int,
                 seed: int, shuffle: bool) -> None:
        self._lib = _load_lib()
        arr = (ctypes.c_char_p * len(paths))(
            *[str(p).encode() for p in paths])
        self._keepalive = arr  # paths are copied in C++, but keep anyway
        self._ptr = self._lib.loader_create(
            arr, len(paths), size, num_threads, queue_depth,
            ctypes.c_uint64(seed), 1 if shuffle else 0)
        self.size = size

    def next(self, n: int) -> Tuple[np.ndarray, np.ndarray]:
        imgs = np.empty((n, self.size, self.size, 3), np.uint8)
        idx = np.empty(n, np.int64)
        self._lib.loader_next(
            self._ptr, n,
            imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return imgs, idx

    def dropped(self) -> int:
        """Files the C++ core skipped as unreadable/undecodable so far."""
        return int(self._lib.loader_dropped(self._ptr))

    def close(self) -> None:
        if self._ptr is not None:
            self._lib.loader_destroy(self._ptr)
            self._ptr = None

    def __del__(self) -> None:  # pragma: no cover - GC safety net
        try:
            self.close()
        except Exception:
            pass


class NativeCanonicalLoader:
    """Drop-in CanonicalLoader with the C++ decode core.

    Same contract as data.pipeline.CanonicalLoader: infinite shuffled
    ``(imgs_u8, targets)`` batches plus ``sample(indices)`` random access.
    """

    def __init__(self, manifest: Manifest, batch_size: int, size: int,
                 seed: int = 0, num_threads: int = 2, shuffle: bool = True,
                 queue_depth: Optional[int] = None) -> None:
        self.manifest = manifest
        self.batch_size = int(batch_size)
        self.size = int(size)
        self._num_threads = max(1, int(num_threads))
        depth = queue_depth or max(2 * self.batch_size, 64)
        self._handle = _Handle(manifest.paths, self.size, self._num_threads,
                               depth, int(seed), shuffle)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        targets = self.manifest.targets
        warned_dropped = 0
        while True:
            imgs, idx = self._handle.next(self.batch_size)
            if (idx < 0).any():  # C++ sentinel: a full pass decoded nothing
                raise RuntimeError(
                    "native loader: no decodable image in the manifest "
                    f"({self._handle.dropped()} failures)")
            dropped = self._handle.dropped()
            if dropped > warned_dropped:
                # the stream stays fixed-shape (corrupt files are skipped,
                # valid ones recycle in), but silent data loss must be loud
                import warnings

                warnings.warn(
                    f"native loader skipped {dropped} unreadable/undecodable "
                    "image read(s) so far (the prefetcher may revisit a bad "
                    "file once per epoch pass); affected files will never be "
                    "trained on", RuntimeWarning, stacklevel=2)
                warned_dropped = dropped
            yield imgs, targets[idx]

    def sample(self, indices: np.ndarray) -> np.ndarray:
        """Random access decode (triplet/EZBM protocol): a transient
        single-thread, non-shuffled core decodes exactly the requested rows
        in order. Raises on unreadable rows — unlike the infinite stream,
        a sample() caller asked for SPECIFIC rows, and silently recycling a
        neighbor into the missing slot would hand back uninitialized or
        duplicated pixels."""
        indices = np.asarray(indices, np.int64)
        tmp = _Handle(self.manifest.paths[indices], self.size, 1,
                      max(len(indices), 1), 0, shuffle=False)
        try:
            imgs, got = tmp.next(len(indices))
            dropped = tmp.dropped()
        finally:
            tmp.close()
        if dropped > 0 or (got < 0).any() or \
                len(np.unique(got)) != len(indices):
            missing = sorted(set(range(len(indices))) -
                             set(g for g in got.tolist() if g >= 0))
            bad = [str(self.manifest.paths[indices[m]]) for m in missing[:4]]
            # report unique undecodable rows, not the racy skip-event count
            # (the recycling worker may re-fail a bad row several times
            # before the drain finishes)
            raise RuntimeError(
                f"native loader could not decode {len(missing)}"
                f" of {len(indices)} sampled image(s): {bad}")
        # single worker decodes sequentially, but reorder defensively
        out = np.empty_like(imgs)
        out[got] = imgs
        return out

    def close(self) -> None:
        self._handle.close()
