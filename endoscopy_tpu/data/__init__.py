"""Host-side data layer: CSV manifests, canonical uint8 loaders, synthetic
dataset generation, and offline preprocessing.

The TPU-first input design (SURVEY.md §2.3 input-pipeline row): the host does
the minimum — JPEG decode + one bilinear resize to the *canonical* size
(IMG_SIZE × CANONICAL_SCALE) as uint8 — and every augmentation view (weak /
strong / CoMatch / labeled-train / eval) derives **on device** inside the
jitted step (aug/views.py). This keeps host CPU work flat per image while the
reference spends its DataLoader workers on per-view PIL transform stacks
(reference dataset.py:24-132).
"""

from endoscopy_tpu.data.manifest import (
    Manifest,
    build_ssl_manifests,
    build_supervised_manifests,
    get_cls_num_list,
    shard_for_host,
)
from endoscopy_tpu.data.pipeline import CanonicalLoader, EvalLoader, canonical_size

__all__ = [
    "Manifest",
    "build_ssl_manifests",
    "build_supervised_manifests",
    "get_cls_num_list",
    "shard_for_host",
    "CanonicalLoader",
    "EvalLoader",
    "canonical_size",
]
