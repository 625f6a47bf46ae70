"""CSV manifest layer (reference: dataset.py:234-312 GIDataset + the split
logic of get_data, dataset.py:314-444).

The reference's CSVs carry columns ``image``/``path`` (configurable via
DATA.INPUT_NAME), ``target``, ``is_valid``, and for SSL splits ``is_labeled``
(mock pools, e.g. df_split_mock_1_9.csv) or ``pred`` (real pools filtered by
``pred == 1``, dataset.py:374). A :class:`Manifest` is the resolved flat view
of one such split: absolute image paths + integer targets, ready for a
loader. All split decisions happen here on the host with pandas, exactly like
the reference; loaders never see a DataFrame.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import jax  # module attribute: patched by multi-host simulation tests
import numpy as np
import pandas as pd


@dataclasses.dataclass
class Manifest:
    """A resolved data split: absolute paths + targets (both length N)."""

    paths: np.ndarray  # object array of absolute path strings
    targets: np.ndarray  # int64 labels (zeros for unlabeled pools)

    def __post_init__(self) -> None:
        self.paths = np.asarray(self.paths, dtype=object)
        self.targets = np.asarray(self.targets, dtype=np.int64)
        if len(self.paths) != len(self.targets):
            raise ValueError(
                f"paths ({len(self.paths)}) and targets ({len(self.targets)}) "
                f"length mismatch")

    def __len__(self) -> int:
        return len(self.paths)

    @classmethod
    def from_df(cls, df: pd.DataFrame, root: str, input_name: str = "image",
                target_name: Optional[str] = "target") -> "Manifest":
        """Resolve a CSV slice against an image root (dataset.py:249-253:
        ``os.path.join(root, row[INPUT_NAME])``). ``target_name=None`` (or a
        column absent from ``df``, e.g. real unlabeled pools) yields zero
        targets — unlabeled samples carry no label (dataset.py:268-277)."""
        paths = np.array(
            [os.path.join(root, str(p)) for p in df[input_name]], dtype=object)
        if target_name is not None and target_name in df.columns:
            targets = df[target_name].to_numpy(np.int64)
        else:
            targets = np.zeros(len(df), np.int64)
        return cls(paths=paths, targets=targets)

    def take(self, indices: np.ndarray) -> "Manifest":
        indices = np.asarray(indices)
        return Manifest(paths=self.paths[indices], targets=self.targets[indices])


def get_cls_num_list(targets: np.ndarray, num_classes: int) -> List[int]:
    """Per-class sample counts (dataset.py:257-262) — feeds LDAM margins,
    effective-number/RDW weights, and EZBM mixing coefficients. Length is
    ``max(num_classes, observed classes)`` so donor configs with fewer
    classes than the data can still slice what they need."""
    t = np.asarray(targets, np.int64)
    return np.bincount(t, minlength=int(num_classes)).tolist()


def _split_valid(df: pd.DataFrame) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """is_valid split (dataset.py:318-319)."""
    valid_mask = df["is_valid"].astype(bool)
    return df[~valid_mask], df[valid_mask]


def build_supervised_manifests(config, df_anno: pd.DataFrame,
                               is_full_sup: bool = True
                               ) -> Tuple[Manifest, Manifest, List[int]]:
    """Supervised split: (train, valid, cls_num_list).

    ``is_full_sup=True`` trains on every non-valid row (the reference's
    ``get_data(..., is_full_sup=True)`` path, dataset.py:344-350);
    ``False`` restricts to ``is_labeled`` rows (the labeled fraction of a
    mock-SSL CSV)."""
    input_name = str(config.DATA.INPUT_NAME)
    target_name = str(config.DATA.TARGET_NAME)
    df_train, df_valid = _split_valid(df_anno)
    if not is_full_sup and "is_labeled" in df_train.columns:
        df_train = df_train[df_train["is_labeled"].astype(bool)]
    train_m = Manifest.from_df(df_train, config.DATA.PATH, input_name, target_name)
    valid_m = Manifest.from_df(df_valid, config.DATA.PATH, input_name, target_name)
    cls_num_list = get_cls_num_list(train_m.targets,
                                    int(config.MODEL.NUM_CLASSES))
    return train_m, valid_m, cls_num_list


def build_ssl_manifests(config, df_anno: pd.DataFrame,
                        df_unanno: Optional[pd.DataFrame] = None
                        ) -> Tuple[Manifest, Manifest, Manifest, List[int]]:
    """SSL split: (labeled, unlabeled, valid, cls_num_list).

    Mock pools (DATA.MOCKUP_SSL, dataset.py:344-359): the anno CSV's
    ``is_labeled`` column partitions the training rows into labeled and
    unlabeled; both live under DATA.PATH.

    Real pools (dataset.py:370-388): the labeled set is every training row of
    the anno CSV; the unlabeled set is the separate UNANNO CSV filtered to
    ``pred == 1`` (the abnormal classifier's thresholded pseudo-labels,
    supervised.py:238-268) rooted at DATA.UNANNO_PATH.
    """
    input_name = str(config.DATA.INPUT_NAME)
    target_name = str(config.DATA.TARGET_NAME)
    df_train, df_valid = _split_valid(df_anno)
    valid_m = Manifest.from_df(df_valid, config.DATA.PATH, input_name, target_name)

    if config.DATA.MOCKUP_SSL:
        if "is_labeled" not in df_train.columns:
            raise ValueError(
                "DATA.MOCKUP_SSL=True needs an 'is_labeled' column in the "
                "anno CSV (mock split contract, e.g. df_split_mock_1_9.csv)")
        lab_mask = df_train["is_labeled"].astype(bool)
        labeled_m = Manifest.from_df(df_train[lab_mask], config.DATA.PATH,
                                     input_name, target_name)
        unlabeled_m = Manifest.from_df(df_train[~lab_mask], config.DATA.PATH,
                                       input_name, target_name=None)
    else:
        if df_unanno is None:
            raise ValueError("MOCKUP_SSL=False requires the DATA.UNANNO CSV")
        labeled_m = Manifest.from_df(df_train, config.DATA.PATH,
                                     input_name, target_name)
        df_pool = df_unanno[df_unanno["pred"] == 1]  # dataset.py:374
        unlabeled_m = Manifest.from_df(df_pool, config.DATA.UNANNO_PATH,
                                       input_name, target_name=None)

    cls_num_list = get_cls_num_list(labeled_m.targets,
                                    int(config.MODEL.NUM_CLASSES))
    return labeled_m, unlabeled_m, valid_m, cls_num_list


def shard_for_host(manifest: Manifest) -> Manifest:
    """Per-host manifest slice for multi-host (DCN) data parallelism
    (SURVEY.md §2.3): host ``i`` of ``P`` reads rows ``i::P``; the jitted
    step sees the concatenated global batch via
    ``jax.make_array_from_process_local_data`` (train/common.py _shard).
    Single-process runs return the manifest unchanged."""
    pc = jax.process_count()
    if pc <= 1:
        return manifest
    pi = jax.process_index()
    return manifest.take(np.arange(pi, len(manifest), pc))
