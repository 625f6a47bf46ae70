"""Visualization helpers (reference: utils.py:59-117, 157-173).

matplotlib/seaborn are optional; every function degrades to returning the
computed arrays when plotting is unavailable (headless TPU pods).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from endoscopy_tpu.aug.views import IMAGENET_MEAN, IMAGENET_STD
from endoscopy_tpu.eval.metrics import confusion_matrix


def _plt():
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        return plt
    except ImportError:  # pragma: no cover
        return None


def denormalize(img: np.ndarray) -> np.ndarray:
    """Undo ImageNet normalization for display (utils.py:70-81)."""
    out = np.asarray(img) * np.asarray(IMAGENET_STD) + np.asarray(IMAGENET_MEAN)
    return np.clip(out, 0.0, 1.0)


def show_cfs_matrix(targets, preds, num_classes: int, percent: bool = False,
                    save_path: Optional[str] = None) -> np.ndarray:
    """Confusion-matrix heatmap (utils.py:59-68); returns the matrix."""
    cm = confusion_matrix(targets, preds, num_classes)
    data = cm.astype(float)
    if percent:
        col = data.sum(axis=0, keepdims=True)
        data = data / np.maximum(col, 1.0)
    plt = _plt()
    if plt is not None:
        fig, ax = plt.subplots(figsize=(8, 8))
        im = ax.imshow(data, cmap="Blues")
        for i in range(num_classes):
            for j in range(num_classes):
                ax.text(j, i, f"{data[i, j]:.2f}" if percent else f"{int(data[i, j])}",
                        ha="center", va="center", fontsize=8)
        ax.set_ylabel("Actual")
        ax.set_xlabel("Predicted")
        fig.colorbar(im)
        if save_path:
            fig.savefig(save_path, bbox_inches="tight")
        plt.close(fig)
    return cm


def show_grid(images: Sequence[np.ndarray], save_path: Optional[str] = None):
    """Row of de-normalized images (utils.py:98-117)."""
    imgs = [denormalize(im) for im in images]
    plt = _plt()
    if plt is not None:
        fig, axes = plt.subplots(1, len(imgs), figsize=(4 * len(imgs), 4))
        if len(imgs) == 1:
            axes = [axes]
        for ax, im in zip(axes, imgs):
            ax.imshow(im)
            ax.axis("off")
        if save_path:
            fig.savefig(save_path, bbox_inches="tight")
        plt.close(fig)
    return imgs


def show_triplet_dist(d_ap, d_an, save_path: Optional[str] = None):
    """Anchor-positive vs anchor-negative distance histograms
    (utils.py:157-173); returns (d_ap, d_an) arrays."""
    d_ap = np.asarray(d_ap).ravel()
    d_an = np.asarray(d_an).ravel()
    plt = _plt()
    if plt is not None:
        fig, ax = plt.subplots(figsize=(10, 6))
        ax.hist(d_ap, bins=30, alpha=0.6, label="Positive Score", color="skyblue")
        ax.hist(d_an, bins=30, alpha=0.6, label="Negative Score", color="red")
        ax.legend()
        if save_path:
            fig.savefig(save_path, bbox_inches="tight")
        plt.close(fig)
    return d_ap, d_an
