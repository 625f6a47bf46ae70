"""Classification metrics (pure numpy, no sklearn dependency at runtime).

Replicates the metric dict of the reference ``calculate_metrics``
(utils.py:38-55): micro/macro precision, recall, F1 plus a per-class
sensitivity/specificity table. Semantics match sklearn with
``zero_division=0`` (sklearn's default emits a warning and returns 0).

All computation happens host-side from the full validation prediction dump,
exactly as the reference does (fixmatch.py:160-168).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pandas as pd


def confusion_matrix(target: np.ndarray, pred: np.ndarray, num_classes: int) -> np.ndarray:
    """num_classes x num_classes matrix, rows = actual, cols = predicted."""
    target = np.asarray(target, dtype=np.int64)
    pred = np.asarray(pred, dtype=np.int64)
    cm = np.zeros((num_classes, num_classes), dtype=np.int64)
    np.add.at(cm, (target, pred), 1)
    return cm


def _per_class_counts(cm: np.ndarray):
    tp = np.diag(cm).astype(np.float64)
    fp = cm.sum(axis=0).astype(np.float64) - tp
    fn = cm.sum(axis=1).astype(np.float64) - tp
    tn = cm.sum().astype(np.float64) - tp - fp - fn
    return tp, fp, fn, tn


def _safe_div(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    out = np.zeros_like(num, dtype=np.float64)
    nz = den > 0
    out[nz] = num[nz] / den[nz]
    return out


def precision_score(target, pred, num_classes: int, average: str = "macro") -> float:
    cm = confusion_matrix(target, pred, num_classes)
    tp, fp, fn, _ = _per_class_counts(cm)
    if average == "micro":
        return float(_safe_div(tp.sum(keepdims=True), (tp + fp).sum(keepdims=True))[0])
    return float(_safe_div(tp, tp + fp).mean())


def recall_score(target, pred, num_classes: int, average: str = "macro") -> float:
    cm = confusion_matrix(target, pred, num_classes)
    tp, _, fn, _ = _per_class_counts(cm)
    if average == "micro":
        return float(_safe_div(tp.sum(keepdims=True), (tp + fn).sum(keepdims=True))[0])
    return float(_safe_div(tp, tp + fn).mean())


def f1_score(target, pred, num_classes: int, average: str = "macro") -> float:
    cm = confusion_matrix(target, pred, num_classes)
    tp, fp, fn, _ = _per_class_counts(cm)
    if average == "micro":
        p = _safe_div(tp.sum(keepdims=True), (tp + fp).sum(keepdims=True))
        r = _safe_div(tp.sum(keepdims=True), (tp + fn).sum(keepdims=True))
        return float(_safe_div(2 * p * r, p + r)[0])
    p = _safe_div(tp, tp + fp)
    r = _safe_div(tp, tp + fn)
    return float(_safe_div(2 * p * r, p + r).mean())


def sensitivity_specificity(target, pred, num_classes: int) -> pd.DataFrame:
    """Per-class sensitivity (recall of the positive one-vs-rest class) and
    specificity (recall of the negative class), as the reference computes via
    one-vs-rest ``precision_recall_fscore_support`` (utils.py:42-46)."""
    cm = confusion_matrix(target, pred, num_classes)
    tp, fp, fn, tn = _per_class_counts(cm)
    sens = _safe_div(tp, tp + fn)
    spec = _safe_div(tn, tn + fp)
    rows = [[c, sens[c], spec[c]] for c in range(num_classes)]
    return pd.DataFrame(rows, columns=["class", "sensitivity", "specificity"])


def calculate_metrics(pred, target, config=None, num_classes: Optional[int] = None) -> Dict:
    """Metric dict with the reference's exact keys (utils.py:48-55)."""
    if num_classes is None:
        num_classes = int(config.MODEL.NUM_CLASSES)
    kw = dict(num_classes=num_classes)
    return {
        "micro/precision": precision_score(target, pred, average="micro", **kw),
        "micro/recall": recall_score(target, pred, average="micro", **kw),
        "micro/f1": f1_score(target, pred, average="micro", **kw),
        "macro/precision": precision_score(target, pred, average="macro", **kw),
        "macro/recall": recall_score(target, pred, average="macro", **kw),
        "macro/f1": f1_score(target, pred, average="macro", **kw),
        "sen/spec": sensitivity_specificity(target, pred, num_classes),
    }
