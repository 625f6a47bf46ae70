"""Metric math golden tests against sklearn (the reference's metric backend,
utils.py:38-55)."""

import numpy as np
import pytest
import sklearn.metrics as skm

from endoscopy_tpu.eval.metrics import (
    calculate_metrics,
    confusion_matrix,
    f1_score,
    precision_score,
    recall_score,
    sensitivity_specificity,
)

NUM_CLASSES = 6


@pytest.fixture
def preds_targets(rng):
    target = rng.integers(0, NUM_CLASSES, size=500)
    pred = np.where(rng.random(500) < 0.7, target, rng.integers(0, NUM_CLASSES, size=500))
    return pred, target


@pytest.mark.parametrize("average", ["micro", "macro"])
def test_prf_matches_sklearn(preds_targets, average):
    pred, target = preds_targets
    assert precision_score(target, pred, NUM_CLASSES, average) == pytest.approx(
        skm.precision_score(target, pred, average=average, zero_division=0))
    assert recall_score(target, pred, NUM_CLASSES, average) == pytest.approx(
        skm.recall_score(target, pred, average=average, zero_division=0))
    assert f1_score(target, pred, NUM_CLASSES, average) == pytest.approx(
        skm.f1_score(target, pred, average=average, zero_division=0))


def test_confusion_matrix_matches_sklearn(preds_targets):
    pred, target = preds_targets
    np.testing.assert_array_equal(
        confusion_matrix(target, pred, NUM_CLASSES),
        skm.confusion_matrix(target, pred, labels=range(NUM_CLASSES)))


def test_sensitivity_specificity_matches_reference_formula(preds_targets):
    """One-vs-rest recall of positive/negative class per class (utils.py:42-46)."""
    pred, target = preds_targets
    df = sensitivity_specificity(target, pred, NUM_CLASSES)
    for c in range(NUM_CLASSES):
        _, recall, _, _ = skm.precision_recall_fscore_support(
            target == c, pred == c, average=None, zero_division=0)
        assert df.loc[c, "sensitivity"] == pytest.approx(recall[1])
        assert df.loc[c, "specificity"] == pytest.approx(recall[0])


def test_missing_class_zero_division(rng):
    # class 5 never predicted and never present -> 0 not nan (sklearn zero_division=0)
    target = rng.integers(0, NUM_CLASSES - 1, size=50)
    pred = rng.integers(0, NUM_CLASSES - 1, size=50)
    m = calculate_metrics(pred, target, num_classes=NUM_CLASSES)
    assert np.isfinite(m["macro/f1"])
    assert m["macro/f1"] == pytest.approx(
        skm.f1_score(target, pred, average="macro", labels=range(NUM_CLASSES), zero_division=0))


def test_calculate_metrics_keys(preds_targets):
    pred, target = preds_targets
    m = calculate_metrics(pred, target, num_classes=NUM_CLASSES)
    assert set(m) == {"micro/precision", "micro/recall", "micro/f1",
                      "macro/precision", "macro/recall", "macro/f1", "sen/spec"}
    assert list(m["sen/spec"].columns) == ["class", "sensitivity", "specificity"]
