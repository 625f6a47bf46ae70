from endoscopy_tpu.eval.metrics import (
    calculate_metrics,
    confusion_matrix,
    f1_score,
    precision_score,
    recall_score,
    sensitivity_specificity,
)

__all__ = [
    "calculate_metrics",
    "confusion_matrix",
    "f1_score",
    "precision_score",
    "recall_score",
    "sensitivity_specificity",
]
