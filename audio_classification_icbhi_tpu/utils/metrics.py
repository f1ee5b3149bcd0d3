"""Classification metrics (host-side numpy/sklearn).

Capability match for reference src/utils/metrics.py:16-115: accuracy,
per-class and weighted precision/recall/F1, one-vs-rest ROC-AUC, and the
formatted printout. Plotting lives in utils/plotting.py.
"""

from __future__ import annotations

import numpy as np
from sklearn.metrics import (
    accuracy_score,
    f1_score,
    precision_score,
    recall_score,
    roc_auc_score,
)

DEFAULT_CLASSES = ["normal", "crackles", "wheezes", "both"]


def calculate_metrics(
    y_true,
    y_pred,
    y_prob=None,
    class_names: list[str] | None = None,
) -> dict:
    """Accuracy, per-class and weighted P/R/F1, optional one-vs-rest ROC-AUC
    (reference metrics.py:16-72)."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    if class_names is None:
        class_names = DEFAULT_CLASSES
    n = len(class_names)
    labels = list(range(n))

    metrics = {
        "accuracy": float(accuracy_score(y_true, y_pred)),
        "precision_per_class": precision_score(
            y_true, y_pred, labels=labels, average=None, zero_division=0
        ).tolist(),
        "recall_per_class": recall_score(
            y_true, y_pred, labels=labels, average=None, zero_division=0
        ).tolist(),
        "f1_per_class": f1_score(
            y_true, y_pred, labels=labels, average=None, zero_division=0
        ).tolist(),
        "precision_weighted": float(
            precision_score(y_true, y_pred, average="weighted", zero_division=0)
        ),
        "recall_weighted": float(
            recall_score(y_true, y_pred, average="weighted", zero_division=0)
        ),
        "f1_weighted": float(f1_score(y_true, y_pred, average="weighted", zero_division=0)),
        "class_names": list(class_names),
    }

    if y_prob is not None:
        y_prob = np.asarray(y_prob)
        try:
            # One-vs-rest AUC per class (reference metrics.py:58-70).
            aucs = []
            for c in labels:
                binary = (y_true == c).astype(int)
                if binary.min() == binary.max():  # class absent: AUC undefined
                    aucs.append(float("nan"))
                else:
                    aucs.append(float(roc_auc_score(binary, y_prob[:, c])))
            metrics["roc_auc_per_class"] = aucs
            finite = [a for a in aucs if np.isfinite(a)]
            metrics["roc_auc_macro"] = float(np.mean(finite)) if finite else float("nan")
        except (ValueError, IndexError):
            # IndexError: y_prob with fewer columns than class_names (e.g. a
            # 2-class model scored against the default 4-entry list) must
            # degrade to NaN AUCs like every other failure mode here, not
            # crash after evaluation already ran
            metrics["roc_auc_per_class"] = [float("nan")] * n
            metrics["roc_auc_macro"] = float("nan")

    return metrics


def print_metrics(metrics: dict) -> None:
    """Formatted metric report (reference metrics.py:75-115)."""
    class_names = metrics.get("class_names", DEFAULT_CLASSES)
    print("\n" + "=" * 60)
    print("CLASSIFICATION METRICS")
    print("=" * 60)
    print(f"Overall Accuracy: {metrics['accuracy']:.4f}")
    print(f"Weighted Precision: {metrics['precision_weighted']:.4f}")
    print(f"Weighted Recall: {metrics['recall_weighted']:.4f}")
    print(f"Weighted F1: {metrics['f1_weighted']:.4f}")
    if "roc_auc_macro" in metrics:
        print(f"Macro ROC-AUC: {metrics['roc_auc_macro']:.4f}")
    print("\nPer-class metrics:")
    header = f"{'class':<12}{'precision':>10}{'recall':>10}{'f1':>10}"
    if "roc_auc_per_class" in metrics:
        header += f"{'auc':>10}"
    print(header)
    for i, name in enumerate(class_names):
        row = (
            f"{name:<12}"
            f"{metrics['precision_per_class'][i]:>10.4f}"
            f"{metrics['recall_per_class'][i]:>10.4f}"
            f"{metrics['f1_per_class'][i]:>10.4f}"
        )
        if "roc_auc_per_class" in metrics:
            row += f"{metrics['roc_auc_per_class'][i]:>10.4f}"
        print(row)
    print("=" * 60)
