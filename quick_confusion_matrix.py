#!/usr/bin/env python
"""Standalone confusion-matrix plotting template
(reference quick_confusion_matrix.py:10-55): call plot_cm(y_true, y_pred)
with arrays from any source."""

import numpy as np


def plot_cm(y_true, y_pred, class_names=None, save_path="confusion_matrix.png"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns
    from sklearn.metrics import confusion_matrix

    if class_names is None:
        class_names = ["normal", "crackles", "wheezes", "both"]
    cm = confusion_matrix(y_true, y_pred, labels=list(range(len(class_names))))
    fig, ax = plt.subplots(figsize=(8, 6))
    sns.heatmap(cm, annot=True, fmt="d", cmap="Blues",
                xticklabels=class_names, yticklabels=class_names, ax=ax)
    ax.set_xlabel("Predicted")
    ax.set_ylabel("True")
    ax.set_title("Confusion Matrix")
    fig.savefig(save_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    print(f"Saved {save_path}")
    return cm


if __name__ == "__main__":
    # Example with random data; replace with real predictions, e.g.:
    #   from audio_classification_icbhi_tpu.training.validation import Validator
    #   y_true, y_pred, _ = validator.validate(params, batch_stats)
    rng = np.random.default_rng(0)
    y_true = rng.integers(0, 4, 100)
    y_pred = np.where(rng.random(100) < 0.7, y_true, rng.integers(0, 4, 100))
    plot_cm(y_true, y_pred)
