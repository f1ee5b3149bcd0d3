"""Reporting plots (matplotlib/seaborn, host-side).

Capability match for the reference's plot functions: confusion-matrix
heatmap (metrics.py:119-160), ROC curves (metrics.py:163-209), training
history (metrics.py:212-248), ICBHI metric bars (icbhi_metrics.py:168-242),
annotated confusion matrix (icbhi_metrics.py:290-333), and the 4-panel
ICBHI training history (training_icbhi.py:17-64). Output filenames keep the
reference's conventions so downstream tooling finds them.
"""

from __future__ import annotations

from pathlib import Path

import matplotlib

matplotlib.use("Agg")  # headless
import matplotlib.pyplot as plt
import numpy as np
import seaborn as sns
from sklearn.metrics import auc, confusion_matrix, roc_curve

DEFAULT_CLASSES = ["normal", "crackles", "wheezes", "both"]  # config.yaml names
# the ICBHI plot functions default to the SEGMENT DIRECTORY names — the
# same quirk ledger split as the datasets (SURVEY.md: config says
# crackles/wheezes, segmented dirs say crackle/wheeze); shared with
# icbhi_metrics.DEFAULT_CLASSES so the two cannot drift
from audio_classification_icbhi_tpu.utils.icbhi_metrics import (
    DEFAULT_CLASSES as ICBHI_CLASSES,
)


def _save(fig, save_path):
    if save_path:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(save_path, dpi=150, bbox_inches="tight")
    plt.close(fig)


def plot_confusion_matrix(y_true, y_pred, class_names=None, save_path=None, normalize=False):
    """Heatmap confusion matrix (reference metrics.py:119-160)."""
    class_names = class_names or DEFAULT_CLASSES
    cm = confusion_matrix(y_true, y_pred, labels=list(range(len(class_names))))
    fmt = "d"
    data = cm
    if normalize:
        data = cm.astype(float) / np.maximum(cm.sum(axis=1, keepdims=True), 1)
        fmt = ".2f"
    fig, ax = plt.subplots(figsize=(8, 6))
    sns.heatmap(
        data, annot=True, fmt=fmt, cmap="Blues",
        xticklabels=class_names, yticklabels=class_names, ax=ax,
    )
    ax.set_xlabel("Predicted")
    ax.set_ylabel("True")
    ax.set_title("Confusion Matrix" + (" (normalized)" if normalize else ""))
    _save(fig, save_path)
    return cm


def plot_roc_curves(y_true, y_prob, class_names=None, save_path=None):
    """One-vs-rest ROC curves (reference metrics.py:163-209)."""
    class_names = class_names or DEFAULT_CLASSES
    y_true = np.asarray(y_true)
    y_prob = np.asarray(y_prob)
    fig, ax = plt.subplots(figsize=(8, 6))
    for i, name in enumerate(class_names):
        binary = (y_true == i).astype(int)
        if binary.min() == binary.max():
            continue
        fpr, tpr, _ = roc_curve(binary, y_prob[:, i])
        ax.plot(fpr, tpr, label=f"{name} (AUC = {auc(fpr, tpr):.3f})")
    ax.plot([0, 1], [0, 1], "k--", alpha=0.5)
    ax.set_xlabel("False Positive Rate")
    ax.set_ylabel("True Positive Rate")
    ax.set_title("ROC Curves (one-vs-rest)")
    ax.legend(loc="lower right")
    _save(fig, save_path)


def plot_training_history(history: dict, save_path=None):
    """Loss/accuracy curves (reference metrics.py:212-248; consumed by
    train.py:112-113)."""
    fig, axes = plt.subplots(1, 2, figsize=(14, 5))
    epochs = range(1, len(history["train_loss"]) + 1)
    axes[0].plot(epochs, history["train_loss"], label="train")
    axes[0].plot(epochs, history["val_loss"], label="val")
    axes[0].set_title("Loss")
    axes[0].set_xlabel("Epoch")
    axes[0].legend()
    axes[1].plot(epochs, history["train_acc"], label="train")
    axes[1].plot(epochs, history["val_acc"], label="val")
    axes[1].set_title("Accuracy (%)")
    axes[1].set_xlabel("Epoch")
    axes[1].legend()
    fig.tight_layout()
    _save(fig, save_path)


def plot_icbhi_metrics(metrics: dict, class_names=None, save_path=None):
    """Per-class sensitivity/specificity/harmonic bars + overall score
    (reference icbhi_metrics.py:168-242)."""
    class_names = class_names or ICBHI_CLASSES
    fig, axes = plt.subplots(1, 2, figsize=(14, 5))
    x = np.arange(len(class_names))
    width = 0.27
    sens = [metrics["per_class_metrics"][c]["sensitivity"] for c in class_names]
    spec = [metrics["per_class_metrics"][c]["specificity"] for c in class_names]
    harm = [metrics["per_class_metrics"][c]["harmonic_score"] for c in class_names]
    axes[0].bar(x - width, sens, width, label="sensitivity")
    axes[0].bar(x, spec, width, label="specificity")
    axes[0].bar(x + width, harm, width, label="harmonic")
    axes[0].set_xticks(x)
    axes[0].set_xticklabels(class_names)
    axes[0].set_ylim(0, 1.05)
    axes[0].set_title("Per-class ICBHI metrics")
    axes[0].legend()
    overall = [
        metrics["avg_sensitivity"],
        metrics["avg_specificity"],
        metrics["icbhi_score"],
        metrics["accuracy"],
    ]
    axes[1].bar(["avg sens", "avg spec", "ICBHI", "accuracy"], overall, color="tab:blue")
    axes[1].set_ylim(0, 1.05)
    axes[1].set_title(f"ICBHI Score: {metrics['icbhi_score']:.4f}")
    fig.tight_layout()
    _save(fig, save_path)


def plot_icbhi_confusion_matrix(y_true, y_pred, class_names=None, save_path=None):
    """Count + row-percentage annotated CM (reference icbhi_metrics.py:290-333)."""
    class_names = class_names or ICBHI_CLASSES
    cm = confusion_matrix(y_true, y_pred, labels=list(range(len(class_names))))
    row_sums = np.maximum(cm.sum(axis=1, keepdims=True), 1)
    annot = np.empty(cm.shape, dtype=object)
    for i in range(cm.shape[0]):
        for j in range(cm.shape[1]):
            annot[i, j] = f"{cm[i, j]}\n({100 * cm[i, j] / row_sums[i, 0]:.1f}%)"
    fig, ax = plt.subplots(figsize=(9, 7))
    sns.heatmap(
        cm, annot=annot, fmt="", cmap="Blues",
        xticklabels=class_names, yticklabels=class_names, ax=ax,
    )
    ax.set_xlabel("Predicted")
    ax.set_ylabel("True")
    ax.set_title("ICBHI Confusion Matrix")
    _save(fig, save_path)
    return cm


def plot_icbhi_history(history: dict, save_path=None):
    """4-panel ICBHI training history (reference training_icbhi.py:17-64):
    loss, accuracy, ICBHI score, sensitivity/specificity."""
    fig, axes = plt.subplots(2, 2, figsize=(14, 10))
    epochs = range(1, len(history["train_loss"]) + 1)
    axes[0, 0].plot(epochs, history["train_loss"], label="train")
    axes[0, 0].plot(epochs, history["val_loss"], label="val")
    axes[0, 0].set_title("Loss")
    axes[0, 0].legend()
    axes[0, 1].plot(epochs, history["train_acc"], label="train")
    axes[0, 1].plot(epochs, history["val_acc"], label="val")
    axes[0, 1].set_title("Accuracy (%)")
    axes[0, 1].legend()
    axes[1, 0].plot(epochs, history["icbhi_score"], color="tab:green")
    axes[1, 0].set_title("ICBHI Score")
    axes[1, 0].set_xlabel("Epoch")
    axes[1, 1].plot(epochs, history["sensitivity"], label="sensitivity")
    axes[1, 1].plot(epochs, history["specificity"], label="specificity")
    axes[1, 1].set_title("Sensitivity / Specificity")
    axes[1, 1].set_xlabel("Epoch")
    axes[1, 1].legend()
    fig.tight_layout()
    _save(fig, save_path)
