#!/usr/bin/env python
"""Post-hoc confusion-matrix reports from a checkpoint (+ TensorBoard run
discovery).

Capability match for reference generate_confusion_matrix.py:23-430:
re-runs validation from a checkpoint (:62-128), renders a count+percentage
CM and a normalized RdYlGn CM (:131-252), prints a classification report
(:255-283), saves PNG/NPY/CSV (:393-423), and can list the training scalars
found in the runs/ event files (:23-59) via our dependency-free event
reader.
"""

import argparse
from pathlib import Path

import numpy as np

from audio_classification_icbhi_tpu.data.dataset import ICBHIDataset
from audio_classification_icbhi_tpu.data.dataset_segmented import ICBHISegmentedDataset
from audio_classification_icbhi_tpu.inference import ClassifierEngine
from audio_classification_icbhi_tpu.training.validation import Validator
from audio_classification_icbhi_tpu.utils.tensorboard import read_scalars


def discover_run_scalars(log_dir: str) -> None:
    """Reference :23-59: find event files and summarize logged scalars."""
    log_path = Path(log_dir)
    events = sorted(log_path.rglob("events.out.tfevents.*"))
    if not events:
        print(f"No event files under {log_dir}")
        return
    for ev in events:
        scalars = read_scalars(ev)
        print(f"\n{ev}:")
        for tag, points in sorted(scalars.items()):
            last_step, last_val = points[-1]
            print(f"  {tag}: {len(points)} points, last={last_val:.4f} @ step {last_step}")


def plot_matrices(y_true, y_pred, class_names, out_dir: Path, split: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns
    from sklearn.metrics import classification_report, confusion_matrix

    cm = confusion_matrix(y_true, y_pred, labels=list(range(len(class_names))))
    row_sums = np.maximum(cm.sum(axis=1, keepdims=True), 1)
    pct = 100.0 * cm / row_sums

    # count + percentage CM (reference :131-197)
    annot = np.empty(cm.shape, dtype=object)
    for i in range(cm.shape[0]):
        for j in range(cm.shape[1]):
            annot[i, j] = f"{cm[i, j]}\n{pct[i, j]:.1f}%"
    fig, ax = plt.subplots(figsize=(9, 7))
    sns.heatmap(cm, annot=annot, fmt="", cmap="Blues",
                xticklabels=class_names, yticklabels=class_names, ax=ax)
    ax.set_xlabel("Predicted")
    ax.set_ylabel("True")
    ax.set_title(f"Confusion Matrix ({split})")
    fig.savefig(out_dir / f"confusion_matrix_{split}.png", dpi=150, bbox_inches="tight")
    plt.close(fig)

    # normalized RdYlGn CM (reference :200-252)
    norm = cm / row_sums
    fig, ax = plt.subplots(figsize=(9, 7))
    sns.heatmap(norm, annot=True, fmt=".2f", cmap="RdYlGn",
                xticklabels=class_names, yticklabels=class_names, ax=ax,
                vmin=0.0, vmax=1.0)
    ax.set_xlabel("Predicted")
    ax.set_ylabel("True")
    ax.set_title(f"Normalized Confusion Matrix ({split})")
    fig.savefig(out_dir / f"confusion_matrix_{split}_normalized.png", dpi=150,
                bbox_inches="tight")
    plt.close(fig)

    # classification report (reference :255-283)
    print("\n" + classification_report(
        y_true, y_pred, labels=list(range(len(class_names))),
        target_names=class_names, zero_division=0,
    ))

    # raw exports (reference :393-423)
    np.save(out_dir / f"confusion_matrix_{split}.npy", cm)
    import csv
    with open(out_dir / f"confusion_matrix_{split}.csv", "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow([""] + class_names)
        for name, row in zip(class_names, cm):
            writer.writerow([name] + row.tolist())
    return cm


def main():
    parser = argparse.ArgumentParser(description="Generate confusion-matrix reports")
    parser.add_argument("--model", type=str, required=True, help="Checkpoint path")
    parser.add_argument("--split", type=str, default="val", choices=["train", "val", "test"])
    parser.add_argument("--data-path", type=str, help="Override data.dataset_path")
    parser.add_argument("--segmented", action="store_true", help="Use the segmented dataset")
    parser.add_argument("--log-dir", type=str, help="Also summarize TensorBoard scalars here")
    parser.add_argument("--output-dir", type=str, default="confusion_matrix_results")
    args = parser.parse_args()

    if args.log_dir:
        discover_run_scalars(args.log_dir)

    engine = ClassifierEngine(args.model)
    config = engine.config
    if args.data_path:
        config["data"]["dataset_path"] = args.data_path
    cls = ICBHISegmentedDataset if args.segmented else ICBHIDataset
    dataset = cls(config["data"]["dataset_path"], args.split, config, augment=False)
    validator = Validator(engine.model, dataset, config)
    y_true, y_pred, _ = validator.validate(engine.params, engine.batch_stats)

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    cm = plot_matrices(y_true, y_pred, config["classes"], out, args.split)
    acc = float(np.trace(cm)) / max(cm.sum(), 1)
    print(f"Accuracy ({args.split}): {acc:.4f}")
    print(f"✓ Outputs saved to {out}/")


if __name__ == "__main__":
    main()
