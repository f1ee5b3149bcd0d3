#!/usr/bin/env python
"""Confusion-matrix reports driven by flat runs/ event files.

Capability match for reference generate_confusion_matrix_from_runs.py:17-407:
scans a flat runs/ directory for event files (:17-36), summarizes the
training curves, re-runs validation from the newest checkpoint, and adds a
weighted-average P/R/F1 row to the report (:249-256).
"""

import argparse
from pathlib import Path

import numpy as np

from audio_classification_icbhi_tpu.utils.tensorboard import read_scalars


def summarize_runs(log_dir: str) -> dict:
    """Flat-directory event discovery (reference :17-36)."""
    merged: dict[str, list] = {}
    for ev in sorted(Path(log_dir).glob("events.out.tfevents.*")):
        for tag, pts in read_scalars(ev).items():
            merged.setdefault(tag, []).extend(pts)
    for tag in merged:
        merged[tag].sort()
    return merged


def main():
    parser = argparse.ArgumentParser(
        description="Confusion matrix + training-curve summary from runs/"
    )
    parser.add_argument("--log-dir", type=str, default="runs")
    parser.add_argument("--model", type=str, help="Checkpoint for CM regeneration")
    parser.add_argument("--split", type=str, default="val")
    parser.add_argument("--data-path", type=str)
    parser.add_argument("--segmented", action="store_true")
    parser.add_argument("--output-dir", type=str, default="confusion_matrix_results")
    args = parser.parse_args()

    scalars = summarize_runs(args.log_dir)
    if scalars:
        print(f"Training scalars found in {args.log_dir}:")
        for tag, pts in sorted(scalars.items()):
            vals = [v for _, v in pts]
            print(
                f"  {tag}: {len(pts)} pts, last={vals[-1]:.4f}, "
                f"best={'%.4f' % (max(vals) if 'Acc' in tag or 'ICBHI' in tag else min(vals))}"
            )
    else:
        print(f"No event files in {args.log_dir}")

    if args.model:
        from audio_classification_icbhi_tpu.data.dataset import ICBHIDataset
        from audio_classification_icbhi_tpu.data.dataset_segmented import (
            ICBHISegmentedDataset,
        )
        from audio_classification_icbhi_tpu.inference import ClassifierEngine
        from audio_classification_icbhi_tpu.training.validation import Validator
        from audio_classification_icbhi_tpu.utils.metrics import (
            calculate_metrics,
            print_metrics,
        )
        from generate_confusion_matrix import plot_matrices

        engine = ClassifierEngine(args.model)
        config = engine.config
        if args.data_path:
            config["data"]["dataset_path"] = args.data_path
        cls = ICBHISegmentedDataset if args.segmented else ICBHIDataset
        dataset = cls(config["data"]["dataset_path"], args.split, config, augment=False)
        validator = Validator(engine.model, dataset, config)
        y_true, y_pred, y_prob = validator.validate(engine.params, engine.batch_stats)

        out = Path(args.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        plot_matrices(y_true, y_pred, config["classes"], out, args.split)
        # weighted-average row (reference :249-256)
        metrics = calculate_metrics(y_true, y_pred, y_prob, class_names=config["classes"])
        print_metrics(metrics)
        print(
            f"weighted avg: P={metrics['precision_weighted']:.4f} "
            f"R={metrics['recall_weighted']:.4f} F1={metrics['f1_weighted']:.4f}"
        )
        print(f"✓ Outputs saved to {out}/")


if __name__ == "__main__":
    main()
