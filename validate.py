#!/usr/bin/env python
"""Evaluate a checkpoint: metrics + confusion matrix + ROC PNGs.

Contract matches reference validate.py:20-126: config comes from the
checkpoint first with file fallback (:46-54); outputs land in
validation_results/ (:111-119).
"""

import argparse
from pathlib import Path

from audio_classification_icbhi_tpu.data.dataset import ICBHIDataset
from audio_classification_icbhi_tpu.models import build_model
from audio_classification_icbhi_tpu.training.validation import Validator
from audio_classification_icbhi_tpu.utils.config import load_config, set_seed
from audio_classification_icbhi_tpu.utils.metrics import calculate_metrics, print_metrics
from audio_classification_icbhi_tpu.utils.plotting import (
    plot_confusion_matrix,
    plot_roc_curves,
)
from audio_classification_icbhi_tpu.inference import ClassifierEngine


def parse_args():
    parser = argparse.ArgumentParser(description="Validate audio classification model")
    parser.add_argument("--model", type=str, required=True, help="Path to model checkpoint")
    parser.add_argument("--config", type=str, default="config.yaml", help="Fallback config file")
    parser.add_argument("--split", type=str, default="test", choices=["train", "val", "test"])
    parser.add_argument("--data-path", type=str, help="Override data.dataset_path")
    parser.add_argument(
        "--output-dir", type=str, default="validation_results", help="Directory for reports"
    )
    return parser.parse_args()


def main():
    args = parse_args()
    # ckpt config wins, file is the fallback (:46-54) — passed through the
    # engine so checkpoints without an embedded config actually validate
    # (previously the engine raised before the fallback could apply), and
    # the checkpoint deserializes once instead of twice
    engine = ClassifierEngine(args.model, config=load_config(args.config))
    config = engine.config
    if args.data_path:
        config["data"]["dataset_path"] = args.data_path
    set_seed(config.get("seed", 42))

    dataset = ICBHIDataset(config["data"]["dataset_path"], args.split, config, augment=False)

    model = engine.model
    validator = Validator(model, dataset, config)
    y_true, y_pred, y_prob = validator.validate(engine.params, engine.batch_stats)

    metrics = calculate_metrics(y_true, y_pred, y_prob, class_names=config["classes"])
    print_metrics(metrics)

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    plot_confusion_matrix(
        y_true, y_pred, class_names=config["classes"],
        save_path=out / f"confusion_matrix_{args.split}.png",
    )
    plot_roc_curves(
        y_true, y_prob, class_names=config["classes"],
        save_path=out / f"roc_curves_{args.split}.png",
    )
    print(f"\n✓ Reports saved to {out}/")


if __name__ == "__main__":
    main()
