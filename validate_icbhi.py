#!/usr/bin/env python
"""Evaluate a checkpoint with ICBHI 2017 scoring on segmented data.

Contract matches reference src/training/validate_icbhi.py:22-188: ICBHI
score + per-class sens/spec, icbhi_metrics_{split}.png,
confusion_matrix_{split}.png, and icbhi_results_{split}.txt (:126-180).
"""

import argparse
from pathlib import Path

from audio_classification_icbhi_tpu.data.dataset_segmented import ICBHISegmentedDataset
from audio_classification_icbhi_tpu.training.validation import Validator
from audio_classification_icbhi_tpu.utils.config import load_config, set_seed
from audio_classification_icbhi_tpu.utils.icbhi_metrics import (
    calculate_detailed_confusion_metrics,
    calculate_icbhi_score,
    print_icbhi_metrics,
)
from audio_classification_icbhi_tpu.utils.plotting import (
    plot_icbhi_confusion_matrix,
    plot_icbhi_metrics,
)
from audio_classification_icbhi_tpu.inference import ClassifierEngine

SEG_CLASSES = ["normal", "crackle", "wheeze", "both"]


def parse_args():
    parser = argparse.ArgumentParser(description="Validate with ICBHI 2017 scoring")
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--config", type=str, default="config_segmented.yaml")
    parser.add_argument("--split", type=str, default="test", choices=["train", "val", "test"])
    parser.add_argument("--data-path", type=str, help="Override data.dataset_path")
    parser.add_argument("--output-dir", type=str, default="validation_results")
    return parser.parse_args()


def main():
    args = parse_args()
    # same ckpt-config-first contract as validate.py, through the engine so
    # config-less checkpoints work and the file deserializes once
    engine = ClassifierEngine(args.model, config=load_config(args.config))
    config = engine.config
    if args.data_path:
        config["data"]["dataset_path"] = args.data_path
    set_seed(config.get("seed", 42))

    dataset = ICBHISegmentedDataset(
        config["data"]["dataset_path"], args.split, config, augment=False
    )
    validator = Validator(engine.model, dataset, config)
    y_true, y_pred, _ = validator.validate(engine.params, engine.batch_stats)

    metrics = calculate_icbhi_score(y_true, y_pred, class_names=SEG_CLASSES)
    print_icbhi_metrics(metrics, class_names=SEG_CLASSES)
    detailed = calculate_detailed_confusion_metrics(y_true, y_pred, class_names=SEG_CLASSES)

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    plot_icbhi_metrics(metrics, class_names=SEG_CLASSES,
                       save_path=out / f"icbhi_metrics_{args.split}.png")
    plot_icbhi_confusion_matrix(y_true, y_pred, class_names=SEG_CLASSES,
                                save_path=out / f"confusion_matrix_{args.split}.png")

    report = out / f"icbhi_results_{args.split}.txt"
    with open(report, "w") as f:
        f.write(f"ICBHI 2017 results ({args.split} split)\n")
        f.write("=" * 50 + "\n")
        f.write(f"ICBHI Score:      {metrics['icbhi_score']:.4f}\n")
        f.write(f"Avg Sensitivity:  {metrics['avg_sensitivity']:.4f}\n")
        f.write(f"Avg Specificity:  {metrics['avg_specificity']:.4f}\n")
        f.write(f"Accuracy:         {metrics['accuracy']:.4f}\n\n")
        for name in SEG_CLASSES:
            m = metrics["per_class_metrics"][name]
            d = detailed["per_class"][name]
            f.write(
                f"{name}: sens={m['sensitivity']:.4f} spec={m['specificity']:.4f} "
                f"TP={d['TP']} FP={d['FP']} FN={d['FN']} TN={d['TN']}\n"
            )
    print(f"\n✓ Reports saved to {out}/")


if __name__ == "__main__":
    main()
