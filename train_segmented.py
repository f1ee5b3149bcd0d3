#!/usr/bin/env python
"""Train on pre-segmented respiratory cycles (reference train_segmented.py:16-128:
same flow as train.py but ICBHISegmentedDataset + config_segmented.yaml default)."""

from audio_classification_icbhi_tpu.data.dataset_segmented import ICBHISegmentedDataset
from audio_classification_icbhi_tpu.training.trainer import Trainer
from audio_classification_icbhi_tpu.utils.plotting import plot_training_history

from train import build_trainer, parse_args


def main():
    args = parse_args()
    trainer = build_trainer(args, ICBHISegmentedDataset, Trainer, "config_segmented.yaml")
    history = trainer.train(resume_from=args.resume)
    plot_training_history(history, save_path="training_history_segmented.png")
    print("Training history saved to training_history_segmented.png")


if __name__ == "__main__":
    main()
