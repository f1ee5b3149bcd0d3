#!/usr/bin/env python
"""Train with ICBHI-score-based model selection (reference training_icbhi.py:67-168:
same flow but TrainerWithICBHI + 4-panel ICBHI history plot :17-64)."""

from audio_classification_icbhi_tpu.data.dataset_segmented import ICBHISegmentedDataset
from audio_classification_icbhi_tpu.training.trainer_icbhi import TrainerWithICBHI
from audio_classification_icbhi_tpu.utils.plotting import plot_icbhi_history

from train import build_trainer, parse_args


def main():
    args = parse_args()
    trainer = build_trainer(
        args, ICBHISegmentedDataset, TrainerWithICBHI, "config_segmented.yaml"
    )
    history = trainer.train(resume_from=args.resume)
    plot_icbhi_history(history, save_path="icbhi_training_history.png")
    print("ICBHI training history saved to icbhi_training_history.png")


if __name__ == "__main__":
    main()
