#!/usr/bin/env python
"""Train an ICBHI classifier on whole recordings (TPU-native).

CLI contract matches reference train.py:16-27 (--config/--model/--epochs/
--batch-size/--learning-rate/--device), with TPU-relevant extensions:
--data-path, --resume, --num-devices.
"""

import argparse

from audio_classification_icbhi_tpu.data.dataset import ICBHIDataset
from audio_classification_icbhi_tpu.models import build_model
from audio_classification_icbhi_tpu.parallel.mesh import DATA_AXIS, get_mesh
from audio_classification_icbhi_tpu.training.trainer import Trainer
from audio_classification_icbhi_tpu.utils.config import load_config, set_seed
from audio_classification_icbhi_tpu.utils.plotting import plot_training_history


def parse_args():
    parser = argparse.ArgumentParser(description="Train audio classification model")
    # default=None so each entry point supplies its own default config file
    # (an eager "config.yaml" default forced train_segmented/training_icbhi
    # into a sentinel check that hijacked an EXPLICIT --config config.yaml)
    parser.add_argument("--config", type=str, default=None, help="Path to configuration file")
    parser.add_argument("--model", type=str, choices=["cnn", "resnet"], help="Model architecture")
    parser.add_argument("--epochs", type=int, help="Number of epochs")
    parser.add_argument("--batch-size", type=int, help="Batch size")
    parser.add_argument("--learning-rate", type=float, help="Learning rate")
    parser.add_argument(
        "--device", type=str, choices=["cuda", "cpu", "tpu"], help="Accepted for reference-CLI compatibility"
    )
    parser.add_argument("--data-path", type=str, help="Override data.dataset_path")
    parser.add_argument("--resume", type=str, help="Checkpoint to resume from")
    parser.add_argument("--num-devices", type=int, help="Limit the data-parallel mesh size")
    parser.add_argument(
        "--profile", type=str, metavar="DIR",
        help="Write a jax.profiler trace of the first epoch to DIR",
    )
    parser.add_argument(
        "--multihost", action="store_true",
        help="Call jax.distributed.initialize before building the mesh "
        "(TPU pod slice: run this same command once per host; the TPU "
        "environment autodetects coordinator/process_id). For manual "
        "bring-up set --coordinator host:port, --num-processes, "
        "--process-id.",
    )
    parser.add_argument("--coordinator", type=str, help="host:port of process 0")
    parser.add_argument("--num-processes", type=int, help="Total host processes")
    parser.add_argument("--process-id", type=int, help="This host's process index")
    return parser.parse_args()


def build_trainer(args, dataset_cls, trainer_cls, default_config: str):
    """Shared setup for all train entry points."""
    if getattr(args, "multihost", False):
        from audio_classification_icbhi_tpu.parallel.mesh import init_distributed

        idx = init_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
            auto=True,  # --multihost with no explicit args = pod autodetect
        )
        print(f"Distributed: process {idx}")
    config = load_config(args.config if args.config else default_config)
    # `is not None` (not truthiness): --epochs 0 / --learning-rate 0.0 are
    # explicit values (e.g. a build-everything-train-nothing smoke run) and
    # must not silently fall back to the config defaults
    if args.model:
        config["model"]["architecture"] = args.model
    if args.epochs is not None:
        config["training"]["epochs"] = args.epochs
    if args.batch_size is not None:
        config["training"]["batch_size"] = args.batch_size
    if args.learning_rate is not None:
        config["training"]["learning_rate"] = args.learning_rate
    if args.data_path:
        config["data"]["dataset_path"] = args.data_path

    set_seed(config.get("seed", 42))
    mesh = get_mesh(num_devices=args.num_devices)

    print("\n" + "=" * 60)
    print("TRAINING CONFIGURATION")
    print("=" * 60)
    print(f"Model: {config['model']['architecture']}")
    print(f"Epochs: {config['training']['epochs']}")
    print(f"Batch size: {config['training']['batch_size']}")
    print(f"Learning rate: {config['training']['learning_rate']}")
    print(f"Mesh: {mesh.devices.size} device(s)")
    print("=" * 60)

    augment = bool(config["data"].get("augmentation", False))
    train_ds = dataset_cls(config["data"]["dataset_path"], "train", config, augment=augment)
    val_ds = dataset_cls(config["data"]["dataset_path"], "val", config, augment=False)
    # axis_name wires cross-replica BatchNorm sync to the data mesh; without
    # it each device accumulates divergent batch_stats (advisor r1, medium).
    model = build_model(config, axis_name=DATA_AXIS)
    return trainer_cls(model, train_ds, val_ds, config, mesh=mesh)


def main():
    args = parse_args()
    trainer = build_trainer(args, ICBHIDataset, Trainer, "config.yaml")
    history = trainer.train(resume_from=args.resume, profile_dir=args.profile)
    plot_training_history(history, save_path="training_history.png")
    print("Training history saved to training_history.png")


if __name__ == "__main__":
    main()
