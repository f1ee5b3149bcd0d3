"""Worker for the cross-process FULL-Trainer test (not a pytest module).

Launched twice by tests/test_distributed.py::test_two_process_full_trainer —
each launch is one jax.distributed process owning 4 virtual CPU devices of a
global 8-device 'data' mesh, running the COMPLETE Trainer.train() loop
(loader -> multihost batch placement -> sharded steps -> validation ->
scheduler -> checkpoints) on a shared synthetic dataset. This is the
end-to-end proof behind README's multi-host recipe: the 2-process step-fns
test (distributed_train_worker.py) pins the collectives; this one pins the
Trainer's own placement layer (_global_train_group / _global_eval_batch /
_replicated) and the process-0 checkpoint gating.
"""

from __future__ import annotations

import sys


def build_config(data_root: str, out_dir: str, pid: int) -> dict:
    return {
        "data": {
            "dataset_path": data_root,
            "sample_rate": 4000,
            "n_mels": 32,
            "n_fft": 256,
            "hop_length": 64,
            "duration": 0.8,
            "augmentation": True,
            "train_split": 0.7,
            "val_split": 0.15,
        },
        "model": {"architecture": "cnn", "num_classes": 4, "dropout": 0.1},
        "training": {
            "batch_size": 8,
            "epochs": 2,
            "learning_rate": 3e-3,
            "weight_decay": 1e-4,
            "optimizer": "adam",
            "scheduler": "cosine",
            "mixed_precision": False,
            "gradient_accumulation_steps": 2,
            "early_stopping_patience": 50,
            # TB event filenames collide across same-host processes; the
            # checkpoint dir is SHARED on purpose (process-0-only writes)
            "log_dir": f"{out_dir}/runs{pid}",
            "checkpoint_dir": f"{out_dir}/ckpts",
            "save_every": 10,
        },
        "device": {"use_cuda": False, "num_workers": 2, "pin_memory": False},
        "classes": ["normal", "crackles", "wheezes", "both"],
        "seed": 0,
    }


def run_trainer(config):
    from audio_classification_icbhi_tpu.data.dataset_segmented import (
        ICBHISegmentedDataset,
    )
    from audio_classification_icbhi_tpu.models import build_model
    from audio_classification_icbhi_tpu.training.trainer import Trainer

    root = config["data"]["dataset_path"]
    train = ICBHISegmentedDataset(root, "train", config, augment=True)
    val = ICBHISegmentedDataset(root, "val", config, augment=False)
    t = Trainer(build_model(config, axis_name="data"), train, val, config)
    history = t.train()
    return t, history


def run_validator(trainer, config):
    """Standalone Validator over the val split (multi-host placement path)."""
    from audio_classification_icbhi_tpu.data.dataset_segmented import (
        ICBHISegmentedDataset,
    )
    from audio_classification_icbhi_tpu.training.validation import Validator

    val = ICBHISegmentedDataset(
        config["data"]["dataset_path"], "val", config, augment=False
    )
    v = Validator(trainer.model, val, config, mesh=trainer.mesh)
    return v.validate(trainer.params, trainer.batch_stats)


def main() -> None:
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    data_root, out_dir, out_npz = sys.argv[4], sys.argv[5], sys.argv[6]
    # devices per process (default 4 -> the 2-process global-8 layout;
    # the 4-process variant passes 2 for the same 8-device global mesh)
    devs = int(sys.argv[7]) if len(sys.argv) > 7 else 4

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_platform_name", "cpu")
    jax.config.update("jax_num_cpu_devices", devs)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from audio_classification_icbhi_tpu.parallel.mesh import init_distributed

    idx = init_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    assert idx == pid and jax.process_count() == nproc
    assert jax.device_count() == devs * nproc

    import numpy as np

    config = build_config(data_root, out_dir, pid)
    trainer, history = run_trainer(config)
    assert trainer._multiprocess
    y_true, y_pred, y_prob = run_validator(trainer, config)

    if pid == 0:
        leaves = [np.asarray(x) for x in
                  jax.tree_util.tree_leaves(trainer.params)]
        np.savez(
            out_npz,
            train_loss=np.asarray(history["train_loss"], np.float64),
            val_loss=np.asarray(history["val_loss"], np.float64),
            val_acc=np.asarray(history["val_acc"], np.float64),
            y_true=y_true, y_pred=y_pred, y_prob=y_prob,
            **{f"leaf{i}": l for i, l in enumerate(leaves)},
        )
    print(f"TRAINER-OK pid={pid} val_loss={history['val_loss'][-1]:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
