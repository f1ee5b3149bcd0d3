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


def _install_kill_after_first_epoch(checkpoint_dir: str) -> None:
    """kill1 mode (VERDICT r4 #6): simulate a whole-job preemption at the
    epoch-2 boundary. Every process, on entering train_epoch(epoch=1),
    waits for process 0's epoch-1 checkpoint file to be durably on disk
    (save_every=1, async writer) and then hard-exits with os._exit —
    skipping every finally/drain path, like a real SIGKILL."""
    import os
    import time
    from pathlib import Path

    from audio_classification_icbhi_tpu.training.trainer import Trainer

    orig = Trainer.train_epoch
    ckpt = Path(checkpoint_dir) / "checkpoint_epoch_1.ckpt"

    def patched(self, epoch):
        if epoch >= 1:
            for _ in range(600):
                if ckpt.exists():
                    break
                time.sleep(0.1)
            assert ckpt.exists(), f"epoch-1 checkpoint never landed: {ckpt}"
            os._exit(17)
        return orig(self, epoch)

    Trainer.train_epoch = patched


def main() -> None:
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    data_root, out_dir, out_npz = sys.argv[4], sys.argv[5], sys.argv[6]
    # devices per process (default 4 -> the 2-process global-8 layout;
    # the 4-process variant passes 2 for the same 8-device global mesh)
    devs = int(sys.argv[7]) if len(sys.argv) > 7 else 4
    # full (default) | kill1 (die after epoch 1's checkpoint is durable) |
    # resume (restart from that checkpoint and finish the run)
    mode = sys.argv[8] if len(sys.argv) > 8 else "full"

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
    if mode != "full":
        config["training"]["save_every"] = 1
    if mode == "kill1":
        _install_kill_after_first_epoch(config["training"]["checkpoint_dir"])
        run_trainer(config)
        raise AssertionError("kill1 worker survived past epoch 1")

    if mode == "resume":
        from audio_classification_icbhi_tpu.data.dataset_segmented import (
            ICBHISegmentedDataset,
        )
        from audio_classification_icbhi_tpu.models import build_model
        from audio_classification_icbhi_tpu.training.trainer import Trainer

        train = ICBHISegmentedDataset(data_root, "train", config, augment=True)
        val = ICBHISegmentedDataset(data_root, "val", config, augment=False)
        trainer = Trainer(build_model(config, axis_name="data"), train, val,
                          config)
        ckpt = f"{config['training']['checkpoint_dir']}/checkpoint_epoch_1.ckpt"
        history = trainer.train(resume_from=ckpt)
        assert trainer.start_epoch == 1, trainer.start_epoch
        assert len(history["val_loss"]) == 1  # only epoch 2 ran
    else:
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
