#!/usr/bin/env python
"""Real-trainer epoch throughput: per-step dispatch vs multi-step-per-
dispatch (VERDICT r2 #3).

benchmarks/train_bench.py times the bare jitted step in an ASYNC loop,
which hides the per-dispatch tunnel cost the real Trainer pays — its
hot loop (training/trainer.py:train_epoch) gathers each batch eagerly,
feeds donated state back, and keeps the queue shallow, all of which
serialize against the ~5 ms dispatch floor and the 30-50 ms scalar-fetch
RPCs. This benchmark times Trainer.train_epoch itself on a synthetic
segmented dataset (batch 32 x accum 4, 3 s clips — the
config_segmented.yaml shape), comparing:

- steps_per_dispatch=1 — the per-step path (one dispatch + one blocking
  sync per optimizer step);
- steps_per_dispatch=0 — the fused path (_train_epoch_fused): the whole
  epoch's shuffled index table ships once, K optimizer steps lax.scan on
  device against the HBM-resident waveform cache, metrics fetched ONCE.

Round-3 measurement on the tunneled v5e: 85.4 -> 16.5 ms/step (5.2x,
1,565 -> 8,101 clips/s); chunked spd=4 lands at 18.1 ms/step. Late-r3
rerun at --per-class 1500 (5,400 clips/epoch, 300-clip val split):
train 59.4 -> 14.3 ms/step (4.2x, 2,166 -> 8,978 clips/s); validation
445.0 -> 89.3 ms/epoch with fused eval_many (5.0x, 674 -> 3,358
clips/s) — the whole val epoch's full batches scan in ONE dispatch.
"""

from __future__ import annotations

import copy
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

CFG = {
    "data": {"dataset_path": "", "sample_rate": 16000, "n_mels": 128,
             "n_fft": 2048, "hop_length": 512, "duration": 3.0,
             "augmentation": True, "train_split": 0.9, "val_split": 0.05,
             "test_split": 0.05, "cache_on_device": True},
    "model": {"architecture": "cnn", "num_classes": 4, "dropout": 0.3},
    "training": {"batch_size": 32, "epochs": 1, "learning_rate": 3e-3,
                 "weight_decay": 0.0, "optimizer": "adam", "scheduler": "cosine",
                 "mixed_precision": True, "gradient_accumulation_steps": 4,
                 "early_stopping_patience": 1000, "save_every": 10**9,
                 "checkpoint_dir": "/tmp/epoch_bench_ckpt",
                 "log_dir": "/tmp/epoch_bench_runs",
                 "class_weighting": True},
    "classes": ["normal", "crackles", "wheezes", "both"],
    "seed": 42,
}


def main():
    import argparse

    from audio_classification_icbhi_tpu.data.dataset_segmented import (
        ICBHISegmentedDataset,
    )
    from audio_classification_icbhi_tpu.data.synthetic import (
        generate_segmented_dataset,
    )
    from audio_classification_icbhi_tpu.models import build_model
    from audio_classification_icbhi_tpu.parallel.mesh import DATA_AXIS, get_mesh
    from audio_classification_icbhi_tpu.training.trainer import Trainer

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--per-class", type=int, default=260,
                    help="synthetic clips per class; the default (~7 optimizer "
                         "steps/epoch) makes ms/step an epoch-OVERHEAD metric — "
                         "the one metric fetch (~30-50 ms RPC) plus a few "
                         "dispatches spread over 7 steps. Use ~1000+ to see the "
                         "amortized per-step cost of the fused path.")
    ap.add_argument("--spd", type=int, nargs="+", default=[1, 0, 4],
                    help="steps_per_dispatch values to compare")
    args = ap.parse_args()

    root = generate_segmented_dataset(
        f"/tmp/epoch_bench_data_{args.per_class}", per_class=args.per_class,
        duration=3.0, seed=0)
    for spd in args.spd:
        cfg = copy.deepcopy(CFG)
        cfg["training"]["steps_per_dispatch"] = spd
        train = ICBHISegmentedDataset(root, "train", cfg, augment=True)
        val = ICBHISegmentedDataset(root, "val", cfg, augment=False)
        t = Trainer(build_model(cfg, axis_name=DATA_AXIS), train, val, cfg,
                    mesh=get_mesh(num_devices=1))
        t.train_epoch(0)  # compile
        t.train_epoch(1)  # donated-layout recompile
        t0 = time.perf_counter()
        epochs = 4
        for e in range(2, 2 + epochs):
            t.train_epoch(e)
        dt = (time.perf_counter() - t0) / epochs
        n = len(train)
        # optimizer steps per epoch INCLUDING the partial tail accumulation
        # group the trainer really steps (trainer._train_epoch_fused /
        # _grouped_batches both step it) — n // (batch*accum) undercounted
        # and overstated ms/step ~14% at the default sizes
        batches = n // cfg["training"]["batch_size"]  # drop_last=True
        accum = cfg["training"]["gradient_accumulation_steps"]
        steps = -(-batches // accum)
        label = {1: "per-step dispatch", 0: "whole-epoch fused"}.get(
            spd, f"chunked spd={spd}")
        print(f"{label:20s}: {dt:.3f} s/epoch ({n} clips, ~{steps} steps, "
              f"{n / dt:7,.0f} clips/s, {dt / steps * 1000:6.1f} ms/step)",
              flush=True)
        # validation epoch: spd=1 pays one dispatch + blocking metric sync
        # per val batch; spd!=1 scans every full batch in ONE eval_many
        # dispatch (+ per-step tail) and fetches metrics once
        t.validate(0)  # compile
        t0 = time.perf_counter()
        for _ in range(epochs):
            t.validate(0)
        dv = (time.perf_counter() - t0) / epochs
        nv = len(val)
        mode = "fused eval_many" if t._use_fused_eval() else "per-batch eval"
        print(f"{'  val (' + mode + ')':32s}: {dv * 1000:7.1f} ms/epoch "
              f"({nv} clips, {nv / dv:7,.0f} clips/s)", flush=True)


if __name__ == "__main__":
    main()
