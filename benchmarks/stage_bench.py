#!/usr/bin/env python
"""Stage decomposition of the north-star pipeline at the bench batch size.

Times three jitted programs with bench.py's tunnel-measurement hygiene:

- mel:    wav -> normalized log-mel image (the DSP front end alone)
- cnn:    mel image -> logits (the classifier alone)
- full:   wav -> logits (what bench.py measures)

full < mel + cnn is the fusion dividend; the larger stage is where further
kernel work pays. Run on the TPU: python benchmarks/stage_bench.py
[--batch 128] [--backend auto].
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def measure(fn, inputs, batch: int) -> float:
    """Best-of-3-windows clips/s (same hygiene as bench.py: device-resident
    rotating inputs, real data fetch at the window end).

    The window-ending fetch must be a SCALAR: fetching one element of a
    large array transfers the whole buffer through the tunnel (~27 MB/s —
    a 41 MB mel batch costs 1.5 s, dwarfing its 10 ms compute), so fn's
    output is reduced on-device first.
    """
    import jax

    red = jax.jit(lambda w: fn(w).sum())
    for w in inputs:  # compile + force completion of BOTH programs
        fn(w)
        float(np.asarray(red(w)))

    def timed_window(reps):
        t0 = time.perf_counter()
        for i in range(reps - 1):
            fn(inputs[i % len(inputs)])
        out = red(inputs[(reps - 1) % len(inputs)])
        float(np.asarray(out))
        return time.perf_counter() - t0

    reps = 6
    while True:
        dt = timed_window(reps)
        if dt > 1.0 or reps >= 192:
            break
        reps *= 2
    dt = min(dt, timed_window(reps), timed_window(reps))
    return batch * reps / dt


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--batches", type=str, default=None,
                    help="Comma list (e.g. 128,512,1024): per-stage "
                         "retention table attributing where large-batch "
                         "throughput goes (VERDICT r3 #3)")
    ap.add_argument("--backend", type=str, default="auto")
    ap.add_argument("--algorithm", type=str, default=None,
                    help="Force a Pallas kernel (e.g. radix8dif_fused); "
                         "implies --backend pallas")
    ap.add_argument("--fused-cnn", action="store_true",
                    help="Force the Pallas-fused blocks 1-3 (measured "
                         "slower than XLA on-chip in the r5 A/B — an "
                         "opt-in, like ICBHI_FUSED_CNN=1)")
    ap.add_argument("--no-fused-cnn", action="store_true",
                    help="Force the plain flax conv stack (the production "
                         "default since the r5 A/B)")
    args = ap.parse_args()
    if args.algorithm:
        args.backend = "pallas"

    import jax
    import jax.numpy as jnp

    from audio_classification_icbhi_tpu.models import LightweightCNN
    from audio_classification_icbhi_tpu.ops.mel import MelFrontend
    from audio_classification_icbhi_tpu.parallel.data_parallel import features_from_wavs

    frontend = MelFrontend(sample_rate=16000, n_mels=128, n_fft=2048,
                           hop_length=512, duration=5.0, backend=args.backend,
                           pallas_algorithm=args.algorithm)
    model = LightweightCNN(num_classes=4, dtype=jnp.bfloat16)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        ctx = jax.default_device(cpu)
    except RuntimeError:
        import contextlib

        ctx = contextlib.nullcontext()
    with ctx:
        dummy = jnp.zeros((1, 128, frontend.num_frames, 1), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), dummy, train=False)

    # same path selection as bench.py (XLA default; fused is opt-in),
    # with --fused-cnn / --no-fused-cnn overriding for A/B tables
    from audio_classification_icbhi_tpu.models.fused_infer import (
        fused_apply_supported, fused_cnn_enabled, make_fused_apply)

    use_fused = (args.fused_cnn or fused_cnn_enabled(dummy.shape)) \
        and not args.no_fused_cnn
    if use_fused and jax.default_backend() == "tpu" \
            and fused_apply_supported(dummy.shape):
        apply_fn = make_fused_apply(variables)
    else:
        apply_fn = lambda feats: model.apply(variables, feats, train=False)  # noqa: E731

    mel_fn = jax.jit(lambda w: features_from_wavs(frontend, w))
    cnn_fn = jax.jit(apply_fn)
    full_fn = jax.jit(lambda w: apply_fn(features_from_wavs(frontend, w)))

    rng = np.random.default_rng(0)

    def stage_rows(batch: int) -> dict[str, float]:
        wavs = [
            jnp.asarray(rng.standard_normal(
                (batch, frontend.target_length)).astype(np.float32) * 0.1)
            for _ in range(4)
        ]
        mels = [mel_fn(w) for w in wavs]
        jax.block_until_ready(mels)
        return {
            name: measure(fn, inp, batch)
            for name, fn, inp in (
                ("mel", mel_fn, wavs), ("cnn", cnn_fn, mels),
                ("full", full_fn, wavs),
            )
        }

    if args.batches:
        batches = [int(b) for b in args.batches.split(",")]
        table = {b: stage_rows(b) for b in batches}
        base = table[batches[0]]
        print(f"\nper-stage retention vs batch {batches[0]} "
              f"(backend={args.backend}):")
        print(f"{'batch':>6s} " + "".join(
            f"{s + ' clips/s':>16s} {'ret%':>6s}" for s in ("mel", "cnn", "full")))
        for b in batches:
            row = table[b]
            print(f"{b:6d} " + "".join(
                f"{row[s]:16,.0f} {100 * row[s] / base[s]:5.1f}%"
                for s in ("mel", "cnn", "full")))
        # attribution: how much of full's lost ms/clip each stage explains
        for b in batches[1:]:
            d_full = 1e3 / table[b]["full"] - 1e3 / base["full"]
            d_mel = 1e3 / table[b]["mel"] - 1e3 / base["mel"]
            d_cnn = 1e3 / table[b]["cnn"] - 1e3 / base["cnn"]
            resid = d_full - d_mel - d_cnn
            print(f"batch {b}: full loses {d_full * 1e3:+.2f} us/clip vs "
                  f"{batches[0]} — mel {d_mel * 1e3:+.2f}, cnn {d_cnn * 1e3:+.2f}, "
                  f"residual (fusion/dispatch) {resid * 1e3:+.2f}")
        return

    rows = stage_rows(args.batch)
    for name in ("mel", "cnn", "full"):
        cps = rows[name]
        print(f"{name:5s} {cps:10,.0f} clips/s   {1e3 * args.batch / cps:7.3f} ms/batch")
    fused_ms = 1e3 * args.batch / rows["full"]
    sum_ms = 1e3 * args.batch * (1 / rows["mel"] + 1 / rows["cnn"])
    print(f"fusion dividend: mel+cnn {sum_ms:.3f} ms vs full {fused_ms:.3f} ms "
          f"({100 * (sum_ms - fused_ms) / sum_ms:+.1f}% incl. saved dispatch)")


if __name__ == "__main__":
    main()
