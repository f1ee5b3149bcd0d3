#!/usr/bin/env python
"""North-star benchmark: fused wav->logits clips/sec/chip.

Measures the full on-device pipeline (mel front end + LightweightCNN in
bf16) on 5 s / 16 kHz clips — BASELINE.json config #1 — and prints ONE JSON
line. vs_baseline is relative to the RTX-3050 reference's ~10 ms/clip
(~100 clips/s, /root/repo/BASELINE.md); the target is >= 20x.
"""

import json
import sys
import time

import numpy as np

BASELINE_CLIPS_PER_SEC = 100.0  # RTX-3050 ~10 ms/clip (BASELINE.md)


def build_pipeline(batch: int, backend: str = "auto"):
    import jax
    import jax.numpy as jnp

    from audio_classification_icbhi_tpu.models import LightweightCNN
    from audio_classification_icbhi_tpu.ops.mel import MelFrontend
    from audio_classification_icbhi_tpu.parallel.data_parallel import features_from_wavs

    frontend = MelFrontend(sample_rate=16000, n_mels=128, n_fft=2048,
                           hop_length=512, duration=5.0, use_matmul_dft=True,
                           backend=backend)
    model = LightweightCNN(num_classes=4, dtype=jnp.bfloat16)
    try:  # init on CPU: eager-init dispatches are slow through the tunnel
        cpu = jax.local_devices(backend="cpu")[0]
        ctx = jax.default_device(cpu)
    except RuntimeError:
        import contextlib

        ctx = contextlib.nullcontext()
    with ctx:
        dummy = jnp.zeros((1, 128, frontend.num_frames, 1), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), dummy, train=False)

    @jax.jit
    def wav_to_logits(wavs):
        return model.apply(variables, features_from_wavs(frontend, wavs), train=False)

    rng = np.random.default_rng(0)
    # rotate distinct device-resident inputs and end with a REAL data fetch:
    # rules out any same-input caching and early-returning block_until_ready
    # on tunneled backends (cross-checked: matches same-input timing here)
    inputs = [
        jnp.asarray(rng.standard_normal((batch, frontend.target_length)).astype(np.float32) * 0.1)
        for _ in range(4)
    ]
    return wav_to_logits, inputs


def measure(wav_to_logits, inputs, batch: int) -> float:
    """Best-of-3-windows clips/s with full tunnel-measurement hygiene."""
    for w in inputs:  # compile + force completion
        float(np.asarray(wav_to_logits(w))[0, 0])

    def timed_window(reps):
        t0 = time.perf_counter()
        for i in range(reps):
            out = wav_to_logits(inputs[i % 4])
        float(np.asarray(out)[0, 0])
        return time.perf_counter() - t0

    reps = 6
    while True:
        dt = timed_window(reps)
        if dt > 1.0 or reps >= 192:
            break
        reps *= 2
    # tunnel latency is noisy: best of 3 windows is the standard throughput
    dt = min(dt, timed_window(reps), timed_window(reps))
    return batch * reps / dt


def flops_per_clip(wav_to_logits, example) -> float | None:
    """XLA's own post-optimization FLOP count for one compiled step
    (wav_to_logits is already jit-wrapped, so lower() is available)."""
    try:
        cost = wav_to_logits.lower(example).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost["flops"]) / example.shape[0]
    except Exception:
        return None


def sweep():
    """Batch x backend characterization (VERDICT r1 #9): where the dispatch
    floor ends, where compute saturates, and what each mel backend does to
    END-TO-END throughput. Markdown table to stdout (paste into PARITY.md)."""
    peak_tflops = 197.0  # v5e bf16 MXU peak / chip
    # auto's policy is shape/platform-based, not batch-based: radix4_fused
    # on TPU whenever the shape qualifies (ops/mel.py:_auto_pallas), at every
    # batch size; the explicit backends pin each path for comparison
    backends = ["auto", "xla_radix2", "xla", "pallas"]
    batches = [8, 32, 128, 512, 1024]
    rows = []
    for backend in backends:
        for batch in batches:
            fn, inputs = build_pipeline(batch, backend)
            cps = measure(fn, inputs, batch)
            fpc = flops_per_clip(fn, inputs[0])
            tflops = cps * fpc / 1e12 if fpc else None
            rows.append((backend, batch, cps, fpc, tflops))
            util = f"{100 * tflops / peak_tflops:.1f}%" if tflops else "?"
            print(f"| {backend} | {batch} | {cps:,.0f} | "
                  f"{(fpc or 0) / 1e9:.2f} | {tflops or 0:.1f} | {util} |",
                  flush=True)
    best = max(rows, key=lambda r: r[2])
    print(f"\nbest: backend={best[0]} batch={best[1]} {best[2]:,.0f} clips/s")


def main():
    batch = int(__import__("os").environ.get("BENCH_BATCH", 128))
    wav_to_logits, inputs = build_pipeline(batch)
    clips_per_sec = measure(wav_to_logits, inputs, batch)
    print(json.dumps({
        "metric": "wav_to_logits_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 1),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    if "--sweep" in sys.argv:
        sweep()
    else:
        main()
