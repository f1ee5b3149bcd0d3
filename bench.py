#!/usr/bin/env python
"""North-star benchmark: fused wav->logits clips/sec/chip.

Measures the full on-device pipeline (mel front end + LightweightCNN in
bf16) on 5 s / 16 kHz clips — BASELINE.json config #1 — and prints ONE JSON
line. vs_baseline is relative to the RTX-3050 reference's ~10 ms/clip
(~100 clips/s, /root/repo/BASELINE.md); the target is >= 20x.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from audio_classification_icbhi_tpu.models import LightweightCNN
    from audio_classification_icbhi_tpu.ops.mel import MelFrontend
    from audio_classification_icbhi_tpu.parallel.data_parallel import features_from_wavs

    batch = int(__import__("os").environ.get("BENCH_BATCH", 128))
    frontend = MelFrontend(sample_rate=16000, n_mels=128, n_fft=2048,
                           hop_length=512, duration=5.0, use_matmul_dft=True)
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
    clips_per_sec = batch * reps / dt
    baseline_clips_per_sec = 100.0  # RTX-3050 ~10 ms/clip (BASELINE.md)
    print(json.dumps({
        "metric": "wav_to_logits_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 1),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / baseline_clips_per_sec, 2),
    }))


if __name__ == "__main__":
    main()
