#!/usr/bin/env python
"""Streaming-analyzer window throughput: windows/s through the jitted
window->mel->logits->softmax pipeline (AnalyzerEngine's hot path,
replacing reference realtime_analyzer_parallel.py:163-249).

Measures the default analyzer config (1-s windows @ 16 kHz, 2048/512, 128
mels — radix16dif_fused-eligible under the auto policy, no resize) per mel backend, so the
Pallas-vs-XLA delta on the ANALYZER shapes is a recorded artifact
(VERDICT r2 #5). Also reports a sub-second window config (0.5 s ->
1024/256 + bilinear resize) where the fused kernels are genuinely
ineligible and the XLA radix-2 path is the production path.
"""

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def build(windows: int, duration: float, backend: str):
    import jax
    import jax.numpy as jnp

    from audio_classification_icbhi_tpu.analyzers.engine import FlexibleMelFrontend
    from audio_classification_icbhi_tpu.models import LightweightCNN

    fe = FlexibleMelFrontend(16000, 128, 2048, 512, duration=duration,
                             backend=backend)
    model = LightweightCNN(num_classes=4, dtype=jnp.bfloat16)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        ctx = jax.default_device(cpu)
    except RuntimeError:
        import contextlib

        ctx = contextlib.nullcontext()
    with ctx:
        dummy = jnp.zeros((1, 128, fe.target_time_steps, 1), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), dummy, train=False)

    @jax.jit
    def probs_fn(w):
        logits = model.apply(variables, fe(w)[..., None], train=False)
        return jax.nn.softmax(logits, axis=-1)

    rng = np.random.default_rng(0)
    inputs = [
        jnp.asarray(rng.standard_normal((windows, fe.target_length)).astype(np.float32) * 0.1)
        for _ in range(4)
    ]
    return probs_fn, inputs


def measure(fn, inputs, windows: int) -> float:
    for w in inputs:
        float(np.asarray(fn(w))[0, 0])
    def window(reps):
        t0 = time.perf_counter()
        for i in range(reps):
            out = fn(inputs[i % 4])
        float(np.asarray(out)[0, 0])
        return time.perf_counter() - t0

    reps = 6
    while True:
        dt = window(reps)
        if dt > 1.0 or reps >= 192:
            break
        reps *= 2
    dt = min(dt, window(reps), window(reps))
    return windows * reps / dt


def main():
    windows = int(__import__("os").environ.get("BENCH_WINDOWS", 256))
    for duration, backends in ((1.0, ["auto", "xla_radix2"]),
                               (0.5, ["auto"])):
        for backend in backends:
            fn, inputs = build(windows, duration, backend)
            wps = measure(fn, inputs, windows)
            print(f"| {duration:.1f}s windows | {backend} | {windows} | {wps:,.0f} windows/s |",
                  flush=True)


if __name__ == "__main__":
    main()
