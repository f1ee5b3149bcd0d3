#!/usr/bin/env python
"""Training-step throughput on the current backend.

BASELINE reference: RTX 3050 trains 100 epochs in ~2-3 h (README.md:177).
ICBHI has ~920 recordings -> ~644 train samples -> ~20 batches/epoch at
batch 32 -> ~2000 optimizer steps per 100 epochs, i.e. the reference spends
~4-5 s per effective step (incl. CPU preprocessing). This script measures
our full sharded train step (on-device augmentation + mel + fwd/bwd +
optimizer) in clips/s and steps/s.
"""

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main():
    import jax
    import jax.numpy as jnp

    from audio_classification_icbhi_tpu.models import build_model
    from audio_classification_icbhi_tpu.ops.mel import MelFrontend
    from audio_classification_icbhi_tpu.parallel.data_parallel import make_step_fns
    from audio_classification_icbhi_tpu.parallel.mesh import get_mesh
    from audio_classification_icbhi_tpu.training.optimizers import build_optimizer

    for name, duration, batch, accum, arch in (
        ("whole-recording cnn (config.yaml)", 8.0, 32, 2, "cnn"),
        ("segmented cnn (config_segmented.yaml)", 3.0, 32, 4, "cnn"),
        ("resnet18 batch64", 8.0, 64, 1, "resnet"),
    ):
        config = {
            "model": {"architecture": arch, "num_classes": 4, "dropout": 0.3},
            "training": {"mixed_precision": True},
        }
        mesh = get_mesh()
        frontend = MelFrontend(duration=duration)
        model = build_model(config, axis_name="data")
        tx = build_optimizer("adam", 1e-4)
        steps = make_step_fns(model, frontend, tx, mesh, accum_steps=accum, augment=True)

        dummy = jnp.zeros((1, 128, frontend.num_frames, 1), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), dummy, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = tx.init(params)

        rng = np.random.default_rng(0)
        wavs = jnp.asarray(
            rng.standard_normal((accum, batch, frontend.target_length)).astype(np.float32) * 0.1
        )
        labels = jnp.asarray(rng.integers(0, 4, (accum, batch)).astype(np.int32))
        cw = np.ones(4, np.float32)
        import os as _os

        # BENCH_RNG_IMPL=rbg measures training.rng_impl's effect (hardware
        # RNG bits for the ~1.5M augmentation gaussians per microbatch)
        _impl = _os.environ.get("BENCH_RNG_IMPL")
        key = (jax.random.key(0, impl=_impl) if _impl
               else jax.random.PRNGKey(0))

        t0 = time.perf_counter()
        # Warmup: step 0 compiles; step 1 RE-compiles for the device-native
        # layouts of the fed-back (donated) state (measured 65 s + 16 s on
        # the tunneled v5e) — both must complete (data fetch) before timing
        # or they land inside the timed loop.
        for i in range(3):
            params, batch_stats, opt_state, m = steps.train_step(
                params, batch_stats, opt_state, wavs, labels, cw, np.float32(3e-3),
                jax.random.fold_in(key, 1000 + i),
            )
            float(np.asarray(m["loss"]))
        compile_s = time.perf_counter() - t0

        reps = 40
        t0 = time.perf_counter()
        for i in range(reps):
            params, batch_stats, opt_state, m = steps.train_step(
                params, batch_stats, opt_state, wavs, labels, cw, np.float32(3e-3),
                jax.random.fold_in(key, i),
            )
        # force real completion with a data fetch (block_until_ready can
        # return early through the tunnel)
        float(np.asarray(m["loss"]))
        dt = (time.perf_counter() - t0) / reps
        clips = accum * batch
        print(
            f"{name}: {dt * 1000:7.1f} ms/step ({clips / dt:7.0f} clips/s) "
            f"[compile {compile_s:.1f}s, loss {float(m['loss']):.3f}]",
            flush=True,
        )

        # --- multi-step-per-dispatch (Trainer cache_on_device path): K
        # optimizer steps scanned on device against an HBM-resident cache,
        # one dispatch. This is what Trainer._train_epoch_fused runs.
        k_steps = 16
        n_cache = 1024
        cache = jnp.asarray(
            rng.standard_normal((n_cache, frontend.target_length)).astype(np.float32) * 0.1
        )
        idxs = jnp.asarray(
            rng.integers(0, n_cache, (k_steps, accum, batch)).astype(np.int32)
        )
        mlabels = jnp.asarray(rng.integers(0, 4, (k_steps, accum, batch)).astype(np.int32))
        t0 = time.perf_counter()
        for i in range(3):  # two warmups force the donated-layout recompile
            params, batch_stats, opt_state, mm = steps.train_many(
                params, batch_stats, opt_state, cache, idxs, mlabels, cw,
                np.float32(3e-3), jax.random.fold_in(key, 2000 + i), np.int32(0),
            )
            float(np.asarray(mm["loss"])[0])
        compile_s = time.perf_counter() - t0
        reps = 6
        t0 = time.perf_counter()
        for i in range(reps):
            params, batch_stats, opt_state, mm = steps.train_many(
                params, batch_stats, opt_state, cache, idxs, mlabels, cw,
                np.float32(3e-3), jax.random.fold_in(key, i), np.int32(0),
            )
        float(np.asarray(mm["loss"])[0])
        dt = (time.perf_counter() - t0) / (reps * k_steps)
        print(
            f"{name} [multi-dispatch x{k_steps}]: {dt * 1000:7.1f} ms/step "
            f"({clips / dt:7.0f} clips/s) [compile {compile_s:.1f}s, "
            f"loss {float(np.asarray(mm['loss'])[-1]):.3f}]",
            flush=True,
        )


if __name__ == "__main__":
    main()
