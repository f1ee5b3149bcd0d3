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


def build_pipeline(batch: int, backend: str = "auto",
                   algorithm: str | None = None):
    import jax
    import jax.numpy as jnp

    from audio_classification_icbhi_tpu.models import LightweightCNN
    from audio_classification_icbhi_tpu.ops.mel import MelFrontend
    from audio_classification_icbhi_tpu.parallel.data_parallel import features_from_wavs

    frontend = MelFrontend(sample_rate=16000, n_mels=128, n_fft=2048,
                           hop_length=512, duration=5.0, use_matmul_dft=True,
                           backend=backend, pallas_algorithm=algorithm)
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

    # Inference apply: XLA convs by default (the r5 on-chip A/B measured
    # the fused Pallas CNN chain slower end to end — 39.7k vs 58.5k
    # clips/s at batch 128); ICBHI_FUSED_CNN=1 opts into the fused path
    # for A/B runs (policy + numbers: models/fused_infer.fused_cnn_enabled).
    from audio_classification_icbhi_tpu.models.fused_infer import (
        fused_cnn_enabled, make_fused_apply)

    if fused_cnn_enabled(dummy.shape):
        apply_fn = make_fused_apply(variables)
    else:
        apply_fn = lambda feats: model.apply(variables, feats, train=False)  # noqa: E731

    @jax.jit
    def wav_to_logits(wavs):
        return apply_fn(features_from_wavs(frontend, wavs))

    rng = np.random.default_rng(0)
    # rotate distinct device-resident inputs and end with a REAL data fetch:
    # rules out any same-input caching and early-returning block_until_ready
    # on tunneled backends (cross-checked: matches same-input timing here)
    inputs = [
        jnp.asarray(rng.standard_normal((batch, frontend.target_length)).astype(np.float32) * 0.1)
        for _ in range(4)
    ]
    return wav_to_logits, inputs, frontend


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


def flops_per_clip(wav_to_logits, example, frontend=None) -> float | None:
    """XLA's own post-optimization FLOP count for one compiled step
    (wav_to_logits is already jit-wrapped, so lower() is available).

    XLA costs a Mosaic kernel as an opaque custom call with ZERO FLOPs, so
    when `frontend` would route this input to Pallas the kernel's analytic
    FLOP model (ops/pallas_mel.analytic_flops — same 2*M*N*K-per-dot
    convention cost analysis applies to the XLA paths) is added on top of
    the XLA-visible remainder (CNN, framing, epilogue glue)."""
    try:
        cost = wav_to_logits.lower(example).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost["flops"]) / example.shape[0]
    except Exception:
        flops = None
    if frontend is not None and (
        frontend._use_pallas() or frontend._auto_pallas(example)
    ):
        from audio_classification_icbhi_tpu.ops.pallas_mel import analytic_flops

        flops = (flops or 0.0) + analytic_flops(
            frontend._pallas_algorithm(), frontend.target_length,
            frontend.n_fft, frontend.hop_length, frontend.n_mels,
        )
    return flops


def sweep():
    """Batch x backend characterization (VERDICT r1 #9): where the dispatch
    floor ends, where compute saturates, and what each mel backend does to
    END-TO-END throughput. Markdown table to stdout (paste into PARITY.md)."""
    peak_tflops = 197.0  # v5e bf16 MXU peak / chip
    # auto's policy is shape/platform-based, not batch-based: the best
    # eligible DIF kernel on TPU (radix16dif_fused for 2048/512) at every
    # batch size (ops/mel.py:_pallas_algorithm); the explicit backends pin
    # each path for comparison — radix8dif/radix4dif pin the two previous
    # production kernels
    backends = [("auto", None), ("xla_radix2", None), ("xla", None),
                ("pallas", None), ("pallas", "radix8dif_fused"),
                ("pallas", "radix4dif_fused")]
    batches = [8, 32, 128, 512, 1024]
    rows = []
    for backend, algorithm in backends:
        if algorithm:
            backend_label = f"{backend}:{algorithm}"
        else:
            backend_label = backend
        for batch in batches:
            fn, inputs, fe = build_pipeline(batch, backend, algorithm)
            cps = measure(fn, inputs, batch)
            fpc = flops_per_clip(fn, inputs[0], fe)
            tflops = cps * fpc / 1e12 if fpc else None
            rows.append((backend_label, batch, cps, fpc, tflops))
            util = f"{100 * tflops / peak_tflops:.1f}%" if tflops else "?"
            print(f"| {backend_label} | {batch} | {cps:,.0f} | "
                  f"{(fpc or 0) / 1e9:.2f} | {tflops or 0:.1f} | {util} |",
                  flush=True)
    best = max(rows, key=lambda r: r[2])
    print(f"\nbest: backend={best[0]} batch={best[1]} {best[2]:,.0f} clips/s")


def parity_battery(length: int) -> np.ndarray:
    """Worst-case parity inputs: tonal content exercises bf16 cancellation
    in the DFT decomposition, faint components sit near the dB floor where
    relative power error is amplified by the log, impulses stress frame
    boundaries, near-silence hits the 1e-10 clamp.

    Every signal carries a 0.03 broadband noise floor, capping the in-clip
    dynamic range near 30 dB — the regime respiratory audio occupies
    (breath noise dominates every real clip; BASELINE.md's pipeline never
    sees a quieter floor). This is a property of dB comparison, not of any
    one backend: at an 80 dB range even the true-f32 XLA path measures
    0.05 dB vs the f64 golden, because a floor bin's power error is set by
    rounding of the LOUD components (~eps * peak_power), which no f32
    input representation can avoid. The 1e-3 budget is therefore stated —
    here and in the original kernel-validation battery — at realistic
    dynamic range."""
    rng = np.random.default_rng(7)
    t = np.arange(length) / 16000.0
    sigs = [
        0.1 * rng.standard_normal(length),                        # white noise
        0.5 * np.sin(2 * np.pi * 440 * t)                          # loud tone +
        + 1e-3 * np.sin(2 * np.pi * 3017 * t),                     # faint tone
        np.sin(2 * np.pi * (50 + 3950 * t / t[-1]) * t) * 0.3,     # chirp
        np.where(rng.random(length) < 0.001,
                 rng.standard_normal(length), 0.0)                 # crackles
        + 0.01 * rng.standard_normal(length),
        np.zeros(length),                                          # floor only
        0.9 * np.sign(np.sin(2 * np.pi * 100 * t)),                # square (rich harmonics)
        sum(a * np.sin(2 * np.pi * f * t) for a, f in
            ((0.3, 150), (0.2, 600), (0.1, 1200), (0.05, 2400), (1e-3, 6000))),
        0.2 * rng.standard_normal(length) * np.exp(-t / (t[-1] / 4)),  # decaying noise
    ]
    floor = 3e-2 * rng.standard_normal((len(sigs), length))
    return (np.stack(sigs) + floor).astype(np.float32)


def _golden_mel_f32(wav, sr, n_fft, hop, n_mels):
    """benchmarks.sweep_mel.golden_mel recomputed end-to-end in float32:
    the numerics floor of any fp32 implementation of this pipeline."""
    win = (0.5 * (1 - np.cos(2 * np.pi * np.arange(n_fft) / n_fft))).astype(np.float32)
    xp = np.pad(wav.astype(np.float32), n_fft // 2, mode="reflect")
    t = 1 + len(wav) // hop
    frames = np.stack([xp[i * hop: i * hop + n_fft] * win for i in range(t)])
    # numpy's rfft of a float32 input runs in complex64 — a true f32 FFT
    p = (np.abs(np.fft.rfft(frames.astype(np.float32), axis=-1)) ** 2).T.astype(np.float32)

    # float32 filterbank, same formula as the f64 golden
    def h2m(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def m2h(m):
        return 700.0 * (10 ** (m / 2595.0) - 1.0)

    freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    pts = m2h(np.linspace(h2m(0.0), h2m(sr / 2), n_mels + 2))
    fb = np.zeros((n_fft // 2 + 1, n_mels), np.float32)
    for m in range(n_mels):
        lo, cen, hi = pts[m], pts[m + 1], pts[m + 2]
        fb[:, m] = np.maximum(
            0, np.minimum((freqs - lo) / (cen - lo), (hi - freqs) / (hi - cen))
        ).astype(np.float32)
    mel = (fb.T.astype(np.float32) @ p).astype(np.float32)
    return 10 * np.log10(np.maximum(mel, np.float32(1e-10)), dtype=np.float32)


def parity(out_path: str = "PARITY_r05.json"):
    """On-chip numerics artifact (VERDICT r2 #6): every kernel algorithm and
    XLA path vs the float64 FFT golden, REAL Mosaic (not interpret mode),
    one JSON line per (algorithm, duration).

    Two error columns per row:
    - max_abs_db_err — unrestricted worst case over every mel cell. At a
      bin D dB below the clip peak, ANY fp32 pipeline's dB error grows as
      ~eps * 10^(D/10) (the absolute power error is set by rounding of the
      loud components) — the `numpy_f32` row measures that floor for a pure
      float32 FFT pipeline, i.e. the numerics of the reference
      implementation itself (torchaudio fp32, reference
      preprocessing.py:38-47).
    - max_abs_db_err_25db — worst case over bins within 25 dB of the
      clip's mel peak: the active region a per-clip-normalized classifier
      actually reads, and where the 1e-3 budget (SURVEY.md §6) is a
      depth-independent statement. within_budget gates on this column.
    """
    import jax
    import jax.numpy as jnp

    from audio_classification_icbhi_tpu.ops import mel as mel_ops
    from audio_classification_icbhi_tpu.ops.pallas_mel import log_mel_pallas
    from benchmarks.sweep_mel import golden_mel

    sr, n_fft, hop, n_mels = 16000, 2048, 512, 128
    platform = jax.devices()[0].platform
    results = []
    for duration in (5.0, 1.0):  # headline clips + analyzer windows
        length = int(sr * duration)
        wavs = parity_battery(length)
        want = np.stack([golden_mel(w, sr, n_fft, hop, n_mels) for w in wavs])
        # bins within 25 dB of each clip's own mel peak
        active = want >= want.max(axis=(1, 2), keepdims=True) - 25.0

        def record(name, got):
            d = np.abs(np.asarray(got, np.float64) - want)
            err = float(d.max())
            err25 = float(d[active].max())
            rec = {"algorithm": name, "duration_s": duration,
                   "platform": platform,
                   "max_abs_db_err": round(err, 8),
                   "max_abs_db_err_25db": round(err25, 8),
                   "within_budget": err25 <= 1e-3,
                   # the unqualified BASELINE.json clause — met by the
                   # production 5-pass default since r5 (VERDICT r4 #1)
                   "within_budget_unrestricted": err <= 1e-3}
            results.append(rec)
            print(json.dumps(rec), flush=True)

        def run(name, fn):
            record(name, fn(jnp.asarray(wavs)))

        # the fp32 numerics floor: the identical pipeline computed in pure
        # float32 numpy (float32 window/frames/FFT/filterbank/log)
        record("numpy_f32", np.stack([
            _golden_mel_f32(w, sr, n_fft, hop, n_mels) for w in wavs
        ]))

        for algo in ("radix16dif_fused", "radix8dif_fused", "radix4dif_fused",
                     "radix4_fused", "radix2_fused", "radix2", "bf16x3", "f32"):
            run(f"pallas_{algo}", lambda w, a=algo: log_mel_pallas(
                w, sr, n_fft, hop, n_mels, algorithm=a))
        # Pass-budget cross-section for the production DIF kernels. The
        # bare rows above run the DEFAULT (5-pass asymmetric split since
        # r5 — in budget UNRESTRICTED, VERDICT r4 #1); passes4 is the
        # former 2-way/2-way default (active-region budget only), passes6
        # the f32-equivalent 3-way opt-in.
        for algo in ("radix16dif_fused", "radix8dif_fused"):
            for p in (4, 6):
                run(f"pallas_{algo}_passes{p}", lambda w, a=algo, p=p:
                    log_mel_pallas(w, sr, n_fft, hop, n_mels, algorithm=a,
                                   dft_passes=p))
        run("xla_radix2", lambda w: mel_ops.amplitude_to_db(
            mel_ops._log_mel_radix2_xla(w, sr, n_fft, hop, n_mels, "htk", None),
            stype="power"))
        run("xla_matmul_dft", lambda w: mel_ops.log_mel_spectrogram(
            w, sr, n_fft, hop, n_mels, use_matmul_dft=True))

    with open(out_path, "w") as f:
        for rec in results:
            f.write(json.dumps(rec) + "\n")
    worst = max(r["max_abs_db_err_25db"] for r in results)
    print(f"# worst active-region error {worst:.2e} dB over {len(results)} "
          f"rows -> {out_path}", flush=True)


def perf_floor() -> float | None:
    """Committed regression floor (VERDICT r4 #5): PERF_FLOORS.json pins the
    minimum acceptable headline throughput on the real chip (~10% under the
    last recorded BENCH). CPU runs are exempt — the floor is a TPU number."""
    import os

    import jax

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "PERF_FLOORS.json")
    if not os.path.exists(path):
        return None
    if jax.devices()[0].platform != "tpu":
        return None
    with open(path) as f:
        return float(json.load(f)["wav_to_logits_clips_per_sec_per_chip_min"])


def main(assert_min: float | None = None):
    batch = int(__import__("os").environ.get("BENCH_BATCH", 128))
    wav_to_logits, inputs, _ = build_pipeline(batch)
    clips_per_sec = measure(wav_to_logits, inputs, batch)
    rec = {
        "metric": "wav_to_logits_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 1),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC, 2),
    }
    floor = perf_floor() if assert_min is None else assert_min
    if floor is not None:
        rec["floor"] = floor
        rec["floor_ok"] = clips_per_sec >= floor
    print(json.dumps(rec))
    if assert_min is not None and clips_per_sec < assert_min:
        # --assert-min turns a regression into a hard failure; the default
        # run stays exit-0 so a transient tunnel slowdown can't eat the
        # recorded benchmark line, but the floor verdict is in the JSON.
        print(f"PERF REGRESSION: {clips_per_sec:.0f} < floor {floor:.0f}",
              file=sys.stderr)
        raise SystemExit(1)


if __name__ == "__main__":
    if "--sweep" in sys.argv:
        sweep()
    elif "--parity" in sys.argv:
        parity()
    elif "--assert-min" in sys.argv:
        i = sys.argv.index("--assert-min")
        explicit = (i + 1 < len(sys.argv)
                    and not sys.argv[i + 1].startswith("-"))
        main(assert_min=float(sys.argv[i + 1]) if explicit
             else (perf_floor() or 0.0))
    else:
        main()
