#!/usr/bin/env python
"""Perf sweep for the fused wav->logits path on the real chip.

Explores batch size and DFT matmul precision (HIGHEST = true f32,
HIGH = bf16x3, DEFAULT = bf16) and reports clips/s plus mel parity error
vs the float64 golden — the 1e-3 budget decides which precision the
production path may use.
"""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def golden_mel(wav, sr=16000, n_fft=2048, hop=512, n_mels=128):
    win = 0.5 * (1 - np.cos(2 * np.pi * np.arange(n_fft) / n_fft))
    xp = np.pad(wav.astype(np.float64), n_fft // 2, mode="reflect")
    t = 1 + len(wav) // hop
    frames = np.stack([xp[i * hop : i * hop + n_fft] * win for i in range(t)])
    p = (np.abs(np.fft.rfft(frames, axis=-1)) ** 2).T

    def h2m(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def m2h(m):
        return 700.0 * (10 ** (m / 2595.0) - 1.0)

    freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    pts = m2h(np.linspace(h2m(0.0), h2m(sr / 2), n_mels + 2))
    fb = np.zeros((n_fft // 2 + 1, n_mels))
    for m in range(n_mels):
        lo, cen, hi = pts[m], pts[m + 1], pts[m + 2]
        fb[:, m] = np.maximum(0, np.minimum((freqs - lo) / (cen - lo), (hi - freqs) / (hi - cen)))
    return 10 * np.log10(np.maximum(fb.T @ p, 1e-10))


def main():
    from audio_classification_icbhi_tpu.models import LightweightCNN
    from audio_classification_icbhi_tpu.ops import mel as mel_ops
    from audio_classification_icbhi_tpu.ops import stft as stft_ops

    sr, n_fft, hop, n_mels, dur = 16000, 2048, 512, 128, 5.0
    L = int(sr * dur)
    rng = np.random.default_rng(0)
    wav1 = (0.1 * rng.standard_normal(L)).astype(np.float32)
    want = golden_mel(wav1)

    model = LightweightCNN(num_classes=4, dtype=jnp.bfloat16)
    t_frames = stft_ops.num_frames(L, n_fft, hop)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, n_mels, t_frames, 1), jnp.float32), train=False)

    fb = mel_ops.mel_filterbank(sr, n_fft, n_mels)
    c_np, s_np = stft_ops.dft_matrices(n_fft)
    win = np.asarray(stft_ops.hann_window(n_fft))
    wc = jnp.asarray(win[:, None] * c_np)  # window folded into DFT matrices
    ws = jnp.asarray(win[:, None] * s_np)

    def make_fn(precision, mel_dtype):
        prec = {"highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT}[precision]

        @jax.jit
        def f(wavs):
            frames = stft_ops.frame_signal(wavs, n_fft, hop)  # (B, T, n_fft)
            re = jnp.dot(frames, wc, precision=prec, preferred_element_type=jnp.float32)
            im = jnp.dot(frames, ws, precision=prec, preferred_element_type=jnp.float32)
            power = re * re + im * im
            mel = jnp.einsum("btf,fm->bmt", power, fb, precision=prec,
                             preferred_element_type=jnp.float32)
            db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
            mean = jnp.mean(db, axis=(1, 2), keepdims=True)
            n = db.shape[1] * db.shape[2]
            var = jnp.var(db, axis=(1, 2), keepdims=True) * (n / (n - 1))
            norm = ((db - mean) / (jnp.sqrt(var) + 1e-8)).astype(mel_dtype)
            return model.apply(variables, norm[..., None], train=False), db

        return f

    for precision in ("highest", "high", "default"):
        f = make_fn(precision, jnp.bfloat16)
        _, db1 = f(jnp.asarray(wav1[None]))
        err = float(np.abs(np.asarray(db1)[0] - want).max())
        for batch in (128, 256, 512):
            wavs = jnp.asarray(0.1 * rng.standard_normal((batch, L)).astype(np.float32))
            out = jax.block_until_ready(f(wavs))  # compile
            reps = 4
            while True:
                t0 = time.perf_counter()
                for _ in range(reps):
                    out = f(wavs)
                # End the window with a REAL data fetch: block_until_ready
                # can return early through the tunnel (CLAUDE.md trap) and
                # inflates clips/s. A single logits scalar keeps the fetch
                # itself negligible.
                float(np.asarray(out[0][0, 0]))
                dt = time.perf_counter() - t0
                if dt > 0.7 or reps >= 128:
                    break
                reps *= 2
            print(f"prec={precision:<8} batch={batch:<4} "
                  f"{batch * reps / dt:9.0f} clips/s   mel_err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
