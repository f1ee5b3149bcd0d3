"""Phase-vocoder time stretch (torchaudio T.TimeStretch equivalent).

The reference instantiates T.TimeStretch(fixed_rate=None) among its
augmentation transforms (reference src/data/preprocessing.py:51) — it never
actually applies it in the preprocessing chain, but the capability is part
of the torchaudio surface this framework replaces, so it exists here as a
first-class op: `phase_vocoder` stretches a complex spectrogram in time
without changing pitch, and `stft_complex` produces the input it needs.

Semantics follow the published phase-vocoder recipe torchaudio implements:
resample the frame axis at `rate` with linear magnitude interpolation, and
rebuild phases by accumulating the wrapped instantaneous-frequency deviation
around the expected per-bin phase advance (hop * 2*pi*k / n_fft).

All shapes are static under jit for a fixed rate (the frame index table is
precomputed on the host), so each rate compiles once — on TPU the op is a
gather + elementwise trig, fully fused by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from audio_classification_icbhi_tpu.ops import stft as stft_ops


def stft_complex(
    x: jax.Array, n_fft: int, hop_length: int, *, center: bool = True
) -> jax.Array:
    """Windowed complex STFT (..., n_fft//2+1, T), torch.stft semantics."""
    window = stft_ops.hann_window(n_fft, dtype=x.dtype)
    frames = stft_ops.frame_signal(x, n_fft, hop_length, center=center) * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)


def phase_vocoder(
    spec: jax.Array, rate: float, hop_length: int, n_fft: int | None = None
) -> jax.Array:
    """Stretch a complex spectrogram (..., F, T) by `rate` (>1 = faster/
    shorter). Returns (..., F, ceil(T/rate)) complex."""
    if rate == 1.0:
        return spec
    f = spec.shape[-2]
    t = spec.shape[-1]
    if n_fft is None:
        n_fft = 2 * (f - 1)
    # expected phase advance per frame for each bin: hop * 2pi k / n_fft
    phase_advance = jnp.asarray(
        (hop_length * 2.0 * np.pi * np.arange(f) / n_fft)[:, None], spec.real.dtype
    )
    time_steps = np.arange(0, t, float(rate))
    idx = time_steps.astype(np.int64)
    alphas = jnp.asarray((time_steps % 1.0)[None, :], spec.real.dtype)

    # pad two frames so idx+1 is always valid
    padded = jnp.concatenate(
        [spec, jnp.zeros(spec.shape[:-1] + (2,), spec.dtype)], axis=-1
    )
    s0 = padded[..., idx]
    s1 = padded[..., idx + 1]

    angle0 = jnp.angle(s0)
    angle1 = jnp.angle(s1)
    mag = alphas * jnp.abs(s1) + (1.0 - alphas) * jnp.abs(s0)

    # wrapped instantaneous-frequency deviation, then re-add the advance
    dphase = angle1 - angle0 - phase_advance
    dphase = dphase - 2.0 * np.pi * jnp.round(dphase / (2.0 * np.pi))
    dphase = dphase + phase_advance
    # accumulate: first output frame keeps angle0; later frames add deviations
    phase = jnp.concatenate([angle0[..., :1], dphase[..., :-1]], axis=-1)
    phase_acc = jnp.cumsum(phase, axis=-1)
    return mag * jnp.exp(1j * phase_acc)


class TimeStretch:
    """Configured transform mirroring torchaudio T.TimeStretch: call with a
    complex spectrogram and an optional rate override."""

    def __init__(self, hop_length: int = 512, n_freq: int = 1025, fixed_rate: float | None = None):
        self.hop_length = hop_length
        self.n_fft = 2 * (n_freq - 1)
        self.fixed_rate = fixed_rate

    def __call__(self, spec: jax.Array, rate: float | None = None) -> jax.Array:
        r = rate if rate is not None else self.fixed_rate
        if r is None:
            raise ValueError("no stretch rate given (fixed_rate is None)")
        return phase_vocoder(spec, r, self.hop_length, self.n_fft)
