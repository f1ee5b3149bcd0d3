"""STFT building blocks, designed for XLA/TPU.

The reference computes spectrograms on the CPU with torchaudio's native C++
STFT (reference: src/data/preprocessing.py:38-44). Here the STFT is a
TPU-first design: framing is a strided gather with static shapes, and the
DFT is expressed either as `jnp.fft.rfft` (XLA FFT) or as a real/imag
cosine/sine matmul pair that runs on the MXU (`stft_power(..., use_matmul_dft=True)`)
— the matmul form is what the fused Pallas kernel in `ops/pallas_mel.py`
builds on, because an O(n^2) DFT on the 128x128 systolic array beats an
O(n log n) scalar FFT for these shapes (n_fft=2048, batch x frames in the
thousands).

Semantics match torch.stft under torchaudio MelSpectrogram defaults:
center=True with reflect padding, periodic Hann window, power spectrum
(|.|^2), onesided bins n_fft//2+1, frame count 1 + len//hop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n_fft: int, *, periodic: bool = True, dtype=jnp.float32) -> jax.Array:
    """Hann window. `periodic=True` matches torch.hann_window's default."""
    n = np.arange(n_fft)
    denom = n_fft if periodic else n_fft - 1
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / denom))
    return jnp.asarray(w, dtype=dtype)


def num_frames(length: int, n_fft: int, hop_length: int, *, center: bool = True) -> int:
    """Number of STFT frames for a signal of `length` samples (static)."""
    if center:
        return 1 + length // hop_length
    return 1 + (length - n_fft) // hop_length


def reflect_pad(x: jax.Array, pad: int) -> jax.Array:
    """Reflect-pad the last axis by `pad` on both sides (torch 'reflect' mode)."""
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")


def frame_signal(
    x: jax.Array, n_fft: int, hop_length: int, *, center: bool = True
) -> jax.Array:
    """Slice a (..., length) signal into overlapping frames (..., T, n_fft).

    Static-shape strided gather: XLA lowers this to an efficient dynamic-slice
    / gather pattern; no data-dependent shapes, so it jits once per length.
    """
    length = x.shape[-1]
    t = num_frames(length, n_fft, hop_length, center=center)
    if center:
        x = reflect_pad(x, n_fft // 2)
    if n_fft % hop_length == 0:
        # Fast path (all reference configs: n_fft=2048, hop=512): view the
        # signal as hop-sized rows; frame t is `ratio` consecutive rows. This
        # is pure reshape+slice+concat — no gather — which XLA compiles and
        # runs far faster than a (T, n_fft) index gather on both CPU and TPU.
        ratio = n_fft // hop_length
        needed = (t + ratio - 1) * hop_length
        x = x[..., :needed]
        rows = x.reshape(x.shape[:-1] + (t + ratio - 1, hop_length))
        return jnp.concatenate(
            [rows[..., i : i + t, :] for i in range(ratio)], axis=-1
        )
    # General path: strided gather.
    starts = np.arange(t) * hop_length
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    return x[..., idx]


def frame_even_odd(
    x: jax.Array, n_fft: int, hop_length: int, *, center: bool = True
) -> tuple[jax.Array, jax.Array]:
    """Framing fused with even/odd de-interleave for radix-2 DFTs:
    (..., L) -> (e, o) each (..., T, n_fft//2), where e/o carry the
    even/odd-indexed samples of each frame. Avoids materializing the full
    (..., T, n_fft) frame tensor (a 164 MB round-trip at batch 128 x 5 s).
    Requires n_fft % hop == 0 and hop even (true for all reference configs).
    """
    if n_fft % hop_length or hop_length % 2:
        frames = frame_signal(x, n_fft, hop_length, center=center)
        pairs = frames.reshape(frames.shape[:-1] + (n_fft // 2, 2))
        return pairs[..., 0], pairs[..., 1]
    length = x.shape[-1]
    t = num_frames(length, n_fft, hop_length, center=center)
    if center:
        x = reflect_pad(x, n_fft // 2)
    ratio = n_fft // hop_length
    needed = (t + ratio - 1) * hop_length
    x = x[..., :needed]
    # rows (..., t+ratio-1, hop/2, 2): parity is per-sample within each row,
    # and rows start at even offsets (hop even), so frame parity == row parity
    rows = x.reshape(x.shape[:-1] + (t + ratio - 1, hop_length // 2, 2))
    er = rows[..., 0]
    orr = rows[..., 1]
    e = jnp.concatenate([er[..., i : i + t, :] for i in range(ratio)], axis=-1)
    o = jnp.concatenate([orr[..., i : i + t, :] for i in range(ratio)], axis=-1)
    return e, o


@functools.lru_cache(maxsize=8)
def dft_matrices(n_fft: int, dtype=np.float32) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT cosine/sine matrices, shape (n_fft, n_fft//2+1).

    frames @ C gives Re(rfft), frames @ (-S) gives Im(rfft); the power
    spectrum is (frames@C)^2 + (frames@S)^2, so the sign of S is irrelevant
    and we return the positive-sine matrix.
    """
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


@functools.lru_cache(maxsize=8)
def _windowed_dft_np(n_fft: int, periodic: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """DFT matrices with the Hann window folded in: frames @ (w*C) computes
    the windowed DFT in one matmul — the window multiply costs nothing."""
    c, s = dft_matrices(n_fft)
    n = np.arange(n_fft)
    denom = n_fft if periodic else n_fft - 1
    w = (0.5 * (1.0 - np.cos(2.0 * np.pi * n / denom))).astype(np.float32)
    return w[:, None] * c, w[:, None] * s


def _cached_dft(n_fft: int, windowed: bool) -> tuple[jax.Array, jax.Array]:
    # NOTE: cache numpy, convert per call. Caching the jnp arrays would
    # capture a tracer when first hit inside a jit trace and leak it into
    # every later call (found by live TPU verification).
    c, s = _windowed_dft_np(n_fft) if windowed else dft_matrices(n_fft)
    return jnp.asarray(c), jnp.asarray(s)


def stft_power(
    x: jax.Array,
    n_fft: int,
    hop_length: int,
    window: jax.Array | None = None,
    *,
    center: bool = True,
    use_matmul_dft: bool = False,
    precision: jax.lax.Precision | str = jax.lax.Precision.HIGH,
) -> jax.Array:
    """Power spectrogram |STFT|^2 with shape (..., n_fft//2+1, T).

    Matches torch.stft(center=True, pad_mode='reflect', onesided=True,
    normalized=False) followed by abs()**2 — the exact chain behind
    torchaudio MelSpectrogram(power=2.0) (reference preprocessing.py:38-44).

    `use_matmul_dft=True` routes the DFT through two MXU matmuls (Hann
    window pre-folded into the DFT matrices, so the window multiply is
    free) instead of the XLA FFT.

    Precision on the MXU (measured on v5e, 5 s/16 kHz clips, log-mel error
    vs float64 golden): DEFAULT (bf16) ~1e-1 — unusable; HIGH (bf16x3)
    6.3e-4 at ~24k clips/s; HIGHEST (f32) 4.6e-4 at ~15k clips/s. HIGH is
    the default: inside the 1e-3 parity budget at 1.6x the speed.
    """
    if use_matmul_dft and window is None:
        frames = frame_signal(x, n_fft, hop_length, center=center)
        c, s = _cached_dft(n_fft, windowed=True)
    else:
        if window is None:
            window = hann_window(n_fft, dtype=x.dtype)
        frames = frame_signal(x, n_fft, hop_length, center=center) * window
        c = s = None
    if use_matmul_dft:
        if c is None:
            c, s = _cached_dft(n_fft, windowed=False)
        re = jnp.dot(frames, c, precision=precision,
                     preferred_element_type=jnp.float32)
        im = jnp.dot(frames, s, precision=precision,
                     preferred_element_type=jnp.float32)
        power = re * re + im * im
    else:
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
        power = jnp.abs(spec) ** 2
    # (..., T, n_bins) -> (..., n_bins, T) to match torchaudio layout.
    return jnp.swapaxes(power, -1, -2)


def spectrogram(
    x: jax.Array,
    n_fft: int,
    hop_length: int,
    power: float = 2.0,
    **kw,
) -> jax.Array:
    """Magnitude (power=1) or power (power=2) spectrogram."""
    p = stft_power(x, n_fft, hop_length, **kw)
    if power == 2.0:
        return p
    return jnp.power(jnp.sqrt(jnp.maximum(p, 0.0)), power)
