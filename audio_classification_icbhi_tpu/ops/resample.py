"""On-device polyphase sinc resampler.

Replaces torchaudio T.Resample (reference: src/data/preprocessing.py:63-66),
which the reference runs on the CPU per file. Same algorithm family
(windowed-sinc polyphase, 'sinc_interp_hann'): a bank of new_freq//g
phase kernels applied as a strided conv — which XLA maps onto the MXU as a
batched matmul, so resampling whole batches on-device is effectively free
next to the mel matmuls.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _resample_kernel(
    orig_freq: int, new_freq: int, lowpass_filter_width: int, rolloff: float
) -> tuple[np.ndarray, int]:
    """Polyphase kernels, shape (new_freq, 1, kernel_width); plus pad width."""
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None, :] / orig_freq
    t = np.arange(0, -new_freq, -1, dtype=np.float64)[:, None] / new_freq + idx
    t = np.clip(t * base_freq, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2.0) ** 2
    t = t * np.pi
    kernel = np.where(t == 0.0, 1.0, np.sin(t) / np.where(t == 0.0, 1.0, t))
    kernel = kernel * window * base_freq / orig_freq
    return kernel[:, None, :].astype(np.float32), width


def resample(
    waveform: jax.Array,
    orig_freq: int,
    new_freq: int,
    *,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> jax.Array:
    """Resample (..., L) waveform from orig_freq to new_freq.

    Matches torchaudio's sinc_interp_hann defaults (lowpass_filter_width=6,
    rolloff=0.99). Output length is ceil(new_freq * L / orig_freq) after
    gcd reduction, identical to torchaudio.
    """
    if orig_freq == new_freq:
        return waveform
    g = math.gcd(int(orig_freq), int(new_freq))
    orig_g, new_g = orig_freq // g, new_freq // g
    kernel_np, width = _resample_kernel(orig_g, new_g, lowpass_filter_width, rolloff)
    kernel = jnp.asarray(kernel_np)

    lead_shape = waveform.shape[:-1]
    length = waveform.shape[-1]
    x = waveform.reshape((-1, 1, length))
    x = jnp.pad(x, ((0, 0), (0, 0), (width, width + orig_g)))
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(orig_g,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )  # (N, new_g, ceil(L/orig_g))
    y = jnp.swapaxes(y, -1, -2).reshape((x.shape[0], -1))
    target_length = math.ceil(new_g * length / orig_g)
    y = y[:, :target_length]
    return y.reshape(lead_shape + (target_length,))
