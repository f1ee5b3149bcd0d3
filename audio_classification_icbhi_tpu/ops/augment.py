"""On-device, jax.random-keyed augmentations.

Replaces the reference's host-side, globally-seeded augmentation
(reference: src/data/preprocessing.py:85-109 — gaussian noise, torch.roll
time shift, torchaudio FrequencyMasking/TimeMasking). Everything here is
pure, batched, and runs inside the jitted train step, so augmentation costs
no host<->device traffic and is reproducible from a single PRNG key.

Per-sample independence in a batch comes from jax.random.split + vmap at the
call site (see data pipeline / trainer).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def add_noise(key: jax.Array, waveform: jax.Array, noise_factor: float = 0.005) -> jax.Array:
    """Additive gaussian noise (reference preprocessing.py:85-88)."""
    return waveform + jax.random.normal(key, waveform.shape, waveform.dtype) * noise_factor


def time_shift(key: jax.Array, waveform: jax.Array, shift_max: float = 0.2) -> jax.Array:
    """Circular time shift by uniform(-shift_max, shift_max) * length
    (reference preprocessing.py:90-93 uses torch.roll). Implemented as a
    static-shape double-concat + dynamic slice so it jits with a traced shift.
    """
    length = waveform.shape[-1]
    frac = jax.random.uniform(key, (), minval=-shift_max, maxval=shift_max)
    shift = (frac * length).astype(jnp.int32)
    # roll(x, s) == concat(x, x)[L - s mod L : 2L - s mod L]
    start = jnp.mod(length - shift, length)
    doubled = jnp.concatenate([waveform, waveform], axis=-1)
    return jax.lax.dynamic_slice_in_dim(doubled, start, length, axis=waveform.ndim - 1)


def augment_waveform(
    key: jax.Array,
    waveform: jax.Array,
    *,
    noise_prob: float = 0.5,
    shift_prob: float = 0.5,
    noise_factor: float = 0.005,
    shift_max: float = 0.2,
) -> jax.Array:
    """Randomly apply noise then time-shift, each with prob 0.5
    (reference preprocessing.py:95-103)."""
    k_gate_n, k_noise, k_gate_s, k_shift = jax.random.split(key, 4)
    noisy = add_noise(k_noise, waveform, noise_factor)
    waveform = jnp.where(jax.random.uniform(k_gate_n) < noise_prob, noisy, waveform)
    shifted = time_shift(k_shift, waveform, shift_max)
    waveform = jnp.where(jax.random.uniform(k_gate_s) < shift_prob, shifted, waveform)
    return waveform


def _mask_along_axis(
    key: jax.Array, spec: jax.Array, mask_param: int, axis: int, mask_value: float = 0.0
) -> jax.Array:
    """torchaudio mask_along_axis semantics: value ~ U(0, mask_param) and
    min ~ U(0, size - value) are drawn as FLOATS, then BOTH bounds truncate
    to integers (mask_start = int(min), mask_end = int(min + value)), so the
    masked set is [floor(start), floor(start+width)) — on average ~0.5 cells
    narrower than the raw float interval. Matching the truncation matters:
    without it SpecAugment is systematically stronger than the reference's.
    """
    size = spec.shape[axis]
    k_w, k_s = jax.random.split(key)
    width = jax.random.uniform(k_w, (), minval=0.0, maxval=float(mask_param))
    start = jax.random.uniform(k_s, (), minval=0.0, maxval=float(size) - width)
    mask_start = jnp.floor(start)
    mask_end = jnp.floor(start + width)
    idx = jnp.arange(size, dtype=jnp.float32)
    mask = (idx >= mask_start) & (idx < mask_end)
    shape = [1] * spec.ndim
    shape[axis] = size
    return jnp.where(mask.reshape(shape), jnp.asarray(mask_value, spec.dtype), spec)


def freq_mask(key: jax.Array, mel_spec: jax.Array, mask_param: int = 15) -> jax.Array:
    """SpecAugment frequency mask over the mel axis (axis -2).
    Reference uses T.FrequencyMasking(15) (preprocessing.py:52)."""
    return _mask_along_axis(key, mel_spec, mask_param, axis=mel_spec.ndim - 2)


def time_mask(key: jax.Array, mel_spec: jax.Array, mask_param: int = 35) -> jax.Array:
    """SpecAugment time mask over the frame axis (axis -1).
    Reference uses T.TimeMasking(35) (preprocessing.py:53)."""
    return _mask_along_axis(key, mel_spec, mask_param, axis=mel_spec.ndim - 1)


def augment_spectrogram(
    key: jax.Array,
    mel_spec: jax.Array,
    *,
    freq_mask_param: int = 15,
    time_mask_param: int = 35,
) -> jax.Array:
    """Frequency mask then time mask (reference preprocessing.py:105-109)."""
    k_f, k_t = jax.random.split(key)
    mel_spec = freq_mask(k_f, mel_spec, freq_mask_param)
    mel_spec = time_mask(k_t, mel_spec, time_mask_param)
    return mel_spec


def spec_mask_bounds(
    key: jax.Array,
    n_mels: int,
    num_frames: int,
    *,
    freq_mask_param: int = 15,
    time_mask_param: int = 35,
) -> jax.Array:
    """(f_start, f_width, t_start, t_width) for ONE example, drawn with
    byte-identical key discipline and uniform calls to augment_spectrogram
    (split -> freq then time; per mask split -> width then start), so the
    fused-kernel epilogue (ops/pallas_mel) masks exactly the cells the
    unfused chain would — pinned by the fused-vs-composed parity test."""

    def one(k, size, param):
        k_w, k_s = jax.random.split(k)
        width = jax.random.uniform(k_w, (), minval=0.0, maxval=float(param))
        start = jax.random.uniform(k_s, (), minval=0.0, maxval=float(size) - width)
        # same integer truncation as _mask_along_axis (torchaudio parity):
        # the epilogue compares integer cell indices against these bounds,
        # so returning (floor(start), floor(end) - floor(start)) makes it
        # mask exactly [int(start), int(start+width))
        s = jnp.floor(start)
        return s, jnp.floor(start + width) - s

    k_f, k_t = jax.random.split(key)
    f_start, f_width = one(k_f, n_mels, freq_mask_param)
    t_start, t_width = one(k_t, num_frames, time_mask_param)
    return jnp.stack([f_start, f_width, t_start, t_width])
