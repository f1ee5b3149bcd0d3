"""Phase-vocoder time stretch tests (torchaudio T.TimeStretch equivalent)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from audio_classification_icbhi_tpu.ops.time_stretch import (
    TimeStretch,
    phase_vocoder,
    stft_complex,
)

SR, N_FFT, HOP = 16000, 2048, 512


def tone(freq=440.0, seconds=2.0):
    t = np.arange(int(SR * seconds)) / SR
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


class TestPhaseVocoder:
    def test_rate_one_is_identity(self):
        spec = stft_complex(jnp.asarray(tone()), N_FFT, HOP)
        out = phase_vocoder(spec, 1.0, HOP)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(spec))

    @pytest.mark.parametrize("rate", [0.5, 2.0])
    def test_output_length(self, rate):
        spec = stft_complex(jnp.asarray(tone()), N_FFT, HOP)
        out = phase_vocoder(spec, rate, HOP)
        t = spec.shape[-1]
        assert out.shape == spec.shape[:-1] + (int(np.ceil(t / rate)),)

    def test_stationary_tone_preserves_spectrum(self):
        """Stretching a steady tone must keep its spectral peak and
        per-frame magnitude profile (pitch unchanged)."""
        spec = stft_complex(jnp.asarray(tone(440.0)), N_FFT, HOP)
        out = phase_vocoder(spec, 2.0, HOP)
        mag_in = np.abs(np.asarray(spec))
        mag_out = np.abs(np.asarray(out))
        # same peak bin in the interior frames
        assert np.argmax(mag_in[:, 5]) == np.argmax(mag_out[:, 5])
        # magnitude at the peak is preserved (linear interp of equal frames)
        peak = np.argmax(mag_in[:, 5])
        np.testing.assert_allclose(
            mag_out[peak, 2:-2], mag_in[peak, 5], rtol=0.05
        )

    def test_matches_torch_phase_vocoder(self):
        """torch.functional has no phase_vocoder, but torch implements the
        same recipe in torchaudio; replicate it here in torch ops as an
        independent cross-check of our jax math."""
        rng = np.random.default_rng(0)
        spec_np = (
            rng.standard_normal((33, 20)) + 1j * rng.standard_normal((33, 20))
        ).astype(np.complex64)
        rate, hop, n_fft = 1.7, 16, 64
        ours = np.asarray(phase_vocoder(jnp.asarray(spec_np), rate, hop, n_fft))

        spec = torch.from_numpy(spec_np)
        f = spec.shape[0]
        phase_advance = torch.from_numpy(
            (hop * 2.0 * np.pi * np.arange(f) / n_fft)[:, None].astype(np.float32)
        )
        time_steps = torch.arange(0, spec.shape[-1], rate)
        alphas = time_steps % 1.0
        idx = time_steps.long()
        padded = torch.cat([spec, torch.zeros(f, 2, dtype=spec.dtype)], dim=-1)
        s0, s1 = padded[:, idx], padded[:, idx + 1]
        angle0, angle1 = s0.angle(), s1.angle()
        mag = alphas * s1.abs() + (1 - alphas) * s0.abs()
        dphase = angle1 - angle0 - phase_advance
        dphase = dphase - 2 * np.pi * torch.round(dphase / (2 * np.pi))
        dphase = dphase + phase_advance
        phase = torch.cat([angle0[:, :1], dphase[:, :-1]], dim=-1)
        want = (mag * torch.exp(1j * torch.cumsum(phase, dim=-1))).numpy()
        np.testing.assert_allclose(ours, want, atol=1e-3)

    def test_transform_wrapper(self):
        ts = TimeStretch(hop_length=HOP, n_freq=N_FFT // 2 + 1, fixed_rate=1.25)
        spec = stft_complex(jnp.asarray(tone(seconds=1.0)), N_FFT, HOP)
        out = ts(spec)
        assert out.shape[-1] == int(np.ceil(spec.shape[-1] / 1.25))
        with pytest.raises(ValueError):
            TimeStretch(fixed_rate=None)(spec)
