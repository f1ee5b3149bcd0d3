"""Golden tests for the DSP front end.

The BASELINE north star requires mel outputs within 1e-3 of librosa.
librosa/torchaudio are not installed in this image, so the goldens are
independent numpy implementations that follow the published formulas
exactly (direct O(n^2) DFT, textbook triangular mel filters for both the
HTK/torchaudio and Slaney/librosa conventions). torch (CPU) is available
and is used as a second independent check for the STFT itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from audio_classification_icbhi_tpu import ops
from audio_classification_icbhi_tpu.ops import mel as mel_ops
from audio_classification_icbhi_tpu.ops import stft as stft_ops


# ---------- independent numpy references ----------

def np_stft_power(x, n_fft, hop, center=True):
    """Direct-DFT power spectrogram, torch.stft semantics."""
    if center:
        x = np.pad(x, n_fft // 2, mode="reflect")
    win = 0.5 * (1 - np.cos(2 * np.pi * np.arange(n_fft) / n_fft))
    t = 1 + (len(x) - n_fft) // hop
    frames = np.stack([x[i * hop : i * hop + n_fft] * win for i in range(t)])
    spec = np.fft.rfft(frames, n=n_fft, axis=-1)
    return (np.abs(spec) ** 2).T  # (n_bins, T)


def np_mel_fb_htk(sr, n_fft, n_mels, f_min=0.0, f_max=None):
    """Textbook HTK-scale unnormalized triangular filterbank (torchaudio default)."""
    def h2m(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def m2h(m):
        return 700.0 * (10 ** (m / 2595.0) - 1.0)

    if f_max is None:
        f_max = sr / 2
    n_freqs = n_fft // 2 + 1
    freqs = np.linspace(0, sr / 2, n_freqs)
    pts = m2h(np.linspace(h2m(f_min), h2m(f_max), n_mels + 2))
    fb = np.zeros((n_freqs, n_mels))
    for m in range(n_mels):
        lo, cen, hi = pts[m], pts[m + 1], pts[m + 2]
        rise = (freqs - lo) / (cen - lo)
        fall = (hi - freqs) / (hi - cen)
        fb[:, m] = np.maximum(0, np.minimum(rise, fall))
    return fb


def np_mel_fb_slaney(sr, n_fft, n_mels):
    """librosa-default (slaney scale + slaney norm) filterbank."""
    f_sp = 200.0 / 3

    def h2m(f):
        f = np.atleast_1d(np.asarray(f, dtype=float))
        m = f / f_sp
        log = f >= 1000.0
        m[log] = 15.0 + np.log(f[log] / 1000.0) / (np.log(6.4) / 27.0)
        return m

    def m2h(m):
        m = np.asarray(m, dtype=float)
        f = f_sp * m
        log = m >= 15.0
        f[log] = 1000.0 * np.exp((np.log(6.4) / 27.0) * (m[log] - 15.0))
        return f

    n_freqs = n_fft // 2 + 1
    freqs = np.linspace(0, sr / 2, n_freqs)
    pts = m2h(np.linspace(h2m(0.0)[0], h2m(sr / 2)[0], n_mels + 2))
    fb = np.zeros((n_freqs, n_mels))
    for m in range(n_mels):
        lo, cen, hi = pts[m], pts[m + 1], pts[m + 2]
        rise = (freqs - lo) / (cen - lo)
        fall = (hi - freqs) / (hi - cen)
        fb[:, m] = np.maximum(0, np.minimum(rise, fall)) * (2.0 / (hi - lo))
    return fb


def torch_mel_golden(x, sr, n_fft, hop, n_mels):
    """Cross-LIBRARY full-chain golden: framing / reflect pad / Hann window /
    FFT from torch.stft in float64 (an independent implementation of exactly
    the semantics the reference's torchaudio chain sits on,
    src/data/preprocessing.py:38-47), composed with the in-test HTK
    filterbank derivation and dB in numpy. A shared-derivation bug in the
    numpy STFT golden cannot hide here."""
    spec = torch.stft(
        torch.from_numpy(np.asarray(x, np.float64)),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft, dtype=torch.float64),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    power = (spec.abs() ** 2).numpy()  # (n_bins, T)
    mel = np_mel_fb_htk(sr, n_fft, n_mels).T @ power
    return 10.0 * np.log10(np.maximum(mel, 1e-10))


def make_signal(rng, length=16000, sr=16000):
    """Respiratory-ish test signal: tones + filtered noise + crackle bursts."""
    t = np.arange(length) / sr
    x = (
        0.4 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 830 * t)
        + 0.1 * rng.standard_normal(length)
    )
    x[4000:4032] += 0.8 * rng.standard_normal(32)  # crackle-like burst
    return x.astype(np.float32)


# ---------- tests ----------

SR, N_FFT, HOP, N_MELS = 16000, 2048, 512, 128


class TestSTFT:
    def test_num_frames(self):
        assert stft_ops.num_frames(SR * 8, N_FFT, HOP) == 251
        assert stft_ops.num_frames(SR * 5, N_FFT, HOP) == 157
        assert stft_ops.num_frames(SR * 3, N_FFT, HOP) == 94

    def test_power_vs_numpy(self, rng):
        x = make_signal(rng)
        got = np.asarray(ops.stft_power(jnp.asarray(x), N_FFT, HOP))
        want = np_stft_power(np.asarray(x, np.float64), N_FFT, HOP)
        assert got.shape == want.shape == (N_FFT // 2 + 1, 1 + len(x) // HOP)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_power_vs_torch(self, rng):
        x = make_signal(rng)
        got = np.asarray(ops.stft_power(jnp.asarray(x), N_FFT, HOP))
        spec = torch.stft(
            torch.from_numpy(x),
            n_fft=N_FFT,
            hop_length=HOP,
            window=torch.hann_window(N_FFT),
            center=True,
            pad_mode="reflect",
            return_complex=True,
        )
        want = (spec.abs() ** 2).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_matmul_dft_matches_fft(self, rng):
        x = make_signal(rng)
        fft = np.asarray(ops.stft_power(jnp.asarray(x), N_FFT, HOP))
        mm = np.asarray(ops.stft_power(jnp.asarray(x), N_FFT, HOP, use_matmul_dft=True))
        np.testing.assert_allclose(mm, fft, rtol=1e-3, atol=2e-3)

    def test_frame_even_odd_matches_deinterleaved_frames(self, rng):
        """Fused framing+deinterleave == frame_signal then parity split,
        on both the fast path (n_fft%hop==0, hop even) and the fallback."""
        x = jnp.asarray(np.stack([make_signal(rng), make_signal(rng)]))
        for n_fft, hop in ((2048, 512), (2048, 600)):  # fast path / fallback
            e, o = stft_ops.frame_even_odd(x, n_fft, hop)
            frames = np.asarray(stft_ops.frame_signal(x, n_fft, hop))
            np.testing.assert_array_equal(np.asarray(e), frames[..., 0::2])
            np.testing.assert_array_equal(np.asarray(o), frames[..., 1::2])

    def test_batched(self, rng):
        x = np.stack([make_signal(rng), make_signal(rng)])
        got = ops.stft_power(jnp.asarray(x), N_FFT, HOP)
        assert got.shape == (2, N_FFT // 2 + 1, 1 + x.shape[1] // HOP)
        one = ops.stft_power(jnp.asarray(x[0]), N_FFT, HOP)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(one), rtol=1e-5, atol=1e-5)


class TestMelFilterbank:
    def test_htk_fb_golden(self):
        got = np.asarray(ops.mel_filterbank(SR, N_FFT, N_MELS))
        want = np_mel_fb_htk(SR, N_FFT, N_MELS)
        assert got.shape == (N_FFT // 2 + 1, N_MELS)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_slaney_fb_golden(self):
        got = np.asarray(
            ops.mel_filterbank(SR, N_FFT, N_MELS, mel_scale="slaney", norm="slaney")
        )
        want = np_mel_fb_slaney(SR, N_FFT, N_MELS)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_mel_scale_roundtrip(self):
        f = np.array([0.0, 100.0, 440.0, 1000.0, 4000.0, 8000.0])
        for scale in ("htk", "slaney"):
            np.testing.assert_allclose(
                mel_ops.mel_to_hz(mel_ops.hz_to_mel(f, scale), scale), f, atol=1e-6
            )


class TestDb:
    def test_amplitude_to_db_torchaudio_semantics(self):
        x = jnp.asarray([1.0, 0.1, 1e-12, 100.0])
        got = np.asarray(ops.amplitude_to_db(x))
        want = 10.0 * np.log10(np.maximum(np.asarray(x), 1e-10))
        np.testing.assert_allclose(got, want, atol=1e-3)  # f32 log10

    def test_power_to_db_librosa_semantics(self):
        x = np.abs(np.random.default_rng(0).standard_normal((16, 16))) + 1e-3
        got = np.asarray(ops.power_to_db(jnp.asarray(x), ref="max"))
        want = 10 * np.log10(np.maximum(x, 1e-10)) - 10 * np.log10(x.max())
        want = np.maximum(want, want.max() - 80.0)
        np.testing.assert_allclose(got, want, atol=1e-3)  # f32 log10
        assert got.max() <= 1e-6  # ref=max -> peak at 0 dB


class TestLogMelEndToEnd:
    def test_against_composed_golden(self, rng):
        """Full chain vs numpy golden composed from independent pieces: 1e-3."""
        x = make_signal(rng, length=SR * 5)
        got = np.asarray(
            ops.log_mel_spectrogram(jnp.asarray(x), SR, N_FFT, HOP, N_MELS)
        )
        power = np_stft_power(np.asarray(x, np.float64), N_FFT, HOP)
        mel = np_mel_fb_htk(SR, N_FFT, N_MELS).T @ power
        want = 10 * np.log10(np.maximum(mel, 1e-10))
        assert got.shape == (N_MELS, 157)
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)

    def test_matmul_dft_path(self, rng):
        x = make_signal(rng, length=SR * 5)
        a = np.asarray(ops.log_mel_spectrogram(jnp.asarray(x), SR, N_FFT, HOP, N_MELS))
        b = np.asarray(
            ops.log_mel_spectrogram(jnp.asarray(x), SR, N_FFT, HOP, N_MELS, use_matmul_dft=True)
        )
        np.testing.assert_allclose(a, b, atol=5e-3)

    def test_librosa_convention(self, rng):
        x = make_signal(rng, length=SR * 2)
        got = np.asarray(
            ops.log_mel_spectrogram(
                jnp.asarray(x), SR, N_FFT, HOP, N_MELS,
                mel_scale="slaney", norm="slaney", to_db="power_max",
            )
        )
        power = np_stft_power(np.asarray(x, np.float64), N_FFT, HOP)
        mel = np_mel_fb_slaney(SR, N_FFT, N_MELS).T @ power
        want = 10 * np.log10(np.maximum(mel, 1e-10)) - 10 * np.log10(mel.max())
        want = np.maximum(want, want.max() - 80)
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)

    def test_fft_path_vs_torch_stft_golden(self, rng):
        """Cross-library pin (VERDICT r3 #2): the default XLA FFT path within
        the 1e-3 production budget of a torch.stft-composed mel chain."""
        x = make_signal(rng, length=SR * 5)
        got = np.asarray(
            ops.log_mel_spectrogram(jnp.asarray(x), SR, N_FFT, HOP, N_MELS)
        )
        want = torch_mel_golden(x, SR, N_FFT, HOP, N_MELS)
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)

    def test_matmul_dft_path_vs_torch_stft_golden(self, rng):
        x = make_signal(rng, length=SR * 5)
        got = np.asarray(
            ops.log_mel_spectrogram(
                jnp.asarray(x), SR, N_FFT, HOP, N_MELS, use_matmul_dft=True
            )
        )
        want = torch_mel_golden(x, SR, N_FFT, HOP, N_MELS)
        # CPU matmul-DFT accumulates in f32 over n_fft-long dots
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)

    def test_xla_radix2_frontend_vs_torch_stft_golden(self, rng):
        """The production XLA fallback (MelFrontend backend=auto off-TPU
        routes to the radix-2 decomposition) against the torch golden."""
        fe = mel_ops.MelFrontend(duration=5.0, normalize=False, backend="xla_radix2")
        x = make_signal(rng, length=SR * 5)
        got = np.asarray(fe(jnp.asarray(x)[None]))[0]
        want = torch_mel_golden(x, SR, N_FFT, HOP, N_MELS)
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)

    def test_frontend_normalize_and_shapes(self, rng):
        fe = mel_ops.MelFrontend(duration=5.0)
        x = jnp.asarray(np.stack([make_signal(rng, SR * 5) for _ in range(4)]))
        out = fe(x)
        assert out.shape == (4, N_MELS, 157)
        m = np.asarray(out)
        np.testing.assert_allclose(m.mean(axis=(1, 2)), 0.0, atol=1e-4)
        np.testing.assert_allclose(m.std(axis=(1, 2)), 1.0, atol=1e-3)

    def test_pad_or_crop(self):
        fe = mel_ops.MelFrontend(duration=1.0)
        short = jnp.ones((2, 8000))
        padded = fe.pad_or_crop(short)
        assert padded.shape == (2, 16000)
        assert float(padded[:, 8000:].sum()) == 0.0
        long = jnp.asarray(np.arange(32000, dtype=np.float32)[None])
        cropped = fe.pad_or_crop(long)
        assert cropped.shape == (1, 16000)
        assert float(cropped[0, 0]) == 8000.0  # center crop

    def test_f_min_f_max_golden_all_backends(self, rng):
        """torchaudio MelSpectrogram's f_min/f_max surface (reference
        preprocessing.py:38-44 leaves them default; VERDICT r1 missing #4):
        non-default values must hold the same <=1e-3 parity on every
        backend, including the radix-2 constants path which previously
        hardcoded f_min=0, f_max=sr/2."""
        x = make_signal(rng, length=SR * 2)
        power = np_stft_power(np.asarray(x, np.float64), N_FFT, HOP)
        mel = np_mel_fb_htk(SR, N_FFT, N_MELS, f_min=50.0, f_max=4000.0).T @ power
        want = 10 * np.log10(np.maximum(mel, 1e-10))

        for backend in ("xla", "auto"):  # auto -> radix-2 (n_fft % 4 == 0)
            fe = mel_ops.MelFrontend(
                duration=2.0, f_min=50.0, f_max=4000.0,
                normalize=False, backend=backend,
            )
            got = np.asarray(fe.log_mel(jnp.asarray(x)))
            np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4,
                                       err_msg=f"backend={backend}")

        from audio_classification_icbhi_tpu.ops import pallas_mel

        got = np.asarray(pallas_mel.log_mel_pallas(
            jnp.asarray(x), SR, N_FFT, HOP, N_MELS,
            f_min=50.0, f_max=4000.0, interpret=True,
        ))
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4,
                                   err_msg="backend=pallas")

    def test_top_db_clips_per_example(self, rng):
        x = jnp.asarray(np.stack([make_signal(rng, SR), make_signal(rng, SR) * 1e-3]))
        fe = mel_ops.MelFrontend(duration=1.0, top_db=30.0, normalize=False)
        db = np.asarray(fe.log_mel(x))
        for i in range(2):
            rng_db = db[i].max() - db[i].min()
            assert rng_db <= 30.0 + 1e-5

    def test_from_config_plumbs_params(self):
        cfg = {"data": {"sample_rate": SR, "n_mels": N_MELS, "n_fft": N_FFT,
                        "hop_length": HOP, "duration": 1.0,
                        "f_min": 25.0, "f_max": 6000.0, "top_db": 60.0}}
        fe = mel_ops.MelFrontend.from_config(cfg)
        assert (fe.f_min, fe.f_max, fe.top_db) == (25.0, 6000.0, 60.0)
        # hash distinguishes parameterizations (jit static-arg correctness)
        fe2 = mel_ops.MelFrontend.from_config(cfg, f_min=0.0)
        assert fe != fe2

    def test_no_tracer_leak_from_constant_caches(self, rng):
        """Regression: DFT-matrix cache must not capture tracers — first use
        inside a jit trace, then eager use (found live on TPU)."""
        x = jnp.asarray(make_signal(rng, SR)[None])
        jitted = jax.jit(
            lambda w: ops.log_mel_spectrogram(w, SR, N_FFT, HOP, N_MELS, use_matmul_dft=True)
        )
        a = jitted(x)
        b = ops.log_mel_spectrogram(x, SR, N_FFT, HOP, N_MELS, use_matmul_dft=True)  # eager
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_jit_once(self, rng):
        """Two same-shape calls must hit ONE compilation: a MelFrontend
        hashability regression would retrace per call — a ~16 s tunnel
        recompile every training step in production."""
        fe = mel_ops.MelFrontend(duration=1.0)
        f = jax.jit(fe.__call__)
        x = jnp.asarray(make_signal(rng, SR)[None])
        out1 = f(x)
        out2 = f(x + 0.0)
        assert out1.shape == out2.shape == (1, N_MELS, 32)
        assert f._cache_size() == 1  # the assertion the test's name promises


class TestAugment:
    def test_add_noise_scale(self):
        key = jax.random.PRNGKey(0)
        x = jnp.zeros((4, 16000))
        y = ops.add_noise(key, x, noise_factor=0.005)
        s = float(jnp.std(y))
        assert 0.004 < s < 0.006

    def test_time_shift_is_roll(self):
        x = jnp.asarray(np.arange(100, dtype=np.float32)[None])
        # Find some key, then verify output is a circular shift of input.
        y = np.asarray(ops.time_shift(jax.random.PRNGKey(3), x))[0]
        x0 = np.asarray(x)[0]
        start = int(np.where(y == 0)[0][0])
        np.testing.assert_allclose(np.roll(x0, start), y)

    def test_masks_zero_a_band(self):
        # find keys whose draws give a nonzero masked band for each axis, so
        # a mask that regressed to a no-op CANNOT pass (a vacuous 0 <= len
        # lower bound used to let that through), then pin width bound +
        # contiguity for BOTH masks
        spec = jnp.ones((1, 128, 100))
        checked_f = checked_t = False
        for seed in range(20):
            key = jax.random.PRNGKey(seed)
            fm = np.asarray(ops.freq_mask(key, spec, 15))
            tm = np.asarray(ops.time_mask(key, spec, 35))
            zero_rows = np.where(fm[0].sum(axis=1) == 0)[0]
            zero_cols = np.where(tm[0].sum(axis=0) == 0)[0]
            assert len(zero_rows) <= 15 and len(zero_cols) <= 35
            if len(zero_rows) > 1:
                assert np.all(np.diff(zero_rows) == 1)  # contiguous band
                checked_f = True
            if len(zero_cols) > 1:
                assert np.all(np.diff(zero_cols) == 1)
                checked_t = True
            if checked_f and checked_t:
                break
        assert checked_f and checked_t, "no key produced a visible mask"

    def test_mask_bounds_truncate_like_torchaudio(self):
        """torchaudio draws float (value, min) but truncates BOTH bounds to
        ints (mask_start = int(min), mask_end = int(min + value)); the
        masked set must be exactly [floor(start), floor(start+width)) —
        float-interval masking is on average ~0.5 cells wider than the
        reference. Re-derives the draws with the same key discipline and
        checks the masked rows cell for cell, over many keys."""
        size, param = 128, 15
        spec = jnp.ones((size, 100))
        for seed in range(40):
            key = jax.random.PRNGKey(seed)
            k_w, k_s = jax.random.split(key)
            width = float(jax.random.uniform(k_w, (), minval=0.0, maxval=float(param)))
            start = float(jax.random.uniform(k_s, (), minval=0.0,
                                             maxval=float(size) - width))
            expect = np.zeros(size, bool)
            expect[int(np.floor(start)):int(np.floor(start + width))] = True
            fm = np.asarray(ops.freq_mask(key, spec, param))
            np.testing.assert_array_equal(fm.sum(axis=1) == 0, expect, err_msg=f"seed {seed}")
            # the fused-epilogue bounds describe the SAME integer cells as
            # augment_spectrogram's freq mask (whose key is split(key)[0])
            k_f = jax.random.split(key)[0]
            fm2 = np.asarray(ops.freq_mask(k_f, spec, param))
            f_start, f_width, _, _ = np.asarray(
                ops.spec_mask_bounds(key, size, 100, freq_mask_param=param)
            )
            idx = np.arange(size)
            np.testing.assert_array_equal(
                (idx >= f_start) & (idx < f_start + f_width),
                fm2.sum(axis=1) == 0,
            )

    def test_augment_waveform_deterministic_per_key(self):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8000)), dtype=jnp.float32)
        k = jax.random.PRNGKey(7)
        a = ops.augment_waveform(k, x)
        b = ops.augment_waveform(k, x)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestResample:
    @pytest.mark.parametrize("orig,new", [(44100, 16000), (8000, 16000), (22050, 16000)])
    def test_against_torch_conv_reference(self, rng, orig, new):
        """Compare against a scipy-free direct implementation via torch conv1d
        using the same published kernel construction."""
        x = make_signal(rng, length=orig, sr=orig)
        got = np.asarray(ops.resample(jnp.asarray(x), orig, new))
        import math
        g = math.gcd(orig, new)
        og, ng = orig // g, new // g
        base = min(og, ng) * 0.99
        width = math.ceil(6 * og / base)
        idx = np.arange(-width, width + og, dtype=np.float64)[None] / og
        t = np.arange(0, -ng, -1, dtype=np.float64)[:, None] / ng + idx
        t = np.clip(t * base, -6, 6)
        win = np.cos(t * np.pi / 12) ** 2
        tp = t * np.pi
        ker = np.where(tp == 0, 1.0, np.sin(tp) / np.where(tp == 0, 1.0, tp)) * win * base / og
        xt = torch.from_numpy(np.pad(x.astype(np.float64), (width, width + og))[None, None])
        y = torch.nn.functional.conv1d(xt, torch.from_numpy(ker[:, None]), stride=og)
        want = y.transpose(1, 2).reshape(-1).numpy()[: math.ceil(ng * len(x) / og)]
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_identity(self, rng):
        x = make_signal(rng)
        np.testing.assert_array_equal(np.asarray(ops.resample(jnp.asarray(x), 16000, 16000)), x)
