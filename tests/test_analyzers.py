"""Analyzer engine tests: windowing math, detection semantics (both
reference variants), CSV schemas, flexible frontend bucketing, sharded
window inference, and visualization outputs."""

import csv

import numpy as np
import pytest

import jax

from audio_classification_icbhi_tpu.analyzers import viz
from audio_classification_icbhi_tpu.analyzers.engine import (
    AnalyzerEngine,
    FlexibleMelFrontend,
    SegmentResult,
)
from audio_classification_icbhi_tpu.data.synthetic import synth_respiratory_cycle
from audio_classification_icbhi_tpu.data.wavio import write_wav
from audio_classification_icbhi_tpu.models import build_model
from audio_classification_icbhi_tpu.parallel.mesh import get_mesh
from audio_classification_icbhi_tpu.utils.checkpoint import save_checkpoint


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    """Self-describing checkpoint with a small random model (4 kHz config
    keeps CPU compiles fast)."""
    import jax.numpy as jnp

    config = {
        "data": {
            "dataset_path": "x", "sample_rate": 4000, "n_mels": 32,
            "n_fft": 256, "hop_length": 64, "duration": 1.0,
            "augmentation": False,
        },
        "model": {"architecture": "cnn", "num_classes": 4, "dropout": 0.1},
        "training": {"batch_size": 8, "mixed_precision": False},
        "classes": ["normal", "crackles", "wheezes", "both"],
        "seed": 0,
    }
    model = build_model(config)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 63, 1)), train=False)
    path = tmp_path_factory.mktemp("ckpt") / "model.ckpt"
    save_checkpoint(path, {
        "epoch": 0,
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "val_loss": 1.0,
        "config": config,
        "class_weights": np.ones(4, np.float32),
    })
    return str(path)


@pytest.fixture(scope="module")
def wav_path(tmp_path_factory):
    rng = np.random.default_rng(3)
    parts = [synth_respiratory_cycle(rng, lbl, 1.5, 4000) for lbl in (0, 1, 2, 3)]
    p = tmp_path_factory.mktemp("wav") / "rec.wav"
    write_wav(p, np.concatenate(parts), 4000)
    return str(p)


def make_engine(tiny_ckpt, **kw):
    kw.setdefault("sample_rate", 4000)
    kw.setdefault("segment_duration", 1.0)
    return AnalyzerEngine(tiny_ckpt, **kw)


class TestWindowing:
    def test_segment_math_with_tail(self, tiny_ckpt):
        eng = make_engine(tiny_ckpt, overlap=0.5)
        audio = np.zeros(4000 * 3 + 1000, np.float32)  # 3.25 s
        windows, starts, ends = eng.segment_audio(audio)
        # full 1s windows start every 0.5s while start+1.0 <= 3.25: 0..2.0
        # (5 windows), then a zero-padded tail at 2.5 (reference
        # realtime_analyzer.py:141-182 semantics)
        assert windows.shape == (6, 4000)
        np.testing.assert_allclose(starts[:3], [0.0, 0.5, 1.0])
        assert starts[-1] == pytest.approx(2.5)
        assert ends[-1] == pytest.approx(3.25)
        # tail zero-padded past the 3000 real samples
        assert windows[-1, 3000:].sum() == 0.0

    def test_no_overlap(self, tiny_ckpt):
        eng = make_engine(tiny_ckpt, overlap=0.0)
        windows, starts, _ = eng.segment_audio(np.zeros(4000 * 4, np.float32))
        assert windows.shape[0] == 4
        np.testing.assert_allclose(starts, [0, 1, 2, 3])

    def test_max_duration_crop(self, tiny_ckpt, tmp_path):
        p = tmp_path / "long.wav"
        write_wav(p, np.zeros(4000 * 30, np.float32), 4000)
        eng = make_engine(tiny_ckpt, max_duration=15.0)
        audio = eng.load_audio(str(p))
        assert len(audio) == 4000 * 15

    def test_audio_shorter_than_one_segment(self, tiny_ckpt):
        """Sub-segment recordings become ONE zero-padded tail window
        (reference realtime_analyzer.py:141-182: the main loop's range is
        empty when len(audio) < segment_samples). Regression: the old
        max(n - seg, 0) clamp emitted an unpadded short first window,
        crashing np.stack (overlap>0) or shipping a wrong-length batch
        (overlap=0)."""
        for overlap in (0.5, 0.0):
            eng = make_engine(tiny_ckpt, overlap=overlap)
            audio = np.ones(2800, np.float32)  # 0.7 s at 4 kHz
            windows, starts, ends = eng.segment_audio(audio)
            assert windows.shape == (1, 4000)
            assert starts[0] == 0.0 and ends[0] == pytest.approx(0.7)
            assert windows[0, 2800:].sum() == 0.0  # zero-padded
            assert windows[0, :2800].sum() == 2800.0

    def test_empty_audio(self, tiny_ckpt):
        eng = make_engine(tiny_ckpt)
        windows, starts, ends = eng.segment_audio(np.zeros(0, np.float32))
        assert windows.shape == (0, 4000) and starts.size == 0 and ends.size == 0

    def test_unknown_mode_rejected(self, tiny_ckpt):
        with pytest.raises(ValueError, match="unknown analyzer mode"):
            make_engine(tiny_ckpt, mode="Legacy")

    def test_sample_rate_defaults_to_checkpoint_config(self, tiny_ckpt):
        eng = AnalyzerEngine(tiny_ckpt, segment_duration=1.0)  # no sample_rate
        assert eng.sample_rate == 4000  # from the embedded config

    def test_frontend_honors_config_fmax(self, tmp_path):
        """f_min/f_max/top_db from the checkpoint config must reach the
        analyzer's mel chain — a model trained with f_max=1000 analyzed with
        an f_max=sr/2 filterbank would see silently different features."""
        import jax.numpy as jnp

        config = {
            "data": {
                "dataset_path": "x", "sample_rate": 4000, "n_mels": 32,
                "n_fft": 256, "hop_length": 64, "duration": 1.0,
                "augmentation": False, "f_max": 1000.0,
            },
            "model": {"architecture": "cnn", "num_classes": 4, "dropout": 0.1},
            "training": {"batch_size": 8, "mixed_precision": False},
            "classes": ["normal", "crackles", "wheezes", "both"],
            "seed": 0,
        }
        model = build_model(config)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 63, 1)),
                               train=False)
        path = tmp_path / "fmax.ckpt"
        save_checkpoint(path, {
            "epoch": 0, "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
            "val_loss": 1.0, "config": config,
            "class_weights": np.ones(4, np.float32),
        })
        eng = AnalyzerEngine(str(path), segment_duration=1.0)
        from audio_classification_icbhi_tpu.ops.mel import MelFrontend

        expect = MelFrontend.from_config(config, duration=1.0, normalize=True,
                                         use_matmul_dft=True)
        wav = np.random.default_rng(0).standard_normal((2, 4000)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(eng.frontend(wav)), np.asarray(expect(wav)),
            rtol=1e-5, atol=1e-5,
        )


class TestDetectionSemantics:
    def _result(self, eng, probs):
        return eng._make_result(np.asarray(probs, np.float32), 0.0, 1.0)

    def test_threshold_mode_clamped(self, tiny_ckpt):
        eng = make_engine(tiny_ckpt, mode="threshold",
                          crackle_threshold=0.3, wheeze_threshold=0.3)
        r = self._result(eng, [0.1, 0.5, 0.0, 0.6])
        assert r.has_crackle and r.crackle_confidence == 1.0  # min(0.5+0.6, 1)
        assert r.has_wheeze and r.wheeze_confidence == pytest.approx(0.6)
        r2 = self._result(eng, [0.8, 0.1, 0.1, 0.0])
        assert not r2.has_crackle and not r2.has_wheeze

    def test_legacy_mode_unclamped(self, tiny_ckpt):
        eng = make_engine(tiny_ckpt, mode="legacy")
        r = self._result(eng, [0.0, 0.6, 0.0, 0.6])
        assert r.has_crackle
        assert r.crackle_confidence == pytest.approx(1.2)  # reference quirk kept
        # 0.4 < 0.5 gates even though sum 0.8 > 0.5
        r2 = self._result(eng, [0.2, 0.4, 0.0, 0.4])
        assert not r2.has_crackle

    def test_predicted_class_map(self, tiny_ckpt):
        eng = make_engine(tiny_ckpt)
        assert self._result(eng, [0.9, 0, 0, 0.1]).predicted_class == "normal"
        assert self._result(eng, [0, 0, 0, 1]).predicted_class == "both"


class TestEndToEnd:
    def test_analyze_audio_and_exports(self, tiny_ckpt, wav_path, tmp_path):
        eng = make_engine(tiny_ckpt, max_duration=None)
        results, audio = eng.analyze_audio(wav_path)
        assert len(results) == 12  # 6 s: 11 full 1s windows at 0.5 hop + tail
        assert all(isinstance(r, SegmentResult) for r in results)
        eng.print_summary(results)

        base_csv = tmp_path / "base.csv"
        eng.export_results(results, str(base_csv))
        rows = list(csv.reader(open(base_csv)))
        assert rows[0] == ["Start (s)", "End (s)", "Crackle", "Wheeze",
                           "Crackle Conf", "Wheeze Conf", "Class"]
        assert len(rows) == len(results) + 1

        tl_csv = tmp_path / "tl.csv"
        eng.export_results_timeline(results, str(tl_csv))
        rows = list(csv.reader(open(tl_csv)))
        assert rows[0][2] == "Detection Type"
        assert rows[1][2] in ("Normal", "Crackle", "Wheeze", "Both")

    def test_sharded_windows_match_single_device(self, tiny_ckpt, wav_path):
        single = make_engine(tiny_ckpt, max_duration=None)
        sharded = make_engine(tiny_ckpt, max_duration=None, mesh=get_mesh())
        r1, audio = single.analyze_audio(wav_path)
        r2, _ = sharded.analyze_audio(wav_path)
        assert len(r1) == len(r2)
        for a, b in zip(r1, r2):
            assert a.predicted_class == b.predicted_class
            assert a.crackle_confidence == pytest.approx(b.crackle_confidence, abs=1e-5)

    def test_visualizations_render(self, tiny_ckpt, wav_path, tmp_path):
        eng = make_engine(tiny_ckpt, max_duration=None)
        results, audio = eng.analyze_audio(wav_path)
        viz.three_panel(results, audio, 4000, crackle_threshold=0.3,
                        wheeze_threshold=0.3, save_path=tmp_path / "p3.png")
        viz.timeline(results, audio, 4000, save_path=tmp_path / "tl.png")
        viz.spectrogram(results, audio, 4000, save_path=tmp_path / "sp.png",
                        n_fft=256, hop_length=64, n_mels=32)
        for f in ("p3.png", "tl.png", "sp.png"):
            assert (tmp_path / f).stat().st_size > 10_000


class TestFlexibleFrontend:
    def test_short_window_reconfig(self):
        fe = FlexibleMelFrontend(16000, 128, 2048, 512, duration=0.5)
        # reference preprocessing_flexible.py:34-36: n_fft = min(1024, sr*dur/2)
        assert fe.n_fft == 1024 and fe.hop_length == 256
        assert fe.target_time_steps == max(int(np.ceil(8000 / 256)), 32)

    def test_standard_window_untouched(self):
        fe = FlexibleMelFrontend(16000, 128, 2048, 512, duration=1.0)
        assert fe.n_fft == 2048 and fe.hop_length == 512
        assert fe.target_time_steps == 32

    def test_resize_to_fixed_time_axis(self, rng):
        import jax.numpy as jnp

        fe = FlexibleMelFrontend(16000, 128, 2048, 512, duration=2.0)
        x = jnp.asarray(rng.standard_normal((3, 32000)).astype(np.float32))
        out = fe(x)
        assert out.shape == (3, 128, fe.target_time_steps)
        m = np.asarray(out)
        np.testing.assert_allclose(m.mean(axis=(1, 2)), 0, atol=1e-4)

    def test_default_window_is_fused_kernel_eligible(self):
        """The analyzer's default 1-s window (2048/512, 32 frames, no
        resize) must route to the production fused kernel on TPU: auto
        policy delegation (VERDICT r2 #5 — the hot path previously
        hardcoded the XLA radix-2 path)."""
        fe = FlexibleMelFrontend(16000, 128, 2048, 512, duration=1.0)
        assert not fe.needs_resize
        assert fe._inner._pallas_algorithm() == "radix16dif_fused"
        assert fe._inner.normalize  # epilogue fuses: nothing sits between

    def test_flexible_path_matches_fused_kernel(self, rng):
        """Semantic parity of the delegated path with what the kernel
        computes on TPU (interpret mode here: CI has no Mosaic)."""
        import jax.numpy as jnp

        from audio_classification_icbhi_tpu.ops.pallas_mel import log_mel_pallas

        fe = FlexibleMelFrontend(16000, 64, 2048, 512, duration=1.0)
        x = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.1)
        got_xla = np.asarray(fe(x))  # CPU -> XLA radix-2 path
        got_kernel = np.asarray(log_mel_pallas(
            x, 16000, 2048, 512, 64, algorithm="radix4_fused",
            normalize=True, interpret=True,
        ))
        np.testing.assert_allclose(got_kernel, got_xla, atol=2e-3)
