"""ClassifierEngine tests: self-describing checkpoint contract, batch
padding, per-file error skipping (reference cli.py behaviors)."""

import numpy as np
import pytest

import jax

from audio_classification_icbhi_tpu.data.synthetic import synth_respiratory_cycle
from audio_classification_icbhi_tpu.data.wavio import write_wav
from audio_classification_icbhi_tpu.inference import ClassifierEngine
from audio_classification_icbhi_tpu.models import build_model
from audio_classification_icbhi_tpu.models.registry import init_variables
from audio_classification_icbhi_tpu.utils.checkpoint import save_checkpoint


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
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
    variables = init_variables(model, jax.random.PRNGKey(0), (1, 32, 63, 1))
    path = tmp_path_factory.mktemp("eng") / "m.ckpt"
    save_checkpoint(path, {
        "epoch": 4, "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "val_loss": 0.9, "config": config,
        "class_weights": np.ones(4, np.float32),
        "icbhi_score": 0.55,
    })
    return str(path)


class TestClassifierEngine:
    def test_rebuilds_from_embedded_config(self, ckpt):
        eng = ClassifierEngine(ckpt)
        assert eng.class_names == ["normal", "crackles", "wheezes", "both"]
        assert eng.frontend.sample_rate == 4000
        info = eng.describe()
        assert info["epoch"] == 4 and info["icbhi_score"] == 0.55
        assert info["parameters"] > 0

    def test_predict_probs_padding_invariant(self, ckpt, rng):
        """Results must not depend on the internal pad-to-batch_size."""
        eng = ClassifierEngine(ckpt, batch_size=8)
        wavs = rng.standard_normal((3, 4000)).astype(np.float32)
        p3 = eng.predict_probs(wavs)
        assert p3.shape == (3, 4)
        np.testing.assert_allclose(p3.sum(axis=1), 1.0, atol=1e-5)
        # larger group split across chunks gives identical rows
        p10 = eng.predict_probs(np.concatenate([wavs] * 4)[:10])
        np.testing.assert_allclose(p10[:3], p3, atol=1e-5)

    def test_classify_file_pads_and_crops(self, ckpt, tmp_path, rng):
        eng = ClassifierEngine(ckpt)
        short = synth_respiratory_cycle(rng, 1, 0.4, 4000)
        long = synth_respiratory_cycle(rng, 2, 3.0, 4000)
        write_wav(tmp_path / "short.wav", short, 4000)
        write_wav(tmp_path / "long.wav", long, 4000)
        for name in ("short.wav", "long.wav"):
            res = eng.classify_file(tmp_path / name)
            assert set(res["probabilities"]) == set(eng.class_names)
            assert abs(sum(res["probabilities"].values()) - 1.0) < 1e-4
            assert res["predicted_class"] == max(
                res["probabilities"], key=res["probabilities"].get
            )

    def test_latency_mode_matches_batch_path(self, ckpt, rng):
        """classify_wave (pre-compiled batch-1 packed program, VERDICT r3
        #1) must agree with the padded-batch path on probs AND argmax."""
        eng = ClassifierEngine(ckpt)
        eng.warmup_latency()
        wavs = rng.standard_normal((3, 4000)).astype(np.float32)
        batch = eng.predict_probs(wavs)
        for i in range(3):
            res = eng.classify_wave(wavs[i])
            probs = np.asarray([res["probabilities"][c] for c in eng.class_names])
            np.testing.assert_allclose(probs, batch[i], atol=2e-5)
            assert res["predicted_class"] == eng.class_names[int(np.argmax(batch[i]))]
            assert res["confidence"] == pytest.approx(float(probs.max()), abs=1e-6)

    def test_classify_files_skips_bad(self, ckpt, tmp_path, rng):
        """Per-file skip-and-continue (reference cli.py:141-145)."""
        eng = ClassifierEngine(ckpt)
        good = tmp_path / "good.wav"
        write_wav(good, synth_respiratory_cycle(rng, 0, 1.0, 4000), 4000)
        bad = tmp_path / "bad.wav"
        bad.write_bytes(b"not audio")
        results = eng.classify_files([good, bad])
        assert len(results) == 1
        assert results[0]["audio_path"] == str(good)

    def test_missing_config_raises(self, tmp_path):
        p = tmp_path / "noconf.ckpt"
        save_checkpoint(p, {"params": {"x": np.zeros(2, np.float32)}})
        with pytest.raises(ValueError, match="embedded config"):
            ClassifierEngine(p)
