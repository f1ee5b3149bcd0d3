"""Real-ICBHI-corpus rehearsal: the full --data path on corpus-shaped input.

The real ICBHI 2017 download is not in the image, so these tests drive the
exact pipeline a user would run on it — segmenter ETL -> segmented dataset ->
2-epoch train -> validate -> CLI classify — on a fixture that mimics the real
download's grit (mixed native sample rates 4/10/44.1 kHz, real filename
grammar {patient}_{rec}_{chest}_{mode}_{device}, CRLF endings, trailing
whitespace/tabs, a stray header line, zero-length cycles, missing trailing
newlines). Match: reference src/data/dataset.py:95-130 and
preprocess_icbhi.py:63-91, which must survive the same files.
"""

import numpy as np
import pytest

from audio_classification_icbhi_tpu.data import generate_icbhi_corpus_fixture
from audio_classification_icbhi_tpu.data.dataset import ICBHIDataset
from audio_classification_icbhi_tpu.data.dataset_segmented import ICBHISegmentedDataset
from audio_classification_icbhi_tpu.data.segmenter import ICBHISegmenter
from audio_classification_icbhi_tpu.inference import ClassifierEngine
from audio_classification_icbhi_tpu.models import build_model
from audio_classification_icbhi_tpu.training import Trainer
from audio_classification_icbhi_tpu.utils.checkpoint import load_checkpoint

SR = 4000


def corpus_config(tmp_path, epochs=2):
    return {
        "data": {
            "dataset_path": "unused",
            "sample_rate": SR,
            "n_mels": 32,
            "n_fft": 256,
            "hop_length": 64,
            "duration": 1.0,
            "augmentation": True,
            "train_split": 0.7,
            "val_split": 0.15,
        },
        "model": {"architecture": "cnn", "num_classes": 4, "dropout": 0.1},
        "training": {
            "batch_size": 8,
            "epochs": epochs,
            "learning_rate": 3e-3,
            "weight_decay": 1e-4,
            "optimizer": "adam",
            "scheduler": "cosine",
            "mixed_precision": False,
            "gradient_accumulation_steps": 1,
            "early_stopping_patience": 50,
            "checkpoint_dir": str(tmp_path / "ckpts"),
            "log_dir": str(tmp_path / "runs"),
            "save_every": 2,
        },
        "device": {"use_cuda": False, "num_workers": 2, "pin_memory": False},
        "classes": ["normal", "crackles", "wheezes", "both"],
        "seed": 0,
    }


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("icbhi_corpus")
    generate_icbhi_corpus_fixture(root, num_recordings=16, cycles_per_recording=5, seed=3)
    return root


@pytest.fixture(scope="module")
def segmented(corpus, tmp_path_factory):
    out = tmp_path_factory.mktemp("icbhi_segmented")
    seg = ICBHISegmenter(corpus / "audio_and_txt_files", out, sample_rate=SR)
    seg.process_all()
    return out, seg.stats


class TestCorpusFixtureETL:
    def test_segmenter_survives_corpus_grit(self, segmented):
        out, stats = segmented
        # every recording processed despite CRLF/header/trailing-junk rows
        assert stats["processed_files"] == 16
        # 16 recordings x 5 cycles, minus zero-length cycles (start == end,
        # injected every 4th recording) which min_duration must skip
        assert stats["total_segments"] > 0
        assert stats["skipped_segments"] >= 4
        assert stats["total_segments"] + stats["skipped_segments"] >= 16 * 5
        # all four classes present on disk
        for d in ("normal", "crackle", "wheeze", "both"):
            assert stats[d] > 0
            assert any((out / d).glob("*.wav")), d

    def test_segments_resampled_to_target_rate(self, segmented):
        from audio_classification_icbhi_tpu.data.wavio import read_wav

        out, _ = segmented
        # source rates are 4k/10k/44.1k; every segment must land at SR
        for d in ("normal", "crackle", "wheeze", "both"):
            for wav in list((out / d).glob("*.wav"))[:3]:
                data, sr = read_wav(wav)  # (channels, n)
                assert sr == SR
                assert data.shape[-1] >= int(0.5 * SR)  # min_duration respected

    def test_whole_recording_dataset_mixed_rates(self, corpus, tmp_path):
        config = corpus_config(tmp_path)
        ds = ICBHIDataset(corpus, "train", config)
        assert len(ds) > 0
        for i in range(len(ds)):
            wave, label = ds[i]
            assert wave.shape == (SR,)  # fixed length at the config rate
            assert wave.dtype == np.float32
            assert 0 <= label <= 3
            assert np.all(np.isfinite(wave))


class TestCorpusFixtureTrainValidate:
    def test_train_validate_classify_e2e(self, corpus, segmented, tmp_path):
        out, _ = segmented
        config = corpus_config(tmp_path)
        train = ICBHISegmentedDataset(out, "train", config, augment=True)
        val = ICBHISegmentedDataset(out, "val", config, augment=False)
        assert len(train) > 0 and len(val) > 0

        model = build_model(config, axis_name="data")
        trainer = Trainer(model, train, val, config)
        history = trainer.train()
        assert len(history["train_loss"]) == 2
        assert all(np.isfinite(history["train_loss"]))
        assert all(np.isfinite(history["val_loss"]))

        ckpt_path = tmp_path / "ckpts" / "best_model.ckpt"
        assert ckpt_path.exists()
        ckpt = load_checkpoint(ckpt_path)
        assert ckpt["config"]["data"]["sample_rate"] == SR

        # CLI classify on an ORIGINAL mixed-rate recording (44.1 kHz device),
        # exactly what `cli.py classify --audio <real download wav>` does
        eng = ClassifierEngine(ckpt_path)
        wav_441 = sorted((corpus / "audio_and_txt_files").glob("*Meditron.wav"))[0]
        res = eng.classify_file(wav_441)
        assert res["predicted_class"] in config["classes"]
        assert 0.0 <= res["confidence"] <= 1.0
        probs = np.asarray(list(res["probabilities"].values()), dtype=np.float64)
        assert probs.shape == (4,) and abs(probs.sum() - 1.0) < 1e-3
