"""Smoke tests: every reporting plot renders a non-trivial PNG."""

import numpy as np
import pytest

from audio_classification_icbhi_tpu.utils.icbhi_metrics import calculate_icbhi_score
from audio_classification_icbhi_tpu.utils import plotting


@pytest.fixture
def preds(rng):
    y_true = rng.integers(0, 4, 60)
    y_pred = np.where(rng.random(60) < 0.7, y_true, rng.integers(0, 4, 60))
    y_prob = rng.dirichlet(np.ones(4), 60)
    return y_true, y_pred, y_prob


def _check(path):
    assert path.exists() and path.stat().st_size > 5_000


def test_confusion_matrix(tmp_path, preds):
    y_true, y_pred, _ = preds
    cm = plotting.plot_confusion_matrix(y_true, y_pred, save_path=tmp_path / "cm.png")
    assert cm.sum() == 60
    _check(tmp_path / "cm.png")
    plotting.plot_confusion_matrix(
        y_true, y_pred, save_path=tmp_path / "cmn.png", normalize=True
    )
    _check(tmp_path / "cmn.png")


def test_roc_curves(tmp_path, preds):
    y_true, _, y_prob = preds
    plotting.plot_roc_curves(y_true, y_prob, save_path=tmp_path / "roc.png")
    _check(tmp_path / "roc.png")


def test_history_plots(tmp_path):
    hist = {
        "train_loss": [1.4, 1.2, 1.0],
        "val_loss": [1.35, 1.25, 1.1],
        "train_acc": [30.0, 50.0, 70.0],
        "val_acc": [35.0, 45.0, 65.0],
        "icbhi_score": [0.3, 0.4, 0.5],
        "sensitivity": [0.2, 0.4, 0.5],
        "specificity": [0.8, 0.75, 0.8],
    }
    plotting.plot_training_history(hist, save_path=tmp_path / "hist.png")
    _check(tmp_path / "hist.png")
    plotting.plot_icbhi_history(hist, save_path=tmp_path / "ih.png")
    _check(tmp_path / "ih.png")


def test_icbhi_plots(tmp_path, preds):
    y_true, y_pred, _ = preds
    metrics = calculate_icbhi_score(y_true, y_pred)
    plotting.plot_icbhi_metrics(metrics, save_path=tmp_path / "im.png")
    _check(tmp_path / "im.png")
    plotting.plot_icbhi_confusion_matrix(y_true, y_pred, save_path=tmp_path / "icm.png")
    _check(tmp_path / "icm.png")
