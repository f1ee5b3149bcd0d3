"""Trainer variant scored by the ICBHI 2017 metric.

Capability match for reference TrainerWithICBHI
(src/training/trainer_icbhi.py:14-322): identical training loop, but each
epoch's validation also computes the ICBHI score, best-model selection and
early stopping run on MAX icbhi score (:284-302), the plateau scheduler runs
in mode='max' (:86-87), extra TensorBoard tags ICBHI/{score,sensitivity,
specificity} (:254-262), and checkpoints embed icbhi_score + icbhi_metrics
(:310-322).
"""

from __future__ import annotations

import numpy as np

from audio_classification_icbhi_tpu.training.trainer import Trainer
from audio_classification_icbhi_tpu.utils.icbhi_metrics import calculate_icbhi_score


class TrainerWithICBHI(Trainer):
    plateau_mode = "max"

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.best_icbhi_score = -float("inf")
        self.history.update(icbhi_score=[], sensitivity=[], specificity=[])
        self._last_icbhi: dict = {}

    def _epoch_metrics(self, epoch: int) -> dict[str, float]:
        y_true, y_pred = [], []
        for wavs, labels, mask, b in self._eval_batches(self.val_loader):
            logits, _, _, _ = self.steps.eval_step(
                self.params, self.batch_stats, wavs, labels, mask, self.class_weights
            )
            preds = np.argmax(np.asarray(logits), axis=-1)[:b]
            y_pred.extend(preds.tolist())
            y_true.extend(labels[:b].tolist())
        self._last_icbhi = calculate_icbhi_score(np.array(y_true), np.array(y_pred))
        return {
            "ICBHI/score": self._last_icbhi["icbhi_score"],
            "ICBHI/sensitivity": self._last_icbhi["avg_sensitivity"],
            "ICBHI/specificity": self._last_icbhi["avg_specificity"],
        }

    def _selection_metric(self, val_loss: float, extra: dict) -> float:
        return extra["ICBHI/score"]

    def _is_improvement(self, metric: float) -> bool:
        return metric > self.best_icbhi_score

    def _record_best(self, metric: float) -> None:
        self.best_icbhi_score = metric

    def _best_description(self) -> str:
        return f"ICBHI score: {self.best_icbhi_score:.4f}"

    def _extend_history(self, extra: dict) -> None:
        self.history["icbhi_score"].append(extra["ICBHI/score"])
        self.history["sensitivity"].append(extra["ICBHI/sensitivity"])
        self.history["specificity"].append(extra["ICBHI/specificity"])

    def _checkpoint_payload(self, epoch: int, val_loss: float, extra: dict) -> dict:
        payload = super()._checkpoint_payload(epoch, val_loss, extra)
        if extra:
            payload["icbhi_score"] = float(extra["ICBHI/score"])
            payload["icbhi_metrics"] = {
                "avg_sensitivity": float(extra["ICBHI/sensitivity"]),
                "avg_specificity": float(extra["ICBHI/specificity"]),
            }
        return payload
