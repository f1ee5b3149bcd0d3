"""Legacy trainer variant.

Capability match for reference src/training/trainer.py:12-302 (the module
src/training/__init__.py:3 actually exports): the ORIGINAL training loop
without class weighting and without gradient clipping — uniform CE loss and
unclipped updates — kept because the reference keeps both trainers and some
workflows depend on the unweighted behavior. Everything else (schedules,
checkpoints, early stopping, TB tags) matches the default Trainer.
"""

from __future__ import annotations

import numpy as np

from audio_classification_icbhi_tpu.training.trainer import Trainer


class LegacyTrainer(Trainer):
    # _calculate_class_weights (below) makes self.class_weights uniform ==
    # plain CrossEntropyLoss (reference trainer.py builds no weights), and
    # _max_grad_norm feeds inf into the base __init__'s single step build
    # (the legacy loop never clips) — precision/loss-scale modes inherit
    # unchanged.

    def _max_grad_norm(self) -> float:
        return float("inf")

    def _calculate_class_weights(self) -> np.ndarray:
        num_classes = self.config["model"]["num_classes"]
        return np.ones(num_classes, np.float32)
