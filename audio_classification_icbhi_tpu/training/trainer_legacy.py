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

from audio_classification_icbhi_tpu.parallel.data_parallel import make_step_fns
from audio_classification_icbhi_tpu.training.trainer import Trainer


class LegacyTrainer(Trainer):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        # _calculate_class_weights (below) already made self.class_weights
        # uniform == plain CrossEntropyLoss (reference trainer.py builds no
        # weights); rebuild the steps without clipping, preserving the
        # precision mode (dropping dynamic_loss_scale crashed fp16 runs:
        # train_epoch's scaled branch fed 9 args to an 8-arg step).
        self.steps = make_step_fns(
            self.model, self.frontend, self.tx, self.mesh,
            accum_steps=self.accum_steps,
            augment=bool(self.config["data"].get("augmentation", False))
            and getattr(self.train_dataset, "augment", True),
            max_grad_norm=float("inf"),  # legacy loop never clips
            dynamic_loss_scale=self.dynamic_loss_scale,
        )

    def _calculate_class_weights(self) -> np.ndarray:
        num_classes = self.config["model"]["num_classes"]
        return np.ones(num_classes, np.float32)
