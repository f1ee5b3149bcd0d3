"""Training stack: optimizers, LR schedules, trainers, validation."""

from audio_classification_icbhi_tpu.training.schedules import (  # noqa: F401
    CosineAnnealingLR,
    ReduceLROnPlateau,
    StepLR,
    build_scheduler,
)
from audio_classification_icbhi_tpu.training.optimizers import build_optimizer  # noqa: F401
from audio_classification_icbhi_tpu.training.trainer import Trainer  # noqa: F401
from audio_classification_icbhi_tpu.training.trainer_legacy import (  # noqa: F401
    LegacyTrainer,
)
from audio_classification_icbhi_tpu.training.trainer_icbhi import (  # noqa: F401
    TrainerWithICBHI,
)
from audio_classification_icbhi_tpu.training.validation import Validator  # noqa: F401
