"""audio_classification_icbhi_tpu — TPU-native ICBHI respiratory-sound framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
AkZuza/audio-classification-icbhi (reference mounted at /root/reference):

- On-device DSP front end (STFT -> mel -> dB) expressed as MXU-friendly
  matmuls, replacing torchaudio's CPU kernels
  (reference: src/data/preprocessing.py).
- LightweightCNN / CompactResNet18 classifiers in flax
  (reference: src/models/cnn.py, src/models/resnet.py).
- jit + shard_map data-parallel training with class-weighted CE,
  gradient accumulation via lax.scan, global-norm clipping, bf16 policy
  (reference: src/training/trainer_fixed.py, trainer_icbhi.py).
- ICBHI-2017 scoring and reporting (reference: src/utils/icbhi_metrics.py).
- A single jitted sliding-window streaming engine behind the analyzer
  family (reference: realtime_analyzer*.py).
"""

__version__ = "0.1.0"

from audio_classification_icbhi_tpu.utils.config import (  # noqa: F401
    load_config,
    set_seed,
)
