"""Model zoo: LightweightCNN and CompactResNet18 in flax.linen."""

from audio_classification_icbhi_tpu.models.cnn import (  # noqa: F401
    ConvBlock,
    LightweightCNN,
    count_parameters,
)
from audio_classification_icbhi_tpu.models.resnet import CompactResNet  # noqa: F401
from audio_classification_icbhi_tpu.models.registry import (  # noqa: F401
    build_model,
    register_model,
)
from audio_classification_icbhi_tpu.models.fused_infer import (  # noqa: F401
    fused_apply_supported,
    fused_cnn_enabled,
    fused_kernels_available,
    make_fused_apply,
)
