"""On-device DSP ops: STFT, mel filterbanks, dB scaling, augmentation, resampling."""

from audio_classification_icbhi_tpu.ops.stft import (  # noqa: F401
    frame_signal,
    hann_window,
    num_frames,
    reflect_pad,
    spectrogram,
    stft_power,
)
from audio_classification_icbhi_tpu.ops.mel import (  # noqa: F401
    MelFrontend,
    amplitude_to_db,
    hz_to_mel,
    log_mel_spectrogram,
    mel_filterbank,
    mel_to_hz,
    power_to_db,
)
from audio_classification_icbhi_tpu.ops.augment import (  # noqa: F401
    add_noise,
    augment_spectrogram,
    augment_waveform,
    freq_mask,
    spec_mask_bounds,
    time_mask,
    time_shift,
)
from audio_classification_icbhi_tpu.ops.resample import resample  # noqa: F401
from audio_classification_icbhi_tpu.ops.time_stretch import (  # noqa: F401
    TimeStretch,
    phase_vocoder,
    stft_complex,
)
from audio_classification_icbhi_tpu.ops.pallas_conv import (  # noqa: F401
    fused_conv_block1,
    fused_conv_block2,
    fused_conv_block3,
)
