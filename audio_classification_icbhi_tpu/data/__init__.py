"""Host-side data pipeline: WAV I/O, dataset indexing, batch loading, ETL.

Design split (SURVEY.md §7): the host only decodes bytes -> PCM, resamples,
pads/crops to fixed shapes, and ships f32 batches; all DSP and augmentation
run on-device inside the jitted step.
"""

from audio_classification_icbhi_tpu.data.wavio import (  # noqa: F401
    load_audio,
    read_wav,
    write_wav,
)
from audio_classification_icbhi_tpu.data.annotations import (  # noqa: F401
    CLASS_MAP,
    CLASS_NAMES,
    label_from_flags,
    parse_annotation_file,
    recording_label,
)
from audio_classification_icbhi_tpu.data.dataset import ICBHIDataset  # noqa: F401
from audio_classification_icbhi_tpu.data.dataset_segmented import (  # noqa: F401
    ICBHISegmentedDataset,
)
from audio_classification_icbhi_tpu.data.loader import BatchLoader  # noqa: F401
from audio_classification_icbhi_tpu.data.segmenter import ICBHISegmenter  # noqa: F401
from audio_classification_icbhi_tpu.data.synthetic import (  # noqa: F401
    generate_icbhi_corpus_fixture,
    generate_icbhi_dataset,
    generate_segmented_dataset,
    synth_respiratory_cycle,
)
