"""SPMD parallelism: device mesh, sharded train/eval steps, collectives.

The reference is single-GPU with no distributed backend (SURVEY.md §2.3);
here data parallelism is a first-class component: a 1-D jax.sharding.Mesh,
shard_map'd steps with psum gradient/metric reduction over ICI, and
cross-replica BatchNorm via the models' axis_name.
"""

from audio_classification_icbhi_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    get_mesh,
    shard_batch,
)
from audio_classification_icbhi_tpu.parallel.data_parallel import (  # noqa: F401
    TrainStepFns,
    make_step_fns,
    weighted_cross_entropy,
)
