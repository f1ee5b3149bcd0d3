"""Device mesh construction and batch sharding helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(num_devices: int | None = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over local devices. On a pod slice this is the ICI ring; in
    tests it's the 8-device virtual CPU mesh."""
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(f"requested {num_devices} devices, have {len(devices)}")
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def shard_batch(mesh: Mesh, *arrays, axis_name: str = DATA_AXIS):
    """Place host arrays on the mesh, sharded along their leading axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) > 1 else out[0]


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    *,
    auto: bool = False,
) -> int:
    """Multi-host initialization (SPMD over DCN across hosts + ICI within).

    On a TPU pod slice, call once per host before get_mesh(). Three modes:
    - auto=True, no arguments: jax.distributed.initialize() autodetects the
      TPU pod environment (coordinator, process count, process id).
    - explicit coordinator_address/num_processes/process_id: manual
      bring-up (also how tests start a 1-process coordinator).
    - neither: single-process no-op; returns this process's index.
    The reference has no distributed backend at all (SURVEY.md §2.3); this
    is the TPU-native replacement for what NCCL/MPI init would have been.
    """
    if coordinator_address is None and num_processes in (None, 1) and not auto:
        try:
            return jax.process_index()
        except Exception:
            return 0
    if coordinator_address is None and num_processes is None:
        jax.distributed.initialize()  # pod-slice autodetection
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index()


def local_batch_slice(global_batch: int, axis_name: str = DATA_AXIS) -> slice:
    """This host's slice of a globally-sharded batch (per-host input
    sharding: each host feeds only its local devices' rows)."""
    n_proc = jax.process_count()
    if global_batch % n_proc:
        raise ValueError(
            f"global batch {global_batch} not divisible by process count "
            f"{n_proc}: rows would be silently dropped"
        )
    per_host = global_batch // n_proc
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate_multihost(mesh: Mesh, tree):
    """Replicate host values across a (possibly multi-process) global mesh.

    device_put cannot place onto devices this process does not address;
    make_array_from_process_local_data can (every process supplies the same
    full value). Single-process meshes take the plain device_put path."""
    sharding = NamedSharding(mesh, P())

    def place(x):
        arr = np.asarray(x)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, arr)
        return jax.device_put(arr, sharding)

    return jax.tree_util.tree_map(place, tree)


def shard_eval_batch_multihost(mesh: Mesh, wavs, labels, mask,
                               axis_name: str = DATA_AXIS):
    """(B, ...) eval batch -> global arrays batch-sharded over the mesh,
    each process contributing its local_batch_slice rows. No-op under one
    process (the jit reshards host arrays itself)."""
    if jax.process_count() == 1:
        return wavs, labels, mask
    sl = local_batch_slice(np.asarray(wavs).shape[0], axis_name)
    sh = NamedSharding(mesh, P(axis_name))

    def place(x):
        return jax.make_array_from_process_local_data(sh, np.asarray(x)[sl])

    return place(wavs), place(labels), place(mask)
