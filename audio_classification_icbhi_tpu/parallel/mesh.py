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


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
