"""Device mesh construction and axis naming.

The reference parallelizes by building one model replica per GPU inside a
single TF graph and averaging tower gradients [H per SURVEY.md §2.2]. The
rebuild's equivalent substrate is a `jax.sharding.Mesh` with named axes:

  * ``data``   — data parallelism (batch axis). Gradients are `psum`-mean
                 reduced over ICI (the NCCL-allreduce analog).
  * ``points`` — sequence/context parallelism over the point axis for
                 100k+-point events (ring kNN; BASELINE config 5).

All mesh/axis names live here so every collective in the framework agrees
(SURVEY.md §2.3: "a thin comm module wraps these").
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
POINT_AXIS = "points"


def make_mesh(num_devices: int = 0, num_point_shards: int = 1, devices=None) -> Mesh:
    """A (data, points) mesh over the local devices.

    Args:
      num_devices: total devices to use (0 = all local).
      num_point_shards: size of the ``points`` axis (1 = pure DP).
    """
    devices = list(devices if devices is not None else jax.devices())
    if num_devices:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, only {len(devices)} present"
            )
        devices = devices[:num_devices]
    n = len(devices)
    if n % num_point_shards:
        raise ValueError(f"{n} devices not divisible by {num_point_shards=}")
    arr = np.array(devices).reshape(n // num_point_shards, num_point_shards)
    return Mesh(arr, (DATA_AXIS, POINT_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding for host→device batch transfer."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
