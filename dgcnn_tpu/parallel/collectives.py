"""Named-axis collective wrappers (the rebuild's `comm` layer).

Reference: cross-GPU traffic is implicit in the TF graph (device copies for
the gradient average) [H per SURVEY.md §2.3]. Here every cross-device
exchange is an explicit XLA collective riding ICI inside `shard_map`; this
module pins the axis names so call sites never hard-code them.
"""

from __future__ import annotations

import jax

from dgcnn_tpu.parallel.mesh import DATA_AXIS, POINT_AXIS


def psum_data(x):
    return jax.lax.psum(x, DATA_AXIS)


def pmean_data(x):
    return jax.lax.pmean(x, DATA_AXIS)


def all_gather_points(x, axis: int = 0, tiled: bool = True):
    return jax.lax.all_gather(x, POINT_AXIS, axis=axis, tiled=tiled)


def ppermute_ring(x, shift: int = 1, axis_name: str = POINT_AXIS):
    """Rotate shards around the ring (ring-kNN building block)."""
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + shift) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis_name, perm)


def axis_index(axis_name: str = DATA_AXIS):
    return jax.lax.axis_index(axis_name)
