"""Seeded fuzz: both ring-kNN implementations vs the global oracle.

Random shard counts, batch sizes, non-tile-aligned local sizes, k values,
masks (including fully-masked rows) and injected exact-duplicate points.
Every draw must reproduce the single-device global `lax.top_k` order
bit-exactly — the property the context-parallel graph build is built on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from dgcnn_tpu.kernels.ring_knn import ring_knn
from dgcnn_tpu.kernels.ring_knn_rdma import ring_knn_rdma
from dgcnn_tpu.ops.knn import pairwise_sq_dists


def _oracle(x, mask, k):
    xj = jnp.asarray(x)
    n = x.shape[1]
    scores = jnp.sum(jnp.square(xj), axis=-1)[..., :, None] - pairwise_sq_dists(
        xj, precision=jax.lax.Precision.HIGHEST
    )
    scores = jnp.where(jnp.asarray(mask)[:, None, :], scores, -jnp.inf)
    ov, oi = jax.lax.top_k(scores, k)
    valid = jnp.isfinite(ov)
    self_i = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[None, :, None], oi.shape
    )
    return jnp.where(valid, oi, self_i).astype(jnp.int32), valid


def _draw(rng):
    d = int(rng.choice([2, 4, 8]))
    b = int(rng.integers(1, 3))
    nl = int(rng.integers(24, 200))  # deliberately not lane-aligned
    c = int(rng.choice([2, 3, 5]))
    k = int(rng.integers(1, min(nl, 24) + 1))
    n = d * nl
    x = rng.normal(size=(b, n, c)).astype(np.float32)
    # exact duplicates across shards → cross-block ties
    for _ in range(rng.integers(0, 4)):
        i, j = rng.integers(0, n, size=2)
        x[:, i] = x[:, j]
    mask = rng.random((b, n)) > rng.choice([0.0, 0.1, 0.5])
    mask = mask.astype(bool)
    if rng.random() < 0.5:
        mask[0] = False  # a fully-masked event row, explicitly — random
        #                  per-point draws would essentially never hit it
    return d, b, k, x, mask


@pytest.mark.parametrize("impl", ["ppermute", "rdma"])
def test_ring_fuzz_matches_global_oracle(impl):
    rng = np.random.default_rng(20260816)
    for trial in range(4):
        d, b, k, x, mask = _draw(rng)
        mesh = Mesh(np.array(jax.devices())[:d].reshape(d), ("points",))
        if impl == "rdma":
            fn = lambda xs, ms: ring_knn_rdma(xs, k, ms, axis_name="points")
        else:
            fn = lambda xs, ms: ring_knn(xs, k, ms, axis_name="points")
        f = shard_map(
            fn,
            mesh=mesh,
            in_specs=(P(None, "points"), P(None, "points")),
            out_specs=(P(None, "points"), P(None, "points")),
            check_vma=False,
        )
        idx, valid = jax.jit(f)(x, mask)
        oi, ov = _oracle(x, mask, k)
        ctx = f"{impl} trial={trial} d={d} b={b} k={k} n={x.shape[1]}"
        np.testing.assert_array_equal(
            np.asarray(valid), np.asarray(ov), err_msg=ctx
        )
        np.testing.assert_array_equal(
            np.asarray(idx), np.asarray(oi), err_msg=ctx
        )
