"""RDMA ring-kNN kernel: bit-exact global top-k on a CPU mesh.

`kernels.ring_knn_rdma` owns the whole ring in one Pallas kernel
(inter-chip RDMA + token flow control). These tests run it under the
Pallas interpreter on the 8-virtual-CPU mesh and pin:
  * bit-exact neighbor indices vs a single-device global `lax.top_k`
    oracle (including masks and exact-duplicate ties, whose order the
    kernel must resolve lexicographically since ring blocks arrive out
    of global-index order),
  * agreement with the ppermute ring (`kernels.ring_knn`),
  * the <k-valid degradation contract (invalid slots → global self),
  * the Trainval fail-fast guard (rdma needs a TPU: the interpreter
    cannot emulate remote DMA on the joint (data, points) mesh).
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


def _mesh(d):
    return Mesh(np.array(jax.devices())[:d].reshape(d), ("points",))


def _run_rdma(x, mask, k, d):
    f = shard_map(
        lambda xs, ms: ring_knn_rdma(xs, k, ms, axis_name="points"),
        mesh=_mesh(d),
        in_specs=(P(None, "points"), P(None, "points")),
        out_specs=(P(None, "points"), P(None, "points")),
        check_vma=False,  # interpreted remote copies can't be vma-checked
    )
    return jax.jit(f)(x, mask)


def _oracle(x, mask, k):
    """Global top-k with the kernel's score expression and tie order."""
    xj = jnp.asarray(x)
    n = x.shape[1]
    scores = jnp.sum(jnp.square(xj), axis=-1)[..., :, None] - pairwise_sq_dists(
        xj, precision=jax.lax.Precision.HIGHEST
    )
    scores = jnp.where(jnp.asarray(mask)[:, None, :], scores, -1e30)
    ov, oi = jax.lax.top_k(scores, k)
    valid = ov > -1e29
    self_i = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :, None], oi.shape)
    return jnp.where(valid, oi, self_i).astype(jnp.int32), valid


def _event(b, n, c=3, seed=0, dup=True, masked=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(b, n, c)).astype(np.float32)
    if dup:  # exact duplicates across different shards → cross-block ties
        x[:, n // 2] = x[:, 1]
        x[:, n - 3] = x[:, 1]
    mask = np.ones((b, n), bool)
    if masked:
        mask[:, -masked:] = False
    return x, mask


@pytest.mark.parametrize("d", [2, 4, 8])
def test_rdma_matches_global_oracle(d):
    b, n, k = 2, 256, 12
    x, mask = _event(b, n, seed=d, masked=17)
    idx, valid = _run_rdma(x, mask, k, d)
    oi, ov = _oracle(x, mask, k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(oi))
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ov))


def test_rdma_matches_ppermute_ring():
    d, b, n, k = 4, 1, 256, 8
    x, mask = _event(b, n, seed=11, masked=5)
    idx_r, valid_r = _run_rdma(x, mask, k, d)
    f = shard_map(
        lambda xs, ms: ring_knn(xs, k, ms, axis_name="points"),
        mesh=_mesh(d),
        in_specs=(P(None, "points"), P(None, "points")),
        out_specs=(P(None, "points"), P(None, "points")),
    )
    idx_p, valid_p = jax.jit(f)(x, mask)
    np.testing.assert_array_equal(np.asarray(idx_r), np.asarray(idx_p))
    np.testing.assert_array_equal(np.asarray(valid_r), np.asarray(valid_p))


def test_rdma_k_equals_shard_size():
    d, b, n = 2, 1, 256
    k = n // d  # k == N_local, the largest legal k
    x, mask = _event(b, n, seed=5, dup=False)
    idx, valid = _run_rdma(x, mask, k, d)
    oi, ov = _oracle(x, mask, k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(oi))
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ov))


def test_rdma_fewer_than_k_valid_degrades_to_self():
    d, b, n, k = 4, 1, 256, 16
    x, mask = _event(b, n, seed=7, dup=False)
    mask[:] = False
    mask[:, :5] = True  # 5 valid points globally, k=16
    idx, valid = _run_rdma(x, mask, k, d)
    oi, ov = _oracle(x, mask, k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(oi))
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ov))
    assert int(np.asarray(valid).sum(axis=-1).max()) == 5


def test_rdma_trainval_guard_on_cpu():
    """--ring_impl rdma inside Trainval needs a TPU: the interpreter
    cannot emulate remote DMA on the joint (data, points) mesh, so the
    trainer must fail fast with an actionable message, not a cryptic
    interpreter error three layers down."""
    from dgcnn_tpu.config import Config
    from dgcnn_tpu.parallel.mesh import make_mesh
    from dgcnn_tpu.train import Trainval

    cfg = Config(
        num_class=2,
        kvalue=8,
        edge_filters=(16,),
        use_pallas=False,
        minibatch_size=1,
        point_shards=2,
        ring_impl="rdma",
    )
    with pytest.raises(ValueError, match="ring_impl rdma requires a TPU"):
        Trainval(cfg, mesh=make_mesh(2, num_point_shards=2))


def test_rdma_graph_ops_selectable():
    """cp_graph_ops(impl=...) wires the RDMA kernel; bad impl rejected."""
    from dgcnn_tpu.parallel.context_parallel import cp_graph_ops

    ops = cp_graph_ops("points", impl="rdma")
    d, b, n, k = 2, 1, 256, 8
    x, mask = _event(b, n, seed=3)
    f = shard_map(
        lambda xs, ms: ops.knn(xs, k, ms),
        mesh=_mesh(d),
        in_specs=(P(None, "points"), P(None, "points")),
        out_specs=(P(None, "points"), P(None, "points")),
        check_vma=False,
    )
    idx, valid = jax.jit(f)(x, mask)
    oi, ov = _oracle(x, mask, k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(oi))
    # the two impls must score with the SAME precision by default, so
    # switching --ring_impl can never change the neighbor graph
    ops_p = cp_graph_ops("points", impl="ppermute")
    fp = shard_map(
        lambda xs, ms: ops_p.knn(xs, k, ms),
        mesh=_mesh(d),
        in_specs=(P(None, "points"), P(None, "points")),
        out_specs=(P(None, "points"), P(None, "points")),
    )
    idx_p, _ = jax.jit(fp)(x, mask)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_p))
    with pytest.raises(ValueError, match="unknown ring impl"):
        cp_graph_ops("points", impl="bogus")
