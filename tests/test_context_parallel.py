"""Context-parallel training: point-sharded steps match single-device runs."""

import jax
import numpy as np
import pytest

from dgcnn_tpu.config import Config
from dgcnn_tpu.io import BucketBatcher, SyntheticIO
from dgcnn_tpu.parallel.mesh import make_mesh
from dgcnn_tpu.train import Trainval

SMALL = dict(
    num_class=2,
    kvalue=8,
    edge_filters=(16, 16),
    head_feat_dim=32,
    head_mlp=(32,),
    use_pallas=False,
    precision="highest",
    learning_rate=1e-2,
    optimizer="sgd",
)


def _batch(batch_size, num_point=256, seed=0):
    io = SyntheticIO(num_events=batch_size, num_point=num_point, seed=seed).initialize()
    return next(BucketBatcher(io, batch_size, num_point=num_point, shuffle=False).epoch())


@pytest.mark.parametrize(
    "data,points,knn_every", [(1, 8, 1), (2, 4, 1), (2, 4, 2)]
)
def test_cp_train_matches_single_device(data, points, knn_every):
    """(data × points) sharded training == unsharded training — including
    graph reuse (knn_every>1), whose shared indices must flow through the
    ring gather identically on both paths."""
    cfg_cp = Config(
        minibatch_size=data, point_shards=points, knn_every=knn_every,
        **SMALL,
    )
    cfg_1 = Config(minibatch_size=data, knn_every=knn_every, **SMALL)
    tv_cp = Trainval(cfg_cp, mesh=make_mesh(data * points, num_point_shards=points))
    tv_1 = Trainval(cfg_1, mesh=make_mesh(1))
    batch = _batch(data)

    s_cp = tv_cp.initialize(4)
    s_1 = tv_1.initialize(4)
    for _ in range(3):
        s_cp, m_cp = tv_cp.train_step(s_cp, batch)
        s_1, m_1 = tv_1.train_step(s_1, batch)
        np.testing.assert_allclose(
            float(m_cp["loss"]), float(m_1["loss"]), rtol=1e-4
        )
        np.testing.assert_allclose(float(m_cp["acc"]), float(m_1["acc"]), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_cp.params), jax.tree_util.tree_leaves(s_1.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_cp_inference_matches_single_device():
    cfg_cp = Config(minibatch_size=2, point_shards=4, **SMALL)
    cfg_1 = Config(minibatch_size=2, **SMALL)
    tv_cp = Trainval(cfg_cp, mesh=make_mesh(8, num_point_shards=4))
    tv_1 = Trainval(cfg_1, mesh=make_mesh(1))
    batch = _batch(2, seed=3)
    state = tv_1.initialize(4)
    # run a couple of steps on the single-device trainer, reuse the weights
    for _ in range(2):
        state, _ = tv_1.train_step(state, batch)

    state_cp = jax.device_put(state, tv_cp._repl_sharding)
    sc_cp, pr_cp, me_cp = tv_cp.inference(state_cp, batch)
    sc_1, pr_1, me_1 = tv_1.inference(state, batch)
    np.testing.assert_allclose(np.asarray(sc_cp), np.asarray(sc_1), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(pr_cp), np.asarray(pr_1))
    np.testing.assert_allclose(
        np.asarray(me_cp["confusion"]), np.asarray(me_1["confusion"]), atol=0
    )


def test_cp_fused_matches_edge_impl():
    """The exact ring's gather decomposes into one tiled all_gather +
    local gather, so auto resolves to the fused O(rows·C)-backward impl
    there too. block_impl must stay non-model-defining: fused (auto) vs
    edge train to float tolerance, and eval scores of one state are
    BITWISE equal across impls (valid rows)."""
    mesh = make_mesh(8, num_point_shards=4)
    cfg_f = Config(minibatch_size=2, point_shards=4, **SMALL)
    cfg_e = Config(
        minibatch_size=2, point_shards=4, block_impl="edge", **SMALL
    )
    tv_f = Trainval(cfg_f, mesh=mesh)
    tv_e = Trainval(cfg_e, mesh=mesh)
    assert tv_f.model.block_impl == "fused"
    assert tv_e.model.block_impl == "edge"

    # padded batch: ragged events in a 256 bucket
    io = SyntheticIO(num_events=2, num_point=200, seed=11).initialize()
    batch = next(BucketBatcher(io, 2, buckets=(256,), shuffle=False).epoch())
    assert batch.mask.sum() < batch.mask.size

    s_f = tv_f.initialize(4)
    s_e = tv_e.initialize(4)
    for _ in range(3):
        s_f, m_f = tv_f.train_step(s_f, batch)
        s_e, m_e = tv_e.train_step(s_e, batch)
        np.testing.assert_allclose(
            float(m_f["loss"]), float(m_e["loss"]), rtol=1e-4
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_f.params), jax.tree_util.tree_leaves(s_e.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)

    sc_f, pr_f, _ = tv_f.inference(s_f, batch)
    sc_e, pr_e, _ = tv_e.inference(jax.device_put(s_f, tv_e._repl_sharding), batch)
    m = np.asarray(batch.mask)
    np.testing.assert_array_equal(np.asarray(sc_f)[m], np.asarray(sc_e)[m])
    np.testing.assert_array_equal(np.asarray(pr_f)[m], np.asarray(pr_e)[m])


def test_cp_variable_length_masked():
    """Ragged events under CP: padding must stay inert across shards."""
    cfg = Config(minibatch_size=1, point_shards=8, **SMALL)
    tv = Trainval(cfg, mesh=make_mesh(8, num_point_shards=8))
    io = SyntheticIO(num_events=1, num_point=200, seed=5).initialize()
    batch = next(BucketBatcher(io, 1, buckets=(256,), shuffle=False).epoch())
    assert batch.mask.sum() < batch.mask.size  # genuinely padded
    state = tv.initialize(4)
    losses = []
    for _ in range(10):
        state, m = tv.train_step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
