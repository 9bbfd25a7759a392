"""Trainer: DP replica equality, loss descent, checkpoint round-trip."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from dgcnn_tpu.config import Config
from dgcnn_tpu.io import BucketBatcher, SyntheticIO
from dgcnn_tpu.parallel.mesh import make_mesh
from dgcnn_tpu.train import Trainval
from dgcnn_tpu.train import checkpoint as ckpt

SMALL = dict(
    num_class=2,
    kvalue=8,
    edge_filters=(16, 16),
    head_feat_dim=32,
    head_mlp=(32,),
    use_pallas=False,
    precision="highest",
    learning_rate=1e-2,
)


def _batches(n_batches, batch_size, num_point=256, seed=0):
    io = SyntheticIO(
        num_events=n_batches * batch_size, num_point=num_point, seed=seed
    ).initialize()
    b = BucketBatcher(io, batch_size, num_point=num_point, shuffle=False)
    out = list(b.epoch())
    return out[:n_batches]


@pytest.mark.parametrize("block_impl", ["edge", "fused"])
def test_dp8_matches_dp1(block_impl):
    """Gradient psum over 8 shards must reproduce the single-device run.

    Uses SGD: Adam's first-step update is ±lr even for ulp-sized gradient
    components, which amplifies float reassociation noise into visible
    (but benign) divergence; SGD keeps the comparison at float tolerance.
    Parametrized over the custom-VJP block too: its backward psums T1/T2
    itself and must return LOCAL param-grad contributions for shard_map's
    AD to psum — double-psum bugs show up here.
    """
    cfg = Config(
        minibatch_size=8, optimizer="sgd", block_impl=block_impl, **SMALL
    )
    tv8 = Trainval(cfg, mesh=make_mesh(8))
    tv1 = Trainval(cfg, mesh=make_mesh(1))
    batches = _batches(3, 8)

    s8 = tv8.initialize(4)
    s1 = tv1.initialize(4)
    for batch in batches:
        s8, m8 = tv8.train_step(s8, batch)
        s1, m1 = tv1.train_step(s1, batch)
        np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s8.params), jax.tree_util.tree_leaves(s1.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s8.model_state),
        jax.tree_util.tree_leaves(s1.model_state),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_loss_decreases_and_inference_consistent():
    cfg = Config(minibatch_size=8, **SMALL)
    tv = Trainval(cfg, mesh=make_mesh(8))
    state = tv.initialize(4)
    batches = _batches(1, 8, seed=3) * 30
    losses = []
    for batch in batches:
        state, m = tv.train_step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[::10]

    scores, pred, metrics = tv.inference(state, batches[0])
    scores = np.asarray(scores)
    assert scores.shape[-1] == 2
    np.testing.assert_allclose(scores.sum(-1), 1.0, atol=1e-5)
    cm = np.asarray(metrics["confusion"])
    assert cm.sum() == batches[0].mask.sum()
    np.testing.assert_array_equal(
        np.asarray(pred), np.argmax(scores, -1)
    )


def test_checkpoint_roundtrip(tmp_path):
    cfg = Config(minibatch_size=8, weight_prefix=str(tmp_path / "w/snap"), **SMALL)
    tv = Trainval(cfg, mesh=make_mesh(8))
    state = tv.initialize(4)
    (batch,) = _batches(1, 8)
    for _ in range(3):
        state, _ = tv.train_step(state, batch)
    path = ckpt.save(cfg.weight_prefix, 3, state, dataclasses.asdict(cfg))
    assert os.path.exists(path)
    assert ckpt.latest(cfg.weight_prefix) == path

    fresh = tv.initialize(4)
    restored, step, cfg_dict = ckpt.restore(cfg.weight_prefix, fresh)
    assert step == 3 and cfg_dict["kvalue"] == 8
    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    # resumed training must continue identically to uninterrupted training
    s_cont, m_cont = tv.train_step(state, batch)
    s_res, m_res = tv.train_step(restored, batch)
    np.testing.assert_allclose(float(m_cont["loss"]), float(m_res["loss"]), rtol=1e-6)


def test_batch_not_divisible_raises():
    cfg = Config(minibatch_size=3, **SMALL)
    with pytest.raises(ValueError, match="not divisible"):
        Trainval(cfg, mesh=make_mesh(8))


def test_grad_clip_bounds_update_norm():
    """--grad_clip must bound the parameter update: with SGD the update
    norm equals lr * clipped-grad norm, so a tiny clip threshold makes
    the update tiny regardless of the (huge) raw gradient."""
    import dataclasses

    base = Config(
        num_class=2, kvalue=6, edge_filters=(8,), head_feat_dim=16,
        head_mlp=(16,), minibatch_size=1, num_point=96, use_pallas=False,
        optimizer="sgd", learning_rate=1.0, num_devices=1,
    )
    io = SyntheticIO(num_events=1, num_point=96, seed=0).initialize()
    batch = next(BucketBatcher(io, 1, num_point=96, shuffle=False).epoch())
    # scale the points to force large gradients
    big = batch.__class__(
        points=batch.points * 100.0, labels=batch.labels,
        weights=batch.weights, mask=batch.mask,
        event_ids=batch.event_ids, lengths=batch.lengths,
    )

    def update_norm(cfg):
        tv = Trainval(cfg, mesh=make_mesh(1))
        s0 = tv.initialize(4)
        # train_step donates its inputs — snapshot params first
        before = [np.asarray(a) for a in jax.tree_util.tree_leaves(s0.params)]
        s1, _ = tv.train_step(s0, big)
        sq = 0.0
        for a, b in zip(before, jax.tree_util.tree_leaves(s1.params)):
            sq += float(np.sum((a - np.asarray(b)) ** 2))
        return sq ** 0.5

    clipped = update_norm(dataclasses.replace(base, grad_clip=1e-3))
    free = update_norm(base)
    assert clipped <= 1e-3 * 1.01, clipped  # = lr * clip threshold
    assert free > 10 * clipped, (free, clipped)
