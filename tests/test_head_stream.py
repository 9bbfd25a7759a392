"""Streamed head (models.head) vs the dense head.

Contract (models/head.py docstring): EVAL bitwise identical, TRAIN equal
up to BN-statistic f32 reassociation, gradients equal to float
tolerance, all three head forms (global_pool + factorized, global_pool
concat, --no_global_pool), masks and padding included.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgcnn_tpu.models.dgcnn as dgcnn_mod
from dgcnn_tpu.models import ModelSpec, get_model


def _spec(hf: bool, gp: bool, dropout: float = 0.0):
    return ModelSpec(
        num_class=3,
        k=4,
        edge_filters=(8, 8),
        head_feat_dim=32,
        head_mlp=(16, 8),
        global_pool=gp,
        head_factorized=hf,
        dropout=dropout,
    )


def _fixture(seed=0, b=2, n=96):
    rng = np.random.RandomState(seed)
    pts = jnp.asarray(rng.randn(b, n, 4).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, n) > 0.25)
    return pts, mask


@pytest.mark.parametrize(
    "hf,gp", [(False, True), (True, True), (False, False)]
)
@pytest.mark.parametrize("use_mask", [True, False])
def test_streamed_eval_bitwise(monkeypatch, hf, gp, use_mask):
    spec = _spec(hf, gp)
    model = get_model("residual-dgcnn", spec)
    params, state = model.init(jax.random.PRNGKey(1), 4)
    pts, mask = _fixture()
    m = mask if use_mask else None
    y_dense, _ = model.apply(params, state, pts, m, train=False)
    monkeypatch.setattr(dgcnn_mod, "HEAD_STREAM_ELEMS", 1)
    y_stream, st = model.apply(params, state, pts, m, train=False)
    np.testing.assert_array_equal(np.asarray(y_dense), np.asarray(y_stream))
    # eval must not touch BN state
    for a, b_ in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(st)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


@pytest.mark.parametrize(
    "hf,gp", [(False, True), (True, True), (False, False)]
)
def test_streamed_train_matches_dense(monkeypatch, hf, gp):
    spec = _spec(hf, gp)
    model = get_model("residual-dgcnn", spec)
    params, state = model.init(jax.random.PRNGKey(2), 4)
    pts, mask = _fixture(seed=3)

    def loss_fn(p):
        logits, st = model.apply(p, state, pts, mask, train=True)
        return jnp.mean(jnp.square(logits)), st

    (l_d, st_d), g_d = jax.value_and_grad(loss_fn, has_aux=True)(params)
    monkeypatch.setattr(dgcnn_mod, "HEAD_STREAM_ELEMS", 1)
    (l_s, st_s), g_s = jax.value_and_grad(loss_fn, has_aux=True)(params)
    np.testing.assert_allclose(float(l_d), float(l_s), rtol=1e-6)
    for a, b_ in zip(
        jax.tree_util.tree_leaves(st_d), jax.tree_util.tree_leaves(st_s)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-6
        )
    for a, b_ in zip(
        jax.tree_util.tree_leaves(g_d), jax.tree_util.tree_leaves(g_s)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-6
        )


def test_streamed_padding_inert(monkeypatch):
    """Garbage in padded rows must not change valid logits (the repo-wide
    padding invariant) — with the streamed head engaged."""
    monkeypatch.setattr(dgcnn_mod, "HEAD_STREAM_ELEMS", 1)
    spec = _spec(True, True)
    model = get_model("residual-dgcnn", spec)
    params, state = model.init(jax.random.PRNGKey(4), 4)
    pts, mask = _fixture(seed=5)
    y1, _ = model.apply(params, state, pts, mask, train=False)
    garbage = jnp.where(
        mask[..., None], pts, 1e6 * jnp.sign(pts) + 123.0
    )
    y2, _ = model.apply(params, state, garbage, mask, train=False)
    np.testing.assert_array_equal(
        np.asarray(y1)[np.asarray(mask)], np.asarray(y2)[np.asarray(mask)]
    )


def test_streamed_dropout_deterministic(monkeypatch):
    monkeypatch.setattr(dgcnn_mod, "HEAD_STREAM_ELEMS", 1)
    spec = _spec(True, True, dropout=0.5)
    model = get_model("residual-dgcnn", spec)
    params, state = model.init(jax.random.PRNGKey(6), 4)
    pts, mask = _fixture(seed=7)
    key = jax.random.PRNGKey(11)
    y1, _ = model.apply(params, state, pts, mask, train=True, rng=key)
    y2, _ = model.apply(params, state, pts, mask, train=True, rng=key)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    y3, _ = model.apply(
        params, state, pts, mask, train=True, rng=jax.random.PRNGKey(12)
    )
    assert not np.array_equal(np.asarray(y1), np.asarray(y3))


def test_streamed_train_step_under_shard_map(monkeypatch):
    """Trainval's shard_map train step with the streamed head: the scan
    carries must hold the mesh axes' varying type (the vz trick in
    models.head) — this is the exact configuration that tripped vma
    checking at 2M on hardware. Also pins DP2 == DP1 with streaming."""
    from dgcnn_tpu.config import Config
    from dgcnn_tpu.io import BucketBatcher, SyntheticIO
    from dgcnn_tpu.parallel.mesh import make_mesh
    from dgcnn_tpu.train import Trainval

    monkeypatch.setattr(dgcnn_mod, "HEAD_STREAM_ELEMS", 1)
    n, b = 64, 2
    kw = dict(
        model_name="residual-dgcnn", num_class=2, kvalue=4,
        edge_filters=(8, 8), minibatch_size=b, num_point=n,
        use_pallas=False, head_factorized=True, remat=True,
    )
    io = SyntheticIO(num_events=b, num_point=n, seed=0).initialize()
    batch = next(BucketBatcher(io, b, num_point=n, shuffle=False).epoch())

    losses = {}
    for nd in (1, 2):
        tv = Trainval(
            Config(**kw, num_devices=nd), mesh=make_mesh(nd)
        )
        s = tv.initialize(4)
        for _ in range(3):
            s, m = tv.train_step(s, batch)
        losses[nd] = float(m["loss"])
        assert np.isfinite(losses[nd])
    # DP sharding reorders the psum'd BN partial sums (device-count
    # float tolerance, as in test_trainval's DP8==DP1)
    np.testing.assert_allclose(losses[1], losses[2], rtol=2e-4)


def test_streamed_head_under_cp(monkeypatch):
    """Banded CP with the streamed head: eval logits at valid rows must
    stay bitwise the single-device banded model's (the banded-CP
    contract), with the head streamed on BOTH sides."""
    import dgcnn_tpu.models.head as head_mod
    from dgcnn_tpu.config import Config
    from dgcnn_tpu.io import BucketBatcher, SyntheticIO
    from dgcnn_tpu.parallel.mesh import make_mesh
    from dgcnn_tpu.train import Trainval

    monkeypatch.setattr(dgcnn_mod, "HEAD_STREAM_ELEMS", 1)
    n, b = 128, 2
    kw = dict(
        model_name="residual-dgcnn", num_class=2, kvalue=4,
        edge_filters=(8, 8), minibatch_size=b, num_point=n,
        use_pallas=False, knn_window=32, head_factorized=True,
    )
    io = SyntheticIO(num_events=b, num_point=n, seed=0).initialize()
    batch = next(BucketBatcher(io, b, num_point=n, shuffle=False).epoch())

    tv1 = Trainval(Config(**kw), mesh=make_mesh(1))
    s1 = tv1.initialize(4)
    sc_1, pr_1, _ = tv1.inference(s1, batch)

    tv4 = Trainval(
        Config(**kw, point_shards=4), mesh=make_mesh(4, num_point_shards=4)
    )
    s4 = tv4.initialize(4)
    sc_4, pr_4, _ = tv4.inference(s4, batch)
    valid = np.asarray(batch.mask, bool)
    np.testing.assert_array_equal(
        np.asarray(sc_1)[valid], np.asarray(sc_4)[valid]
    )
    np.testing.assert_array_equal(
        np.asarray(pr_1)[valid], np.asarray(pr_4)[valid]
    )
