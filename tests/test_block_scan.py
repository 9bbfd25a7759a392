"""Scanned EdgeConv stack (``block_scan``) vs the unrolled loop.

Contract (models/dgcnn.py ModelSpec.block_scan): the scanned body runs
the exact same per-block ops as the unrolled Python loop — EVAL logits
bitwise identical, train BN state bitwise identical, gradients equal to
float tolerance (and bitwise under remat, where both forms recompute
from the same saved residuals). The knob exists for the allocator, not
the math: one lax.scan body means one set of backward while-body
buffers reused across blocks, which is what lets 2M-point f32 training
fit one chip (BASELINE.md 2M-train closure -> round-4 reopening).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.models import ModelSpec, get_model


def _spec(**kw):
    base = dict(
        num_class=3,
        k=6,
        edge_filters=(12, 12, 12, 12),
        head_feat_dim=32,
        head_mlp=(16, 8),
    )
    base.update(kw)
    return ModelSpec(**base)


def _pair(spec, model_name="residual-dgcnn", **mk_kw):
    m_u = get_model(
        model_name, dataclasses.replace(spec, block_scan="off"), **mk_kw
    )
    m_s = get_model(
        model_name, dataclasses.replace(spec, block_scan="on"), **mk_kw
    )
    return m_u, m_s


def _fixture(seed=0, b=2, n=96):
    rng = np.random.RandomState(seed)
    pts = jnp.asarray(rng.randn(b, n, 4).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, n) > 0.25)
    return pts, mask


@pytest.mark.parametrize("model_name", ["residual-dgcnn", "dgcnn"])
@pytest.mark.parametrize("knn_every", [1, 2, 3])
@pytest.mark.parametrize("use_mask", [True, False])
def test_scan_eval_bitwise(model_name, knn_every, use_mask):
    """Scanned eval logits == unrolled eval logits, bitwise, across the
    rebuild/reuse grouping space (knn_every exercises the all-rebuild,
    mixed-cond and no-rebuild scan bodies)."""
    m_u, m_s = _pair(_spec(knn_every=knn_every), model_name)
    params, state = m_u.init(jax.random.PRNGKey(1), 4)
    pts, mask = _fixture()
    m = mask if use_mask else None
    y_u, _ = m_u.apply(params, state, pts, m, train=False)
    y_s, st = m_s.apply(params, state, pts, m, train=False)
    np.testing.assert_array_equal(np.asarray(y_u), np.asarray(y_s))
    for a, b_ in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(st)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


@pytest.mark.parametrize("remat", [False, True])
@pytest.mark.parametrize("knn_every", [1, 3])
def test_scan_train_matches_unrolled(remat, knn_every):
    """Train mode: loss, BN state and gradients to float tolerance.
    Train-mode BN normalizes by batch statistics whose f32 sums XLA
    fuses (and thus reassociates) differently in the scanned body than
    in six unrolled blocks — the block_impl/head_stream reassociation
    class. Eval, which uses running stats, is pinned BITWISE above."""
    m_u, m_s = _pair(_spec(knn_every=knn_every, remat=remat))
    params, state = m_u.init(jax.random.PRNGKey(2), 4)
    pts, mask = _fixture(seed=3)

    def loss_fn(p, model):
        logits, st = model.apply(p, state, pts, mask, train=True)
        return jnp.mean(jnp.square(logits)), st

    (l_u, st_u), g_u = jax.value_and_grad(loss_fn, has_aux=True)(
        params, m_u
    )
    (l_s, st_s), g_s = jax.value_and_grad(loss_fn, has_aux=True)(
        params, m_s
    )
    np.testing.assert_allclose(float(l_u), float(l_s), rtol=1e-6)
    for a, b_ in zip(
        jax.tree_util.tree_leaves(st_u), jax.tree_util.tree_leaves(st_s)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-7
        )
    for a, b_ in zip(
        jax.tree_util.tree_leaves(g_u), jax.tree_util.tree_leaves(g_s)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-6
        )


def test_scan_banded_eval_bitwise():
    """block_scan x knn_window (the 2M frontier combination): banded
    graph builds inside the scan body, bitwise vs unrolled."""
    m_u, m_s = _pair(_spec(knn_window=32))
    params, state = m_u.init(jax.random.PRNGKey(7), 4)
    pts, mask = _fixture(seed=8, n=128)
    y_u, _ = m_u.apply(params, state, pts, mask, train=False)
    y_s, _ = m_s.apply(params, state, pts, mask, train=False)
    np.testing.assert_array_equal(np.asarray(y_u), np.asarray(y_s))


@pytest.mark.parametrize("block_impl", ["edge", "reduced"])
def test_scan_other_block_impls(block_impl):
    """The scan wraps block_fn, so every block_impl must ride it
    unchanged (fused is the default `auto` and covered above)."""
    m_u, m_s = _pair(_spec(block_impl=block_impl))
    params, state = m_u.init(jax.random.PRNGKey(9), 4)
    pts, mask = _fixture(seed=10)
    y_u, _ = m_u.apply(params, state, pts, mask, train=False)
    y_s, _ = m_s.apply(params, state, pts, mask, train=False)
    np.testing.assert_array_equal(np.asarray(y_u), np.asarray(y_s))


def test_scan_knob_validation():
    with pytest.raises(ValueError, match="block_scan"):
        get_model(
            "residual-dgcnn", _spec(block_scan="sometimes")
        )


def test_auto_threshold_boundary(monkeypatch):
    """`block_scan="auto"` engages EXACTLY at rows >= BLOCK_SCAN_ROWS,
    in TRAIN mode only (eval never fragments — it has no backward).
    Pinned by shrinking the module threshold around the fixture's row
    count and spying on jax.lax.scan from the dgcnn module, so a future
    threshold regression fails here rather than as a 2M OOM on
    hardware."""
    import dgcnn_tpu.models.dgcnn as dg

    calls = []
    orig_scan = jax.lax.scan

    def spy(*a, **k):
        calls.append(1)
        return orig_scan(*a, **k)

    monkeypatch.setattr(dg.jax.lax, "scan", spy)
    spec = _spec(block_scan="auto")
    pts, mask = _fixture()
    rows = pts.shape[0] * pts.shape[1]

    model = get_model("residual-dgcnn", spec)
    params, state = model.init(jax.random.PRNGKey(3), 4)

    monkeypatch.setattr(dg, "BLOCK_SCAN_ROWS", rows + 1)
    model.apply(params, state, pts, mask, train=True)
    assert not calls, "auto must stay unrolled below the threshold"

    monkeypatch.setattr(dg, "BLOCK_SCAN_ROWS", rows)
    model.apply(params, state, pts, mask, train=False)
    assert not calls, "auto never scans in eval mode"
    model.apply(params, state, pts, mask, train=True)
    assert calls, "auto must scan AT the threshold (>=, not >) in train"


def test_scan_train_step_under_shard_map():
    """Trainval's shard_map train step with the scanned stack (the 2M
    configuration shape: banded window + remat + streamed head +
    block_scan), DP2 == DP1 to device-count float tolerance."""
    from dgcnn_tpu.config import Config
    from dgcnn_tpu.io import BucketBatcher, SyntheticIO
    from dgcnn_tpu.parallel.mesh import make_mesh
    from dgcnn_tpu.train import Trainval

    n, b = 64, 2
    kw = dict(
        model_name="residual-dgcnn", num_class=2, kvalue=4,
        edge_filters=(8, 8, 8), minibatch_size=b, num_point=n,
        use_pallas=False, remat=True, head_stream="on",
        block_scan="on", knn_window=16,
    )
    io = SyntheticIO(num_events=b, num_point=n, seed=0).initialize()
    batch = next(BucketBatcher(io, b, num_point=n, shuffle=False).epoch())

    losses = {}
    for nd in (1, 2):
        tv = Trainval(Config(**kw, num_devices=nd), mesh=make_mesh(nd))
        s = tv.initialize(4)
        for _ in range(3):
            s, m = tv.train_step(s, batch)
        losses[nd] = float(m["loss"])
        assert np.isfinite(losses[nd])
    np.testing.assert_allclose(losses[1], losses[2], rtol=2e-4)


@pytest.mark.parametrize("point_shards", [1, 2])
def test_scan_run_starting_at_block0_under_shard_map(point_shards):
    """A scanned run that STARTS at block 0 (in_dim == edge_filters[0],
    residual without proj -> block 0 is structurally identical to the
    tail) seeds the scan carry with the dummy idx0. Under shard_map a
    constant init is unvarying while the body's build_graph output is
    varying — lax.scan's carry vma check rejects that at trace time
    unless the dummy is data-derived (the models.head vz trick). Pinned
    here under DP and banded CP; advisor round-4 finding."""
    from dgcnn_tpu.config import Config
    from dgcnn_tpu.io import BucketBatcher, SyntheticIO
    from dgcnn_tpu.parallel.mesh import make_mesh
    from dgcnn_tpu.train import Trainval

    n, b = 64, 2
    # input features are 4-wide (x, y, z, value): edge_filters[0] == 4
    # puts block 0 in the same structural class as the tail
    kw = dict(
        model_name="residual-dgcnn", num_class=2, kvalue=4,
        edge_filters=(4, 4, 4), minibatch_size=b, num_point=n,
        use_pallas=False, block_scan="on", knn_window=16,
    )
    io = SyntheticIO(num_events=b, num_point=n, seed=0).initialize()
    batch = next(BucketBatcher(io, b, num_point=n, shuffle=False).epoch())

    nd = 2 * point_shards
    tv = Trainval(
        Config(**kw, num_devices=nd, point_shards=point_shards),
        mesh=make_mesh(nd, num_point_shards=point_shards),
    )
    s = tv.initialize(4)
    for _ in range(2):
        s, m = tv.train_step(s, batch)
    assert np.isfinite(float(m["loss"]))


def test_scan_under_banded_cp():
    """Banded CP with the scanned stack: the halo exchange + local
    gather decomposition must ride inside the scan body; eval logits at
    valid rows stay bitwise the single-device banded model's."""
    from dgcnn_tpu.config import Config
    from dgcnn_tpu.io import BucketBatcher, SyntheticIO
    from dgcnn_tpu.parallel.mesh import make_mesh
    from dgcnn_tpu.train import Trainval

    n, b = 128, 2
    kw = dict(
        model_name="residual-dgcnn", num_class=2, kvalue=4,
        edge_filters=(8, 8), minibatch_size=b, num_point=n,
        use_pallas=False, knn_window=32, block_scan="on",
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


def test_scan_padding_inert():
    """Garbage in padded rows must not change valid logits with the
    scanned stack engaged (the repo-wide padding invariant)."""
    model = get_model("residual-dgcnn", _spec(block_scan="on"))
    params, state = model.init(jax.random.PRNGKey(4), 4)
    pts, mask = _fixture(seed=5)
    y1, _ = model.apply(params, state, pts, mask, train=False)
    garbage = jnp.where(mask[..., None], pts, 1e6 * jnp.sign(pts) + 123.0)
    y2, _ = model.apply(params, state, garbage, mask, train=False)
    np.testing.assert_array_equal(
        np.asarray(y1)[np.asarray(mask)], np.asarray(y2)[np.asarray(mask)]
    )


def test_scan_groups_structure():
    """The flagship grouping: block 1 (input width, residual proj)
    unrolls alone; the homogeneous 64->64 tail scans as ONE run — both
    still produce per-block BN state lists with the unrolled tree
    structure (checkpoint compatibility)."""
    m_u, m_s = _pair(_spec(knn_every=1))
    params, state = m_u.init(jax.random.PRNGKey(6), 4)
    pts, mask = _fixture(seed=12)
    _, st_u = m_u.apply(params, state, pts, mask, train=True)
    _, st_s = m_s.apply(params, state, pts, mask, train=True)
    assert jax.tree_util.tree_structure(st_u) == jax.tree_util.tree_structure(
        st_s
    )
