"""Streamed head (models.head) vs the dense head.

Contract (models/head.py docstring): EVAL bitwise identical, TRAIN equal
up to BN-statistic f32 reassociation, gradients equal to float
tolerance, all three head forms (global_pool + factorized, global_pool
concat, --no_global_pool), masks and padding included.

The streamed head is forced through the user-facing knob
(``ModelSpec.head_stream`` / ``--head_stream on``) rather than by
monkeypatching the module threshold — the knob IS part of the contract.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.models import ModelSpec, get_model


def _spec(hf: bool, gp: bool, dropout: float = 0.0, stream: str = "auto"):
    return ModelSpec(
        num_class=3,
        k=4,
        edge_filters=(8, 8),
        head_feat_dim=32,
        head_mlp=(16, 8),
        global_pool=gp,
        head_factorized=hf,
        dropout=dropout,
        head_stream=stream,
    )


def _pair(spec):
    """(dense model, streamed model) sharing the same param/state trees
    (init is head_stream-independent)."""
    m_d = get_model("residual-dgcnn", dataclasses.replace(spec, head_stream="off"))
    m_s = get_model("residual-dgcnn", dataclasses.replace(spec, head_stream="on"))
    return m_d, m_s


def _fixture(seed=0, b=2, n=96):
    rng = np.random.RandomState(seed)
    pts = jnp.asarray(rng.randn(b, n, 4).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, n) > 0.25)
    return pts, mask


@pytest.mark.parametrize(
    "hf,gp", [(False, True), (True, True), (False, False)]
)
@pytest.mark.parametrize("use_mask", [True, False])
def test_streamed_eval_bitwise(hf, gp, use_mask):
    model_d, model_s = _pair(_spec(hf, gp))
    params, state = model_d.init(jax.random.PRNGKey(1), 4)
    pts, mask = _fixture()
    m = mask if use_mask else None
    y_dense, _ = model_d.apply(params, state, pts, m, train=False)
    y_stream, st = model_s.apply(params, state, pts, m, train=False)
    np.testing.assert_array_equal(np.asarray(y_dense), np.asarray(y_stream))
    # eval must not touch BN state
    for a, b_ in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(st)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


@pytest.mark.parametrize(
    "hf,gp", [(False, True), (True, True), (False, False)]
)
def test_streamed_train_matches_dense(hf, gp):
    model_d, model_s = _pair(_spec(hf, gp))
    params, state = model_d.init(jax.random.PRNGKey(2), 4)
    pts, mask = _fixture(seed=3)

    def loss_fn(p, model):
        logits, st = model.apply(p, state, pts, mask, train=True)
        return jnp.mean(jnp.square(logits)), st

    (l_d, st_d), g_d = jax.value_and_grad(loss_fn, has_aux=True)(
        params, model_d
    )
    (l_s, st_s), g_s = jax.value_and_grad(loss_fn, has_aux=True)(
        params, model_s
    )
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


def test_streamed_padding_inert():
    """Garbage in padded rows must not change valid logits (the repo-wide
    padding invariant) — with the streamed head engaged."""
    model = get_model("residual-dgcnn", _spec(True, True, stream="on"))
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


def test_streamed_dropout_deterministic():
    model = get_model("residual-dgcnn", _spec(True, True, 0.5, stream="on"))
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


def test_head_stream_knob_validation_and_pool_fallback(capsys):
    """Bad knob values fail at build time; head_stream='on' with a
    custom non-max pool warns and keeps the dense head (bitwise the
    default model's output, since the default pool IS masked max)."""
    with pytest.raises(ValueError, match="head_stream"):
        get_model("residual-dgcnn", _spec(True, True, stream="sometimes"))

    spec = _spec(False, True, stream="on")

    def custom_pool(x, mask):  # a mean pool: NOT chunk-decomposable
        if mask is None:
            return jnp.mean(x, axis=-2)
        w = mask[..., None].astype(x.dtype)
        return jnp.sum(x * w, axis=-2) / jnp.maximum(
            jnp.sum(w, axis=-2), 1.0
        )

    model = get_model("residual-dgcnn", spec, pool_fn=custom_pool)
    assert "dense head will be used" in capsys.readouterr().out
    params, state = model.init(jax.random.PRNGKey(8), 4)
    pts, mask = _fixture(seed=9)
    y, _ = model.apply(params, state, pts, mask, train=False)
    model_off = get_model(
        "residual-dgcnn",
        dataclasses.replace(spec, head_stream="off"),
        pool_fn=custom_pool,
    )
    y_off, _ = model_off.apply(params, state, pts, mask, train=False)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_off))


def test_streamed_train_step_under_shard_map():
    """Trainval's shard_map train step with the streamed head: the scan
    carries must hold the mesh axes' varying type (the vz trick in
    models.head) — this is the exact configuration that tripped vma
    checking at 2M on hardware. Also pins DP2 == DP1 with streaming."""
    from dgcnn_tpu.config import Config
    from dgcnn_tpu.io import BucketBatcher, SyntheticIO
    from dgcnn_tpu.parallel.mesh import make_mesh
    from dgcnn_tpu.train import Trainval

    n, b = 64, 2
    kw = dict(
        model_name="residual-dgcnn", num_class=2, kvalue=4,
        edge_filters=(8, 8), minibatch_size=b, num_point=n,
        use_pallas=False, head_factorized=True, remat=True,
        head_stream="on",
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


def test_streamed_head_under_cp():
    """Banded CP with the streamed head: eval logits at valid rows must
    stay bitwise the single-device banded model's (the banded-CP
    contract), with the head streamed on BOTH sides."""
    from dgcnn_tpu.config import Config
    from dgcnn_tpu.io import BucketBatcher, SyntheticIO
    from dgcnn_tpu.parallel.mesh import make_mesh
    from dgcnn_tpu.train import Trainval

    n, b = 128, 2
    kw = dict(
        model_name="residual-dgcnn", num_class=2, kvalue=4,
        edge_filters=(8, 8), minibatch_size=b, num_point=n,
        use_pallas=False, knn_window=32, head_factorized=True,
        head_stream="on",
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


def test_auto_threshold_boundary(monkeypatch):
    """`head_stream="auto"` engages EXACTLY at rows*head_feat_dim >=
    HEAD_STREAM_ELEMS (the measured dense-head OOM line, 2**30 since
    round 4 — models/head.py rationale). Pinned by shrinking the module
    threshold around the fixture's static row count and spying on the
    dispatch, so a future threshold regression (either direction) fails
    here rather than as a 1M-point OOM on hardware."""
    import dgcnn_tpu.models.dgcnn as dg

    calls = []
    orig = dg.head_streamed

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(dg, "head_streamed", spy)
    spec = _spec(False, True, stream="auto")
    pts, mask = _fixture()
    rows_elems = pts.shape[0] * pts.shape[1] * spec.head_feat_dim

    model = get_model("residual-dgcnn", spec)
    params, state = model.init(jax.random.PRNGKey(3), 4)

    monkeypatch.setattr(dg, "HEAD_STREAM_ELEMS", rows_elems + 1)
    y_dense, _ = model.apply(params, state, pts, mask, train=False)
    assert not calls, "auto must keep the dense head below the threshold"

    monkeypatch.setattr(dg, "HEAD_STREAM_ELEMS", rows_elems)
    y_stream, _ = model.apply(params, state, pts, mask, train=False)
    assert calls, "auto must stream AT the threshold (>=, not >)"
    np.testing.assert_array_equal(np.asarray(y_dense), np.asarray(y_stream))


@pytest.mark.parametrize(
    "cdtype,block_convs",
    [("bfloat16", 1), ("float32", 2), ("bfloat16", 2)],
)
def test_edge_eval_slot_streamed_bitwise(monkeypatch, cdtype, block_convs):
    """The EDGE impl's eval path (the bf16 / block_convs>=2 route) streams
    one neighbor slot at a time above EDGE_EVAL_STREAM_ELEMS — every
    per-edge op (add, eval BN, relu, stacked convs) is elementwise and
    max folds exactly (measured motivation: the dense gather is a 40 GB
    allocation at 8M points bf16 — BASELINE.md frontier).

    Contract: f32 is BITWISE the dense edge eval. bf16 agrees to ~1 bf16
    ulp — XLA's --xla_allow_excess_precision makes the DENSE form's own
    bf16-add rounding fusion-shape-dependent, so bitwise is not
    well-defined there; the production threshold (2**31 gather elements)
    keeps every regime where the dense form can actually allocate on the
    dense path, so no working config's outputs change. The bf16 leg uses
    ONE block: deeper stacks rebuild the dynamic graph from 1-ulp-shifted
    features, which legitimately amplifies the difference unboundedly."""
    import dgcnn_tpu.models.dgcnn as dg

    nblocks = 1 if cdtype == "bfloat16" else 3
    spec = ModelSpec(
        num_class=3,
        k=5,
        edge_filters=(8,) * nblocks,
        head_feat_dim=32,
        head_mlp=(16,),
        compute_dtype=cdtype,
        block_convs=block_convs,
    )
    model = get_model("residual-dgcnn", spec)
    params, state = model.init(jax.random.PRNGKey(5), 4)
    pts, mask = _fixture(seed=11)

    y_dense, _ = model.apply(params, state, pts, mask, train=False)
    monkeypatch.setattr(dg, "EDGE_EVAL_STREAM_ELEMS", 1)
    y_stream, _ = model.apply(params, state, pts, mask, train=False)
    if cdtype == "float32":
        np.testing.assert_array_equal(
            np.asarray(y_dense), np.asarray(y_stream)
        )
    else:
        np.testing.assert_allclose(
            np.asarray(y_dense, np.float32),
            np.asarray(y_stream, np.float32),
            rtol=0.02, atol=0.05,
        )


def test_edge_eval_stream_threshold_counts_batch_dims(monkeypatch):
    """EDGE_EVAL_STREAM_ELEMS is documented as TOTAL gather elements of
    the (..., N, k, C) tensor — the threshold must accumulate the
    leading batch dims (a (B, N, k, C) dense gather is B x the per-event
    size; advisor round-4 finding). Pinned with a fori_loop spy exactly
    at / one above the fixture's own B*N*k*C."""
    import dgcnn_tpu.models.dgcnn as dg

    spec = ModelSpec(
        num_class=3,
        k=5,
        edge_filters=(8,),
        head_feat_dim=32,
        head_mlp=(16,),
        compute_dtype="bfloat16",  # bf16 -> the edge impl
    )
    model = get_model("residual-dgcnn", spec)
    params, state = model.init(jax.random.PRNGKey(5), 4)
    pts, mask = _fixture(seed=11)
    b, n = pts.shape[0], pts.shape[1]
    elems = b * n * spec.k * spec.edge_filters[0]

    calls = []
    orig = jax.lax.fori_loop

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(dg.jax.lax, "fori_loop", spy)

    monkeypatch.setattr(dg, "EDGE_EVAL_STREAM_ELEMS", elems + 1)
    model.apply(params, state, pts, mask, train=False)
    assert not calls, "dense edge eval below the total-elements threshold"

    monkeypatch.setattr(dg, "EDGE_EVAL_STREAM_ELEMS", elems)
    model.apply(params, state, pts, mask, train=False)
    assert calls, (
        "streaming must engage AT total (batch-inclusive) gather elements"
    )
