"""Edge features and factorized EdgeConv pre-activation vs. naive path."""

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.ops import (
    batch_norm_apply,
    edge_features,
    edge_preact_factorized,
    edgeconv_block_reduced,
    gather_neighbors,
    knn_indices,
)


def test_gather_neighbors_matches_loop():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 30, 6).astype(np.float32)
    idx = rng.randint(0, 30, size=(2, 30, 5))
    out = np.asarray(gather_neighbors(jnp.asarray(x), jnp.asarray(idx)))
    for b in range(2):
        for i in range(30):
            for j in range(5):
                np.testing.assert_array_equal(out[b, i, j], x[b, idx[b, i, j]])


def test_edge_features_concat_semantics():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 20, 3).astype(np.float32)
    idx, _ = knn_indices(jnp.asarray(x), 4)
    e = np.asarray(edge_features(jnp.asarray(x), idx))
    assert e.shape == (1, 20, 4, 6)
    # slot 0 is the self-edge: x_j - x_i == 0, x_i part == x_i
    np.testing.assert_allclose(e[0, :, 0, :3], x[0], rtol=1e-6)
    np.testing.assert_allclose(e[0, :, 0, 3:], 0.0, atol=1e-6)


def test_factorized_preact_equals_naive_conv():
    rng = np.random.RandomState(2)
    b, n, c, k, d = 2, 40, 8, 6, 16
    x = rng.randn(b, n, c).astype(np.float32)
    w = (rng.randn(2 * c, d) * 0.1).astype(np.float32)
    bias = rng.randn(d).astype(np.float32)
    idx, _ = knn_indices(jnp.asarray(x), k)

    naive = jnp.einsum(
        "bnke,ed->bnkd",
        edge_features(jnp.asarray(x), idx),
        jnp.asarray(w),
        precision=jax.lax.Precision.HIGHEST,
    ) + bias
    fact = edge_preact_factorized(
        jnp.asarray(x), idx, jnp.asarray(w), jnp.asarray(bias),
        precision=jax.lax.Precision.HIGHEST,
    )
    np.testing.assert_allclose(np.asarray(fact), np.asarray(naive), atol=2e-5)


def _block_edge_reference(p, q, bnp, bn_state, idx, mask, train):
    """The classic materializing block: gather + add + BN + relu + max."""
    h = p[..., :, None, :] + gather_neighbors(q, idx)
    bm = None if mask is None else mask[..., None]
    hn, st = batch_norm_apply(
        bnp, bn_state, h, bm, train=train, out_dtype=jnp.float32
    )
    return jnp.max(jax.nn.relu(hn), axis=-2), st


def _block_fixture(seed=0, b=2, n=48, d=12, k=5):
    rng = np.random.RandomState(seed)
    feats = rng.randn(b, n, 6).astype(np.float32)
    idx, _ = knn_indices(jnp.asarray(feats), k)
    p = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    q = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    # mixed-sign gammas: the reduced path's max/min selection must route
    # per channel by sign(gamma)
    bnp = {
        "scale": jnp.asarray(rng.randn(d).astype(np.float32)),
        "bias": jnp.asarray(rng.randn(d).astype(np.float32)),
    }
    bn_state = {
        "mean": jnp.asarray(rng.randn(d).astype(np.float32)),
        "var": jnp.asarray((np.abs(rng.randn(d)) + 0.1).astype(np.float32)),
    }
    mask = jnp.asarray(rng.rand(b, n) > 0.3)
    return p, q, bnp, bn_state, idx, mask


def test_reduced_block_eval_is_bitwise_equal():
    p, q, bnp, bn_state, idx, mask = _block_fixture()
    for m in (None, mask):
        y_ref, _ = _block_edge_reference(p, q, bnp, bn_state, idx, m, False)
        y_new, st = edgeconv_block_reduced(
            p, q, bnp, bn_state, idx, m, train=False
        )
        assert bool(jnp.all(y_new == y_ref)), "eval outputs must be bitwise equal"
        assert st is bn_state


def test_reduced_block_train_matches_to_reassociation():
    p, q, bnp, bn_state, idx, mask = _block_fixture(seed=1)
    for m in (None, mask):
        y_ref, st_ref = _block_edge_reference(p, q, bnp, bn_state, idx, m, True)
        y_new, st_new = edgeconv_block_reduced(
            p, q, bnp, bn_state, idx, m, train=True
        )
        np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_ref), atol=1e-5)
        for key in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(st_new[key]), np.asarray(st_ref[key]), atol=1e-6
            )


def test_reduced_block_gradients_match():
    p, q, bnp, bn_state, idx, mask = _block_fixture(seed=2)

    def loss_ref(p, q, scale, bias):
        y, _ = _block_edge_reference(
            p, q, {"scale": scale, "bias": bias}, bn_state, idx, mask, True
        )
        return jnp.mean(jnp.square(y))

    def loss_new(p, q, scale, bias):
        y, _ = edgeconv_block_reduced(
            p, q, {"scale": scale, "bias": bias}, bn_state, idx, mask,
            train=True,
        )
        return jnp.mean(jnp.square(y))

    args = (p, q, bnp["scale"], bnp["bias"])
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    g_new = jax.grad(loss_new, argnums=(0, 1, 2, 3))(*args)
    for a, b_ in zip(g_ref, g_new):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-6
        )


def test_reduced_block_all_masked_keeps_state():
    p, q, bnp, bn_state, idx, _ = _block_fixture(seed=3)
    none_valid = jnp.zeros(p.shape[:-1], bool)
    _, st = edgeconv_block_reduced(
        p, q, bnp, bn_state, idx, none_valid, train=True
    )
    for key in ("mean", "var"):
        np.testing.assert_array_equal(np.asarray(st[key]), np.asarray(bn_state[key]))


def test_model_block_impls_agree():
    """Full flagship-shaped model: reduced vs edge logits agree (train to
    reassociation tolerance, eval bitwise)."""
    import dataclasses

    from dgcnn_tpu.models import ModelSpec, get_model

    rng = np.random.RandomState(7)
    pts = jnp.asarray(rng.randn(2, 96, 4).astype(np.float32))
    mask = jnp.asarray(rng.rand(2, 96) > 0.2)
    spec_r = ModelSpec(
        num_class=3, k=6, edge_filters=(16, 24), head_feat_dim=32,
        head_mlp=(16,), residual=True, block_impl="reduced",
    )
    spec_e = dataclasses.replace(spec_r, block_impl="edge")
    model_r = get_model("residual-dgcnn", spec_r)
    model_e = get_model("residual-dgcnn", spec_e)
    params, state = model_r.init(jax.random.PRNGKey(0), 4)

    lt_r, st_r = model_r.apply(params, state, pts, mask, train=True)
    lt_e, st_e = model_e.apply(params, state, pts, mask, train=True)
    np.testing.assert_allclose(np.asarray(lt_r), np.asarray(lt_e), atol=2e-5)

    le_r, _ = model_r.apply(params, st_e, pts, mask, train=False)
    le_e, _ = model_e.apply(params, st_e, pts, mask, train=False)
    assert bool(jnp.all(le_r == le_e)), "eval logits must be bitwise equal"


def test_fused_block_matches_ad_reference():
    """Custom-VJP block: outputs and all gradients match AD of the
    materializing path (train + eval, masked + unmasked)."""
    from dgcnn_tpu.ops.edge import edgeconv_block_fused

    p, q, bnp, bn_state, idx, mask = _block_fixture(seed=5)
    for train in (True, False):
        for m in (None, mask):
            y_ref, st_ref = _block_edge_reference(
                p, q, bnp, bn_state, idx, m, train
            )
            y_new, st_new = edgeconv_block_fused(
                p, q, bnp, bn_state, idx, m, train=train
            )
            np.testing.assert_allclose(
                np.asarray(y_new), np.asarray(y_ref), atol=1e-5
            )
            for key in ("mean", "var"):
                np.testing.assert_allclose(
                    np.asarray(st_new[key]), np.asarray(st_ref[key]), atol=1e-6
                )

            def loss_ref(p, q, scale, bias):
                y, _ = _block_edge_reference(
                    p, q, {"scale": scale, "bias": bias}, bn_state, idx, m,
                    train,
                )
                return jnp.mean(jnp.square(y))

            def loss_new(p, q, scale, bias):
                y, _ = edgeconv_block_fused(
                    p, q, {"scale": scale, "bias": bias}, bn_state, idx, m,
                    train=train,
                )
                return jnp.mean(jnp.square(y))

            args = (p, q, bnp["scale"], bnp["bias"])
            g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
            g_new = jax.grad(loss_new, argnums=(0, 1, 2, 3))(*args)
            for a, b_ in zip(g_ref, g_new):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-6
                )


def test_model_fused_block_full_grads():
    """Full model with block_impl=fused: loss gradients match the edge
    path through the whole network (6 custom-VJP blocks chained)."""
    import dataclasses

    from dgcnn_tpu.models import ModelSpec, get_model

    rng = np.random.RandomState(11)
    pts = jnp.asarray(rng.randn(2, 96, 4).astype(np.float32))
    mask = jnp.asarray(rng.rand(2, 96) > 0.2)
    labels = jnp.asarray(rng.randint(0, 3, (2, 96)).astype(np.int32))
    spec_f = ModelSpec(
        num_class=3, k=6, edge_filters=(16, 24), head_feat_dim=32,
        head_mlp=(16,), residual=True, block_impl="fused",
    )
    spec_e = dataclasses.replace(spec_f, block_impl="edge")
    model_f = get_model("residual-dgcnn", spec_f)
    model_e = get_model("residual-dgcnn", spec_e)
    params, state = model_f.init(jax.random.PRNGKey(0), 4)

    def make_loss(model):
        def loss(params):
            logits, _ = model.apply(params, state, pts, mask, train=True)
            w = mask.astype(jnp.float32)
            ll = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(ll, labels[..., None], -1)[..., 0]
            return jnp.sum(nll * w) / jnp.sum(w)

        return loss

    lf, gf = jax.value_and_grad(make_loss(model_f))(params)
    le, ge = jax.value_and_grad(make_loss(model_e))(params)
    np.testing.assert_allclose(float(lf), float(le), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(ge)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-6
        )

    # eval predictions bitwise
    le_f, _ = model_f.apply(params, state, pts, mask, train=False)
    le_e, _ = model_e.apply(params, state, pts, mask, train=False)
    assert bool(jnp.all(le_f == le_e))


def test_bfloat16_models_ignore_block_impl():
    """Under bf16 compute the edge path's per-edge rounding cannot be
    reproduced by the factored statistics, so bf16 models always use the
    edge form — block_impl stays a non-model-defining knob (logits must
    be IDENTICAL across impl settings)."""
    import dataclasses

    from dgcnn_tpu.models import ModelSpec, get_model

    rng = np.random.RandomState(4)
    pts = jnp.asarray(rng.randn(2, 96, 4).astype(np.float32))
    mask = jnp.asarray(rng.rand(2, 96) > 0.2)
    spec_e = ModelSpec(
        num_class=2, k=6, edge_filters=(16, 16), head_feat_dim=32,
        head_mlp=(16,), residual=True, compute_dtype="bfloat16",
        block_impl="edge",
    )
    params, state = get_model("residual-dgcnn", spec_e).init(
        jax.random.PRNGKey(0), 4
    )
    outs = {}
    for impl in ("edge", "reduced", "fused"):
        model = get_model(
            "residual-dgcnn", dataclasses.replace(spec_e, block_impl=impl)
        )
        lt, st = model.apply(params, state, pts, mask, train=True)
        le, _ = model.apply(params, st, pts, mask, train=False)
        outs[impl] = (lt, le)
    for impl in ("reduced", "fused"):
        assert bool(jnp.all(outs[impl][0] == outs["edge"][0])), impl
        assert bool(jnp.all(outs[impl][1] == outs["edge"][1])), impl


def test_fused_block_under_remat():
    """--remat wraps block_fn in jax.checkpoint; the custom-VJP core must
    recompute correctly inside it (grads match the edge+remat path)."""
    import dataclasses

    from dgcnn_tpu.models import ModelSpec, get_model

    rng = np.random.RandomState(13)
    pts = jnp.asarray(rng.randn(2, 80, 4).astype(np.float32))
    mask = jnp.asarray(rng.rand(2, 80) > 0.2)
    spec_f = ModelSpec(
        num_class=2, k=6, edge_filters=(12, 16), head_feat_dim=24,
        head_mlp=(16,), residual=True, remat=True, block_impl="fused",
    )
    spec_e = dataclasses.replace(spec_f, block_impl="edge")
    mf = get_model("residual-dgcnn", spec_f)
    me = get_model("residual-dgcnn", spec_e)
    params, state = mf.init(jax.random.PRNGKey(2), 4)

    def make_loss(model):
        def loss(params):
            logits, _ = model.apply(params, state, pts, mask, train=True)
            return jnp.mean(jnp.square(logits))

        return loss

    lf, gf = jax.value_and_grad(make_loss(mf))(params)
    le, ge = jax.value_and_grad(make_loss(me))(params)
    np.testing.assert_allclose(float(lf), float(le), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(ge)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-6
        )


def test_slot_streamed_forward_matches_dense(monkeypatch):
    """Above SLOT_STREAM_ELEMS the fused forward streams one neighbor
    slot at a time (the 1M-point remat fix — BASELINE.md): max/argmax/
    min/argmin must be BITWISE the dense traversal's (first-winner ties
    included), sums equal up to f32 reassociation, and the full fused
    block must keep matching AD of the materializing path."""
    import dgcnn_tpu.ops.edge as edge_mod
    from dgcnn_tpu.ops.edge import edgeconv_block_fused

    rng = np.random.RandomState(17)
    b, nq, n, k, c = 2, 96, 64, 7, 5  # extended q: more rows than queries
    q = jnp.asarray(rng.randn(b, nq, c), jnp.float32)
    idx = jnp.asarray(rng.randint(0, nq, (b, n, k)), jnp.int32)
    idx = idx.at[:, :, 3].set(idx[:, :, 1])  # duplicate slots force ties

    dense = edge_mod._fwd_reductions(q, idx)
    monkeypatch.setattr(edge_mod, "SLOT_STREAM_ELEMS", 1)
    stream = edge_mod._fwd_reductions(q, idx)
    for name, d, s in zip(("mx", "ax", "mn", "an"), dense[:4], stream[:4]):
        np.testing.assert_array_equal(np.asarray(d), np.asarray(s), err_msg=name)
    for name, d, s in zip(("sq", "sq2"), dense[4:], stream[4:]):
        np.testing.assert_allclose(
            np.asarray(d), np.asarray(s), rtol=1e-6, err_msg=name
        )

    # the PRODUCTION streamed forward (_gathered_stats_fwd's lean-carry
    # loop): winner selection + sq residual bitwise the dense branch;
    # the folded s2a differs only by summation order
    p5 = jnp.asarray(rng.randn(b, n, c), jnp.float32)
    w5 = jnp.asarray((rng.rand(b, n) > 0.3).astype(np.float32))
    gs = jnp.asarray(rng.randn(c) >= 0)  # mixed-sign gamma selector
    for w_ in (None, w5):
        monkeypatch.setattr(edge_mod, "SLOT_STREAM_ELEMS", 10**9)
        out_d, res_d = edge_mod._gathered_stats_fwd(p5, q, idx, w_, gs)
        monkeypatch.setattr(edge_mod, "SLOT_STREAM_ELEMS", 1)
        out_s, res_s = edge_mod._gathered_stats_fwd(p5, q, idx, w_, gs)
        np.testing.assert_array_equal(
            np.asarray(out_d[0]), np.asarray(out_s[0]), err_msg="m"
        )
        for name, d, s in zip(("s1p", "s2a", "s2b"), out_d[1:], out_s[1:]):
            np.testing.assert_allclose(
                np.asarray(d), np.asarray(s), rtol=1e-6, err_msg=name
            )
        for name, d, s in zip(("aw", "sq"), res_d[4:], res_s[4:]):
            assert np.asarray(d).dtype == np.asarray(s).dtype, name
            np.testing.assert_array_equal(
                np.asarray(d), np.asarray(s), err_msg=name
            )
        assert np.asarray(res_s[4]).dtype == np.uint8  # narrow winners

    # whole block, streaming forced: output/state/grads still match the
    # AD reference (the backward consumes the streamed residuals)
    p, qb, bnp, bn_state, bidx, mask = _block_fixture(seed=23)
    y_ref, st_ref = _block_edge_reference(
        p, qb, bnp, bn_state, bidx, mask, True
    )
    y_new, st_new = edgeconv_block_fused(
        p, qb, bnp, bn_state, bidx, mask, train=True
    )
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_ref), atol=1e-5)

    def loss_ref(p, qv):
        y, _ = _block_edge_reference(p, qv, bnp, bn_state, bidx, mask, True)
        return jnp.mean(jnp.square(y))

    def loss_new(p, qv):
        y, _ = edgeconv_block_fused(
            p, qv, bnp, bn_state, bidx, mask, train=True
        )
        return jnp.mean(jnp.square(y))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(p, qb)
    g_new = jax.grad(loss_new, argnums=(0, 1))(p, qb)
    for a, b_ in zip(g_ref, g_new):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-6
        )


def test_slot_streamed_eval_matches_dense(monkeypatch):
    """Above SLOT_STREAM_ELEMS the EVAL path also streams (the 2M-point
    serving fix: XLA materializes the (N,k,C) gather past the fusion
    sizes it handles — a measured 21.5 GB OOM at 2M). Streamed eval
    max/min must be BITWISE the dense traversal through both the reduced
    block and the full fused->reduced eval delegation, duplicates and
    masks included."""
    import dgcnn_tpu.ops.edge as edge_mod
    from dgcnn_tpu.ops.edge import (
        edgeconv_block_fused,
        edgeconv_block_reduced,
    )

    p, q, bnp, bn_state, idx, mask = _block_fixture(seed=29)
    idx = idx.at[:, :, 2].set(idx[:, :, 0])  # duplicate slots force ties
    for m in (None, mask):
        y_dense, _ = edgeconv_block_reduced(
            p, q, bnp, bn_state, idx, m, train=False
        )
        monkeypatch.setattr(edge_mod, "SLOT_STREAM_ELEMS", 1)
        y_stream, _ = edgeconv_block_reduced(
            p, q, bnp, bn_state, idx, m, train=False
        )
        np.testing.assert_array_equal(
            np.asarray(y_dense), np.asarray(y_stream)
        )
        # the frontier entry point: fused delegates eval to reduced
        y_fused, _ = edgeconv_block_fused(
            p, q, bnp, bn_state, idx, m, train=False
        )
        np.testing.assert_array_equal(
            np.asarray(y_dense), np.asarray(y_fused)
        )
        # a custom gather_fn must keep the dense traversal (no local
        # slot indexing against non-local gather semantics)
        calls = []

        def spy_gather(qv, ix):
            calls.append(1)
            return edge_mod.gather_neighbors(qv, ix)

        y_g, _ = edgeconv_block_reduced(
            p, q, bnp, bn_state, idx, m, train=False, gather_fn=spy_gather
        )
        assert calls, "custom gather_fn bypassed"
        np.testing.assert_array_equal(np.asarray(y_dense), np.asarray(y_g))
        monkeypatch.undo()


def test_fused_backward_chunked_scatter_matches(monkeypatch):
    """The N-chunked per-slot scatter (SCATTER_CHUNK_ROWS — the >1.5M-row
    allocator lever: win/upd buffers shrink 1/n_chunks) must reproduce
    the unchunked backward's gradients. Same scatter-add totals; the
    per-destination add order across chunk boundaries is the scatter's
    own unspecified-order class, so gradients are pinned at float
    tolerance (measured bitwise-equal on CPU at this size)."""
    import dgcnn_tpu.ops.edge as edge_mod
    from dgcnn_tpu.ops.edge import edgeconv_block_fused

    p, q, bnp, bn_state, idx, mask = _block_fixture(seed=31)
    idx = idx.at[:, :, 1].set(idx[:, :, 0])  # duplicate slots force ties
    for m in (None, mask):

        def loss(p, q, scale, bias):
            y, _ = edgeconv_block_fused(
                p, q, {"scale": scale, "bias": bias}, bn_state, idx, m,
                train=True,
            )
            return jnp.mean(jnp.square(y))

        args = (p, q, bnp["scale"], bnp["bias"])
        g_ref = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)
        # force chunking: rows must split until <= threshold
        monkeypatch.setattr(edge_mod, "SCATTER_CHUNK_ROWS", 16)
        g_chk = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)
        monkeypatch.undo()
        for a, b_ in zip(g_ref, g_chk):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-7
            )


def test_fused_backward_packed_operands_bitwise(monkeypatch):
    """SCATTER_PACK_OPERANDS (the lane-packed probe arm, VERDICT r4 #3):
    packing dm/aw/base as (bl, N*C/128, 128) residents and reshaping
    back per chunk is pure element-order-preserving data movement — the
    same adds land in the same order, so gradients must be BITWISE the
    unpacked form's. C must make the pack shapes divide (C=64 here via
    64-wide filters); ineligible shapes silently keep the unpacked
    path (covered by every other fused-block test)."""
    import dgcnn_tpu.ops.edge as edge_mod
    from dgcnn_tpu.ops.edge import edgeconv_block_fused

    rng = np.random.RandomState(41)
    b, n, k, c = 2, 256, 4, 64
    p = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    q = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    bnp = {
        "scale": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
        "bias": jnp.asarray(rng.randn(c).astype(np.float32)),
    }
    bn_state = {
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
        "count": jnp.zeros((), jnp.float32),
    }
    idx = jnp.asarray(rng.randint(0, n, size=(b, n, k)).astype(np.int32))
    idx = idx.at[:, :, 1].set(idx[:, :, 0])  # duplicate slots force ties
    mask = jnp.asarray(rng.rand(b, n) > 0.2)
    for m in (None, mask):

        def loss(p, q, scale, bias):
            y, _ = edgeconv_block_fused(
                p, q, {"scale": scale, "bias": bias}, bn_state, idx, m,
                train=True,
            )
            return jnp.mean(jnp.square(y))

        args = (p, q, bnp["scale"], bnp["bias"])
        # n_chunks=2 -> step=128: step*C and step*(C+1) both divide 128
        # lanes, so the pack branch is ELIGIBLE (step*65 needs step%128
        # == 0 — a finer chunking would silently skip the pack)
        monkeypatch.setattr(edge_mod, "SCATTER_CHUNK_ROWS", 256)
        assert edge_mod._resolve_scatter_chunks(b, n) == 2
        step = n // 2
        assert (step * c) % 128 == 0 and (step * (c + 1)) % 128 == 0
        g_ref = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)
        monkeypatch.setattr(edge_mod, "SCATTER_PACK_OPERANDS", True)
        g_pk = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)
        monkeypatch.undo()
        for a, b_ in zip(g_ref, g_pk):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
