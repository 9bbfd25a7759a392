"""Banded sub-quadratic kNN: SFC ordering, oracle semantics, Pallas kernel,
model integration, and the --knn_window flag surface."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.config import Config
from dgcnn_tpu.kernels.knn_banded import knn_pallas_banded
from dgcnn_tpu.models.dgcnn import ModelSpec, make_model
from dgcnn_tpu.ops.knn import band_lo, banded_knn_indices, knn_indices
from dgcnn_tpu.ops.sfc import morton_code, morton_order

HI = jax.lax.Precision.HIGHEST


def _sorted_cloud(b=2, n=512, c=4, valid=None, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    if valid is None:
        mask = None
    else:
        mask = jnp.asarray(np.arange(n)[None, :] < np.asarray(valid)[:, None])
    order, pos = morton_order(x, mask)
    xs = jnp.take_along_axis(x, order[..., None], axis=-2)
    ms = None if mask is None else jnp.take_along_axis(mask, order, axis=-1)
    return xs, ms


# ---------------------------------------------------------------- sfc ----


def test_morton_order_is_permutation_and_invalid_last():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 257, 4).astype(np.float32))
    mask = jnp.asarray(np.arange(257)[None, :] < np.array([257, 100, 0])[:, None])
    order, pos = morton_order(x, mask)
    for b in range(3):
        assert sorted(np.asarray(order[b]).tolist()) == list(range(257))
    # inverse permutation
    np.testing.assert_array_equal(
        np.take_along_axis(np.asarray(order), np.asarray(pos), axis=-1),
        np.broadcast_to(np.arange(257), (3, 257)),
    )
    # valid points occupy a prefix of the sorted order
    ms = np.take_along_axis(np.asarray(mask), np.asarray(order), axis=-1)
    assert (np.diff(ms.astype(int), axis=-1) <= 0).all()


def test_morton_order_is_spatially_local():
    # curve-consecutive points are far closer than random pairs
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 4096, 3).astype(np.float32))
    order, _ = morton_order(x)
    xs = np.asarray(jnp.take_along_axis(x, order[..., None], axis=-2))[0]
    consec = np.linalg.norm(np.diff(xs, axis=0), axis=1).mean()
    rand = np.linalg.norm(
        xs[rng.permutation(4096)] - xs[rng.permutation(4096)], axis=1
    ).mean()
    assert consec < 0.25 * rand


def test_morton_code_ignores_padded_rows():
    # garbage in padded rows must not move any valid point's code
    rng = np.random.RandomState(2)
    x = np.random.RandomState(2).randn(1, 128, 4).astype(np.float32)
    mask = np.arange(128)[None, :] < 96
    x2 = x.copy()
    x2[0, 96:] = 1e6 * rng.randn(32, 4)
    c1 = np.asarray(morton_code(jnp.asarray(x), jnp.asarray(mask)))
    c2 = np.asarray(morton_code(jnp.asarray(x2), jnp.asarray(mask)))
    np.testing.assert_array_equal(c1[0, :96], c2[0, :96])


# ------------------------------------------------------------- oracle ----


def test_band_lo_window_stays_in_valid_region():
    pos = jnp.arange(100, dtype=jnp.int32)
    lo = band_lo(pos, jnp.int32(80), 32)
    assert int(lo.min()) >= 0
    assert int((lo + 32).max()) <= 80  # nvalid
    # centered in the interior
    assert int(lo[50]) == 50 - 16


def test_banded_equals_exact_when_window_covers_all():
    xs, ms = _sorted_cloud(valid=[512, 300])
    ib, vb = banded_knn_indices(xs, 8, ms, window=512, precision=HI)
    ie, ve = knn_indices(xs, 8, ms, precision=HI)
    np.testing.assert_array_equal(np.asarray(ib), np.asarray(ie))
    np.testing.assert_array_equal(np.asarray(vb), np.asarray(ve))


def test_banded_respects_window_and_mask():
    xs, ms = _sorted_cloud(valid=[512, 300])
    w = 64
    idx, valid = banded_knn_indices(xs, 8, ms, window=w, precision=HI)
    nv = np.asarray(ms.sum(-1))
    for b in range(2):
        lo = np.clip(np.arange(512) - w // 2, 0, max(int(nv[b]) - w, 0))
        i = np.asarray(idx[b])
        in_win = (i >= lo[:, None]) & (i < (lo + w)[:, None])
        self_edge = i == np.arange(512)[:, None]
        assert (in_win | self_edge).all()
        # valid queries only ever select valid keys
        assert (i[: int(nv[b])] < int(nv[b])).all()


def test_banded_window_is_best_in_band():
    # within its band every selected set must equal brute-force top-k
    # restricted to the band
    xs, _ = _sorted_cloud(b=1, n=256, c=3)
    w, k = 64, 8
    idx, _ = banded_knn_indices(xs, k, None, window=w, precision=HI)
    x = np.asarray(xs[0])
    d = ((x[:, None] - x[None, :]) ** 2).sum(-1)
    for i in range(0, 256, 37):
        lo = int(np.clip(i - w // 2, 0, 256 - w))
        band = np.arange(lo, lo + w)
        best = band[np.argsort(d[i, band], kind="stable")[:k]]
        assert set(np.asarray(idx[0, i]).tolist()) == set(best.tolist())


def test_banded_all_invalid_event_degrades_to_self_edges():
    xs, _ = _sorted_cloud(b=1, n=128)
    mask = jnp.zeros((1, 128), bool)
    idx, valid = banded_knn_indices(xs, 8, mask, window=32, precision=HI)
    np.testing.assert_array_equal(
        np.asarray(idx), np.broadcast_to(np.arange(128)[None, :, None], (1, 128, 8))
    )
    assert not bool(valid.any())


# ------------------------------------------------------------- kernel ----


@pytest.mark.parametrize("n,c,w", [(512, 4, 128), (512, 4, 512), (384, 16, 96)])
def test_banded_kernel_matches_oracle(n, c, w):
    xs, ms = _sorted_cloud(n=n, c=c, valid=[n, (2 * n) // 3], seed=3)
    ik, vk = knn_pallas_banded(xs, 20, ms, window=w, interpret=True)
    io, vo = banded_knn_indices(xs, 20, ms, window=w, precision=HI)
    np.testing.assert_array_equal(np.asarray(ik), np.asarray(io))
    np.testing.assert_array_equal(np.asarray(vk), np.asarray(vo))


def test_banded_kernel_no_mask():
    xs, _ = _sorted_cloud(b=1, n=1024, c=4, seed=4)
    ik, vk = knn_pallas_banded(xs, 12, None, window=256, interpret=True)
    io, vo = banded_knn_indices(xs, 12, None, window=256, precision=HI)
    np.testing.assert_array_equal(np.asarray(ik), np.asarray(io))
    np.testing.assert_array_equal(np.asarray(vk), np.asarray(vo))


def test_banded_kernel_fuzz():
    rng = np.random.RandomState(5)
    for trial in range(4):
        n = int(rng.choice([256, 384, 512]))
        c = int(rng.choice([3, 4, 8]))
        w = int(rng.choice([64, 128, n]))
        k = int(rng.choice([4, 20]))
        valid = [n, int(rng.randint(k + 1, n))]
        xs, ms = _sorted_cloud(n=n, c=c, valid=valid, seed=100 + trial)
        ik, vk = knn_pallas_banded(xs, k, ms, window=w, interpret=True)
        io, vo = banded_knn_indices(xs, k, ms, window=w, precision=HI)
        np.testing.assert_array_equal(np.asarray(ik), np.asarray(io))
        np.testing.assert_array_equal(np.asarray(vk), np.asarray(vo))


@pytest.mark.parametrize("mc", [128, 256, 512, 1024])
@pytest.mark.parametrize("tile_order", ["asc", "diag_first"])
def test_banded_kernel_merge_chunk_bitwise(mc, tile_order):
    """`merge_chunk` and `tile_order` are pure speed knobs: any chunk
    width and any tile visit order must give BITWISE the oracle's
    indices. Chunked extraction yields value-desc / index-asc within
    each chunk, and the insert breaks value ties by ascending global
    index — so arrival order (across chunks OR across out-of-order
    tiles, the diag_first case) cannot change the result."""
    xs, ms = _sorted_cloud(n=640, c=4, valid=[640, 500], seed=6)
    # duplicate rows -> exact ties that must not reorder across chunks
    # or across tiles (100/101 sit in a different tile than 200 for
    # block_t=1024? n=640 -> single tile; the w>=n fuzz below crosses)
    xs = xs.at[0, 200].set(xs[0, 100])
    xs = xs.at[0, 101].set(xs[0, 100])
    io, vo = banded_knn_indices(xs, 20, ms, window=256, precision=HI)
    ik, vk = knn_pallas_banded(
        xs, 20, ms, window=256, interpret=True, merge_chunk=mc,
        tile_order=tile_order,
    )
    np.testing.assert_array_equal(np.asarray(ik), np.asarray(io))
    np.testing.assert_array_equal(np.asarray(vk), np.asarray(vo))


def test_banded_kernel_tile_order_cross_tile_ties():
    """Exact duplicate points in DIFFERENT tiles: diag_first visits the
    later tile first, so the index-ascending tie rule (not arrival
    order) must decide — pinned against the oracle with small block_t
    to force a multi-tile sweep."""
    xs, ms = _sorted_cloud(n=1024, c=4, valid=[1024, 700], seed=7)
    # duplicates straddling tile boundaries for block_t=256
    for a, b in [(100, 400), (300, 900), (512, 767)]:
        xs = xs.at[0, b].set(xs[0, a])
        xs = xs.at[1, b].set(xs[1, a])
    io, vo = banded_knn_indices(xs, 16, ms, window=512, precision=HI)
    for tile_order in ("asc", "diag_first"):
        ik, vk = knn_pallas_banded(
            xs, 16, ms, window=512, interpret=True, block_t=256,
            tile_order=tile_order,
        )
        np.testing.assert_array_equal(np.asarray(ik), np.asarray(io))
        np.testing.assert_array_equal(np.asarray(vk), np.asarray(vo))


# -------------------------------------------------------------- model ----


def _tiny_spec(**kw):
    return ModelSpec(
        num_class=3, k=8, edge_filters=(16, 16), head_feat_dim=32,
        head_mlp=(16,), **kw
    )


def test_model_banded_full_window_equals_exact():
    rng = np.random.RandomState(6)
    pts = jnp.asarray(rng.randn(2, 256, 4).astype(np.float32))
    mask = jnp.asarray(np.arange(256)[None, :] < np.array([256, 180])[:, None])
    exact = make_model(_tiny_spec())
    banded = make_model(_tiny_spec(knn_window=256))
    params, st = exact.init(jax.random.PRNGKey(0), 4)
    lo_e, _ = exact.apply(params, st, pts, mask, train=False)
    lo_b, _ = banded.apply(params, st, pts, mask, train=False)
    # the banded graph with W >= N selects the exact neighbor sets; the
    # permuted compute order must not change a single logit bit
    np.testing.assert_array_equal(np.asarray(lo_e), np.asarray(lo_b))


def test_model_banded_padding_invariance():
    rng = np.random.RandomState(7)
    pts = jnp.asarray(rng.randn(2, 256, 4).astype(np.float32))
    mask = jnp.asarray(np.arange(256)[None, :] < np.array([200, 130])[:, None])
    model = make_model(_tiny_spec(knn_window=64))
    params, st = model.init(jax.random.PRNGKey(1), 4)
    lo1, st1 = model.apply(params, st, pts, mask, train=True)
    garbage = jnp.where(
        mask[..., None], pts, 1e3 * jnp.asarray(rng.randn(2, 256, 4).astype(np.float32))
    )
    lo2, st2 = model.apply(params, st, garbage, mask, train=True)
    np.testing.assert_array_equal(
        np.asarray(jnp.where(mask[..., None], lo1, 0.0)),
        np.asarray(jnp.where(mask[..., None], lo2, 0.0)),
    )
    for a, b in zip(jax.tree_util.tree_leaves(st1), jax.tree_util.tree_leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_model_banded_grads_finite_and_composes_with_knn_every():
    rng = np.random.RandomState(8)
    pts = jnp.asarray(rng.randn(1, 256, 4).astype(np.float32))
    mask = jnp.ones((1, 256), bool)
    model = make_model(_tiny_spec(knn_window=64, knn_every=2, remat=True))
    params, st = model.init(jax.random.PRNGKey(2), 4)

    def loss(p):
        lg, _ = model.apply(p, st, pts, mask, train=True)
        return jnp.mean(lg**2)

    g = jax.grad(loss)(params)
    assert all(
        bool(jnp.isfinite(leaf).all()) for leaf in jax.tree_util.tree_leaves(g)
    )


# -------------------------------------------------------------- flags ----


def test_knn_window_flag_validation():
    Config(knn_window=0).validate()
    Config(knn_window=64, kvalue=20).validate()
    with pytest.raises(ValueError, match="knn_window"):
        Config(knn_window=-1).validate()
    with pytest.raises(ValueError, match="KVALUE"):
        Config(knn_window=8, kvalue=20).validate()
    # banded + CP is legal when every shard is at least one window wide
    Config(knn_window=64, point_shards=2, num_point=128).validate()
    with pytest.raises(ValueError, match="points per shard"):
        Config(knn_window=64, point_shards=4, num_point=128).validate()


def test_knn_window_is_model_defining():
    from dgcnn_tpu.train.checkpoint import MODEL_FLAGS, model_flag_diffs

    assert "knn_window" in MODEL_FLAGS
    cfg = Config(knn_window=0)
    diffs = model_flag_diffs(cfg, {"knn_window": 128})
    assert diffs == {"knn_window": (0, 128)}


def test_trainval_rejects_rdma_with_banded_cp():
    """Banded CP (tests/test_banded_cp.py) exchanges halos, not ring
    blocks — an explicit --ring_impl rdma must fail fast, not be ignored."""
    from dgcnn_tpu.train.trainval import Trainval

    cfg = Config(
        io_type="synthetic", minibatch_size=2, num_point=128,
        knn_window=64, point_shards=2, num_devices=4, ring_impl="rdma",
    )
    with pytest.raises(ValueError, match="halos"):
        Trainval(cfg)


def test_trainval_banded_train_step_runs():
    from dgcnn_tpu.train.trainval import Trainval

    cfg = dataclasses.replace(
        Config(
            io_type="synthetic", minibatch_size=2, num_point=128,
            kvalue=8, knn_window=32, num_devices=2,
            edge_filters=(16, 16), head_feat_dim=32, head_mlp=(16,),
        )
    )
    from dgcnn_tpu.io.batching import Batch

    tv = Trainval(cfg)
    state = tv.initialize(4)
    rng = np.random.RandomState(9)
    batch = Batch(
        points=rng.randn(2, 128, 4).astype(np.float32),
        labels=rng.randint(0, 2, (2, 128)).astype(np.int32),
        weights=None,
        mask=np.ones((2, 128), bool),
        event_ids=np.arange(2, dtype=np.int64),
        lengths=np.full(2, 128, np.int64),
    )
    state, metrics = tv.train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_block_t_must_be_lane_aligned():
    """Non-128-multiple block_t is rejected with a clear error instead of
    the merge-chunk clamp loop decrementing to a ZeroDivisionError
    (advisor round-4 finding)."""
    xs, ms = _sorted_cloud(n=512)
    with pytest.raises(ValueError, match="128"):
        knn_pallas_banded(xs, 8, ms, window=128, interpret=True, block_t=200)
