"""Banded context parallelism: halo-exchange banded kNN vs the oracle.

Contract under test (kernels/halo_knn.py): with the event globally sorted
(padded points last) and sharded in contiguous bands, VALID query rows are
bitwise the single-device banded oracle (`ops.knn.banded_knn_indices` —
shared `_banded_select_core`), PADDED query rows are deterministic
self-edges, and the whole model (graph build + halo gathers + pool) under
``point_shards > 1`` matches the single-device banded model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from dgcnn_tpu.config import Config
from dgcnn_tpu.io import BucketBatcher, SyntheticIO
from dgcnn_tpu.kernels.halo_knn import halo_gather, halo_knn
from dgcnn_tpu.ops.edge import gather_neighbors
from dgcnn_tpu.ops.knn import banded_knn_indices
from dgcnn_tpu.ops.sfc import morton_order
from dgcnn_tpu.parallel.mesh import POINT_AXIS, make_mesh
from dgcnn_tpu.train import Trainval

HI = jax.lax.Precision.HIGHEST


def _run_halo_knn(x, k, window, mask=None, n_shards=8, use_pallas=False):
    mesh = make_mesh(num_devices=n_shards, num_point_shards=n_shards)
    fn = jax.jit(
        jax.shard_map(
            lambda xs, ms: halo_knn(
                xs, k, ms, window=window, precision=HI, use_pallas=use_pallas
            ),
            mesh=mesh,
            in_specs=(P(None, POINT_AXIS), P(None, POINT_AXIS)),
            out_specs=(P(None, POINT_AXIS), P(None, POINT_AXIS)),
            # the Pallas hlo_interpreter's ref discharge mixes varying refs
            # with constant slice indices, which the static vma checker
            # rejects — same interpret-mode-only limitation the RDMA ring
            # tests carry (tests/test_ring_rdma.py); Mosaic-compiled TPU
            # runs never execute that code path
            check_vma=not use_pallas,
        )
    )
    if mask is None:
        mask = jnp.ones(x.shape[:-1], bool)
    return fn(x, mask)


def _sorted_event(b, n, c, nvalid=None, seed=0):
    """Random batch in 'sorted' layout: padded rows (if any) last."""
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    if nvalid is None:
        return x, jnp.ones((b, n), bool)
    mask = jnp.asarray((np.arange(n)[None, :] < np.asarray(nvalid)[:, None]))
    return x, mask


def _assert_matches_oracle(x, mask, k, window, n_shards, use_pallas=False):
    idx_h, valid_h = _run_halo_knn(x, k, window, mask, n_shards, use_pallas)
    idx_o, valid_o = banded_knn_indices(x, k, mask, window=window, precision=HI)
    idx_h, valid_h = np.asarray(idx_h), np.asarray(valid_h)
    idx_o, valid_o = np.asarray(idx_o), np.asarray(valid_o)
    m = np.asarray(mask)
    # valid query rows: bitwise the oracle (indices AND degradation flags)
    np.testing.assert_array_equal(idx_h[m], idx_o[m])
    np.testing.assert_array_equal(valid_h[m], valid_o[m])
    # padded query rows: deterministic self-edges, flagged invalid
    n = x.shape[-2]
    self_idx = np.broadcast_to(np.arange(n)[None, :, None], idx_h.shape)
    np.testing.assert_array_equal(idx_h[~m], self_idx[~m])
    assert not valid_h[~m].any()


@pytest.mark.parametrize("n_shards,window", [(2, 128), (4, 64), (8, 64)])
def test_halo_knn_matches_banded_oracle(n_shards, window):
    x, mask = _sorted_event(2, 512, 8)
    _assert_matches_oracle(x, mask, 16, window, n_shards)


def test_halo_knn_masked_boundary_mid_shard():
    """Valid/padded boundary inside an inner shard: windows near the end
    clip left across the shard edge (the halo's hardest case)."""
    x, mask = _sorted_event(3, 512, 6, nvalid=[300, 512, 70], seed=1)
    _assert_matches_oracle(x, mask, 12, 64, 8)


def test_halo_knn_window_equals_shard_size():
    """W == N_local: halos are whole neighbor shards (edge of the legal
    range, D=2 wraparound halos are each other's shard twice)."""
    x, mask = _sorted_event(1, 256, 4, nvalid=[200], seed=2)
    _assert_matches_oracle(x, mask, 8, 128, 2)
    _assert_matches_oracle(x, mask, 8, 64, 4)


def test_halo_knn_fewer_than_k_valid():
    """nvalid < k: every valid query degrades some slots to self-edges,
    exactly like the oracle."""
    x, mask = _sorted_event(1, 256, 4, nvalid=[5], seed=3)
    _assert_matches_oracle(x, mask, 8, 32, 8)


@pytest.mark.parametrize("n_shards,window", [(2, 128), (4, 64)])
def test_halo_knn_pallas_matches_oracle(n_shards, window):
    """The fused-kernel local scorer (knn_pallas_banded_cross with
    per-shard q/key base offsets, interpret mode on CPU): same valid-row
    selections as the jnp core / single-device banded oracle."""
    x, mask = _sorted_event(2, 512, 8, nvalid=[512, 300], seed=7)
    _assert_matches_oracle(x, mask, 16, window, n_shards, use_pallas=True)


def test_halo_knn_pallas_fewer_than_k_valid():
    x, mask = _sorted_event(1, 256, 4, nvalid=[5], seed=8)
    _assert_matches_oracle(x, mask, 8, 32, 8, use_pallas=True)


def test_halo_knn_after_real_morton_sort():
    """End-to-end faithful layout: actual Morton-sorted event."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 512, 4).astype(np.float32) * 100)
    mask = jnp.asarray(np.arange(512)[None, :] < np.array([512, 410])[:, None])
    order, _ = morton_order(x, mask)
    xs = jnp.take_along_axis(x, order[..., None], axis=-2)
    ms = jnp.take_along_axis(mask, order, axis=-1)
    _assert_matches_oracle(xs, ms, 16, 128, 4)


def test_halo_knn_window_too_large_raises():
    x, mask = _sorted_event(1, 256, 4)
    with pytest.raises(ValueError, match="local shard size"):
        _run_halo_knn(x, 8, 64, mask, n_shards=8)  # N_local=32 < window


def test_halo_gather_matches_local_gather():
    """Sharded halo gather == unsharded take_along_axis on the full array,
    for indices produced by the banded graph build."""
    x, mask = _sorted_event(2, 512, 8, nvalid=[512, 300], seed=5)
    window, k, n_shards = 64, 12, 8
    idx, _ = banded_knn_indices(x, k, mask, window=window, precision=HI)
    vals = jnp.asarray(np.random.RandomState(6).randn(2, 512, 16).astype(np.float32))

    mesh = make_mesh(num_devices=n_shards, num_point_shards=n_shards)
    fn = jax.jit(
        jax.shard_map(
            lambda vs, ix: halo_gather(vs, ix, window=window),
            mesh=mesh,
            in_specs=(P(None, POINT_AXIS), P(None, POINT_AXIS)),
            out_specs=P(None, POINT_AXIS),
        )
    )
    got = fn(vals, idx)
    want = gather_neighbors(vals, idx)
    m = np.asarray(mask)
    np.testing.assert_array_equal(np.asarray(got)[m], np.asarray(want)[m])


# --------------------------------------------------------------- model level

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
    knn_window=32,
)


def _batch(batch_size, num_point=256, seed=0):
    io = SyntheticIO(num_events=batch_size, num_point=num_point, seed=seed).initialize()
    return next(BucketBatcher(io, batch_size, num_point=num_point, shuffle=False).epoch())


@pytest.mark.parametrize("data,points,knn_every", [(2, 4, 1), (1, 8, 2)])
def test_banded_cp_train_matches_single_device(data, points, knn_every):
    """(data × points)-sharded banded training == single-device banded
    training: the global entry sort + halo graph builds/gathers reproduce
    the in-model sort + local banded oracle."""
    cfg_cp = Config(
        minibatch_size=data, point_shards=points, knn_every=knn_every, **SMALL
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


def test_banded_cp_inference_matches_single_device():
    """Eval under banded CP: valid-row scores/predictions equal the
    single-device banded model's, in the caller's original point order
    (padded rows differ by contract: halo self-edges vs oracle garbage)."""
    cfg_cp = Config(minibatch_size=2, point_shards=4, **SMALL)
    cfg_1 = Config(minibatch_size=2, **SMALL)
    tv_cp = Trainval(cfg_cp, mesh=make_mesh(8, num_point_shards=4))
    tv_1 = Trainval(cfg_1, mesh=make_mesh(1))
    # padded batch: 200-point events in a 256 bucket
    io = SyntheticIO(num_events=2, num_point=200, seed=3).initialize()
    batch = next(BucketBatcher(io, 2, buckets=(256,), shuffle=False).epoch())
    assert batch.mask.sum() < batch.mask.size

    state = tv_1.initialize(4)
    for _ in range(2):
        state, _ = tv_1.train_step(state, batch)

    state_cp = jax.device_put(state, tv_cp._repl_sharding)
    sc_cp, pr_cp, me_cp = tv_cp.inference(state_cp, batch)
    sc_1, pr_1, me_1 = tv_1.inference(state, batch)
    m = np.asarray(batch.mask)
    np.testing.assert_allclose(
        np.asarray(sc_cp)[m], np.asarray(sc_1)[m], atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(pr_cp)[m], np.asarray(pr_1)[m])
    np.testing.assert_allclose(
        np.asarray(me_cp["confusion"]), np.asarray(me_1["confusion"]), atol=0
    )


def test_banded_cp_variable_length_masked_trains():
    """Ragged events under banded CP: padding stays inert, loss falls."""
    cfg = Config(minibatch_size=1, point_shards=8, **SMALL)
    tv = Trainval(cfg, mesh=make_mesh(8, num_point_shards=8))
    io = SyntheticIO(num_events=1, num_point=200, seed=5).initialize()
    batch = next(BucketBatcher(io, 1, buckets=(256,), shuffle=False).epoch())
    assert batch.mask.sum() < batch.mask.size
    state = tv.initialize(4)
    losses = []
    for _ in range(10):
        state, m = tv.train_step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_banded_cp_train_inference_writeback_loop(tmp_path):
    """Full driver loop under banded CP: train (data=2 × points=2) →
    checkpoint → inference with h5 write-back — and the written
    predictions (original point order, via the exit unpermute) match a
    single-device serve of the same checkpoint."""
    import h5py

    from dgcnn_tpu.io import SyntheticIO, write_canonical
    from dgcnn_tpu.train.loop import inference, train

    base = dict(
        io_type="synthetic",
        num_class=2,
        kvalue=8,
        edge_filters=(16, 16),
        head_feat_dim=32,
        head_mlp=(32,),
        minibatch_size=2,
        num_point=128,
        knn_window=32,
        use_pallas=False,
        precision="highest",
        weight_prefix=str(tmp_path / "w/snap"),
        log_dir=str(tmp_path / "log"),
        seed=7,
    )
    train(Config(
        command="train", iteration=20, checkpoint_step=10, report_step=5,
        learning_rate=1e-2, point_shards=2, num_devices=4, **base,
    ))

    events_path = str(tmp_path / "events.h5")
    io = SyntheticIO(num_events=4, num_point=128, num_class=2, seed=7).initialize()
    write_canonical(events_path, [io.read_event(i) for i in range(4)], "h5")

    def serve(tag, point_shards, num_devices):
        cfg = Config(
            command="inference", input_file=events_path,
            model_path=str(tmp_path / "w/snap"),
            output_file=str(tmp_path / f"pred_{tag}.h5"),
            shuffle=False, iteration=0, point_shards=point_shards,
            num_devices=num_devices,
            **{**base, "io_type": "h5"},
        )
        return inference(cfg)

    s_cp = serve("cp", 2, 4)
    s_1 = serve("single", 1, 1)
    assert s_cp["acc"] == pytest.approx(s_1["acc"], abs=1e-6)
    with h5py.File(tmp_path / "pred_cp.h5") as f_cp, h5py.File(
        tmp_path / "pred_single.h5"
    ) as f_1:
        np.testing.assert_array_equal(
            np.asarray(f_cp["prediction"]), np.asarray(f_1["prediction"])
        )
        np.testing.assert_allclose(
            np.asarray(f_cp["scores"]), np.asarray(f_1["scores"]), atol=1e-6
        )


def test_banded_cp_auto_resolves_fused():
    """Both CP gathers decompose into exchange + local gather (halo
    ppermutes / tiled all_gather), so the auto block default resolves to
    the fused O(rows·C)-backward impl under banded AND exact-ring CP —
    the same form that unlocks huge single-chip events (BASELINE.md)."""
    cfg = Config(minibatch_size=1, point_shards=4, **SMALL)
    tv = Trainval(cfg, mesh=make_mesh(4, num_point_shards=4))
    assert tv.model.block_impl == "fused"
    cfg_ring = Config(minibatch_size=1, point_shards=4, **{**SMALL, "knn_window": 0})
    tv_ring = Trainval(cfg_ring, mesh=make_mesh(4, num_point_shards=4))
    assert tv_ring.model.block_impl == "fused"


def test_banded_cp_fused_matches_edge_impl():
    """block_impl stays a non-model-defining knob under banded CP: fused
    (the auto default) vs edge train to float tolerance on the same
    batch, and eval scores/predictions of one trained state are BITWISE
    equal across the two impls (valid rows)."""
    mesh = make_mesh(8, num_point_shards=4)
    cfg_f = Config(minibatch_size=2, point_shards=4, **SMALL)
    cfg_e = Config(
        minibatch_size=2, point_shards=4, **{**SMALL, "block_impl": "edge"}
    )
    tv_f = Trainval(cfg_f, mesh=mesh)
    tv_e = Trainval(cfg_e, mesh=mesh)
    assert tv_f.model.block_impl == "fused"
    assert tv_e.model.block_impl == "edge"

    # padded batch: 200-point events in a 256 bucket
    io = SyntheticIO(num_events=2, num_point=200, seed=9).initialize()
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

    # eval of ONE state under both impls: bitwise (the block_impl contract)
    sc_f, pr_f, _ = tv_f.inference(s_f, batch)
    sc_e, pr_e, _ = tv_e.inference(jax.device_put(s_f, tv_e._repl_sharding), batch)
    m = np.asarray(batch.mask)
    np.testing.assert_array_equal(np.asarray(sc_f)[m], np.asarray(sc_e)[m])
    np.testing.assert_array_equal(np.asarray(pr_f)[m], np.asarray(pr_e)[m])


def test_banded_cp_fused_grads_match_whole_gather_ad():
    """The halo-decomposed fused custom VJP against plain AD of the same
    loss built on `halo_gather` (whole-gather reduced impl): gradients
    agree to float tolerance on a ragged sharded batch."""
    mesh = make_mesh(4, num_point_shards=4)
    cfg_f = Config(minibatch_size=1, point_shards=4, **SMALL)
    cfg_r = Config(
        minibatch_size=1, point_shards=4, **{**SMALL, "block_impl": "reduced"}
    )
    tv_f = Trainval(cfg_f, mesh=mesh)
    tv_r = Trainval(cfg_r, mesh=mesh)
    assert tv_f.model.block_impl == "fused"
    assert tv_r.model.block_impl == "reduced"
    io = SyntheticIO(num_events=1, num_point=200, seed=10).initialize()
    batch = next(BucketBatcher(io, 1, buckets=(256,), shuffle=False).epoch())
    # same cfg.seed -> identical init params (train_step donates its
    # state, so each trainer needs its own)
    s_f, _ = tv_f.train_step(tv_f.initialize(4), batch)
    s_r, _ = tv_r.train_step(tv_r.initialize(4), batch)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_f.params), jax.tree_util.tree_leaves(s_r.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


# ------------------------------------------------------------- config guards

def test_config_rejects_window_wider_than_shard():
    cfg = Config(
        minibatch_size=1, point_shards=8, num_point=256,
        **{**SMALL, "knn_window": 64},
    )
    with pytest.raises(ValueError, match="points per shard"):
        cfg.validate()


def test_config_rejects_rdma_with_banded_cp():
    cfg = Config(
        minibatch_size=1, point_shards=4, num_point=256,
        ring_impl="rdma", **SMALL,
    )
    with pytest.raises(ValueError, match="halos"):
        cfg.validate()


def test_config_validates_padded_sizes_not_raw():
    """The guard must check the PADDED event size the batcher actually
    produces (io.batching rounds to the 128-point lane width): a raw
    num_point that looks too small for the window can pad to a legal
    size, and a raw one that looks divisible can pad to an indivisible
    one."""
    # raw 200 -> padded 256: shard 128 >= window 128, legal
    Config(
        minibatch_size=1, point_shards=2, num_point=200,
        **{**SMALL, "knn_window": 128},
    ).validate()
    # raw 192 divides by 6, but padded 256 does not
    with pytest.raises(ValueError, match="not divisible"):
        Config(
            minibatch_size=1, point_shards=6, num_point=192,
            **{**SMALL, "knn_window": 32},
        ).validate()


def test_trainval_banded_cp_honors_no_pallas(monkeypatch):
    """--no_pallas must reach the halo path's local scorer: the kernel
    bypass is the debug knob for ruling out kernel bugs, so banded CP
    silently re-enabling the fused kernel would defeat it."""
    import dgcnn_tpu.kernels.halo_knn as hk
    import dgcnn_tpu.parallel.context_parallel as cp_mod

    seen = {}
    real = hk.halo_knn

    def spy(x, k, mask=None, **kw):
        seen["use_pallas"] = kw.get("use_pallas")
        return real(x, k, mask, **kw)

    monkeypatch.setattr(hk, "halo_knn", spy)
    ops = cp_mod.banded_cp_graph_ops(window=32, use_pallas=False)
    mesh = make_mesh(num_devices=2, num_point_shards=2)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 128, 4), jnp.float32)
    m = jnp.ones((1, 128), bool)
    jax.jit(
        jax.shard_map(
            lambda xs, ms: ops.knn(xs, 8, ms),
            mesh=mesh,
            in_specs=(P(None, POINT_AXIS), P(None, POINT_AXIS)),
            out_specs=(P(None, POINT_AXIS), P(None, POINT_AXIS)),
        )
    )(x, m)
    assert seen["use_pallas"] is False


def test_halo_knn_default_mask_under_vma_check():
    """mask_shard=None must work inside a check_vma=True shard_map (the
    derived all-ones mask has to carry x's varying mesh axes — a fresh
    jnp.ones would fail the static vma check at trace time)."""
    mesh = make_mesh(num_devices=4, num_point_shards=4)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 256, 4), jnp.float32)
    idx, valid = jax.jit(
        jax.shard_map(
            lambda xs: halo_knn(xs, 8, window=32, precision=HI),
            mesh=mesh,
            in_specs=P(None, POINT_AXIS),
            out_specs=(P(None, POINT_AXIS), P(None, POINT_AXIS)),
            check_vma=True,
        )
    )(x)
    idx_o, valid_o = banded_knn_indices(x, 8, window=32, precision=HI)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_o))
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(valid_o))


def test_halo_knn_all_padded_shard_does_not_corrupt_neighbors():
    """An event whose valid points all sort into shard 0 leaves later
    shards fully padded: their chunks claim clipped windows far left of
    the key array (the kernel's zero-trip-guard case). Rows of OTHER
    events and the valid shard must stay bitwise the oracle, padded rows
    deterministic self-edges."""
    # event 0 fully valid, event 1 only 40 of 512 valid
    x, mask = _sorted_event(2, 512, 6, nvalid=[512, 40], seed=11)
    _assert_matches_oracle(x, mask, 8, 64, 8)
    _assert_matches_oracle(x, mask, 8, 64, 8, use_pallas=True)
