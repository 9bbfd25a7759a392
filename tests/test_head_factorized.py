"""--head_factorized: the model-defining opt-in that removes the head's
[agg, pooled-global] concat (BASELINE.md long-context frontier — the 1M
single-chip-training enabler).

Contract: same parameter shapes as the concat form (the same first-MLP W
is split at apply time), predictions CLOSE but not required bitwise (the
split contraction reassociates the f32 dot product — that is exactly why
it is model-defining and adopted from checkpoints, unlike block_impl).
"""

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


def _batch(b=2, num_point=200, seed=1, bucket=256):
    io = SyntheticIO(num_events=b, num_point=num_point, seed=seed).initialize()
    return next(BucketBatcher(io, b, buckets=(bucket,), shuffle=False).epoch())


def test_head_factorized_matches_concat_closely():
    """Same trained params served through both head forms: scores agree
    to float tolerance (NOT asserted bitwise — the split contraction is
    the documented reason the flag is model-defining)."""
    batch = _batch()
    tv_c = Trainval(Config(minibatch_size=2, **SMALL), mesh=make_mesh(1))
    tv_f = Trainval(
        Config(minibatch_size=2, head_factorized=True, **SMALL),
        mesh=make_mesh(1),
    )
    s = tv_c.initialize(4)
    for _ in range(2):
        s, _ = tv_c.train_step(s, batch)
    sc_c, pr_c, _ = tv_c.inference(s, batch)
    sc_f, pr_f, _ = tv_f.inference(
        jax.device_put(s, tv_f._repl_sharding), batch
    )
    m = np.asarray(batch.mask)
    np.testing.assert_allclose(
        np.asarray(sc_c)[m], np.asarray(sc_f)[m], atol=1e-4
    )


def test_head_factorized_trains():
    """The factorized head learns (loss falls, params finite) on a padded
    batch — BN statistics must exclude padded rows exactly like the
    concat form."""
    tv = Trainval(
        Config(minibatch_size=2, head_factorized=True, **SMALL),
        mesh=make_mesh(1),
    )
    batch = _batch()
    assert batch.mask.sum() < batch.mask.size
    state = tv.initialize(4)
    losses = []
    for _ in range(8):
        state, m = tv.train_step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_head_factorized_padding_inert():
    """Garbage in padded rows must not change valid logits (the factored
    g @ W_g term must come from the MASKED pool)."""
    tv = Trainval(
        Config(minibatch_size=1, head_factorized=True, **SMALL),
        mesh=make_mesh(1),
    )
    batch = _batch(b=1, seed=3)
    m = np.asarray(batch.mask)[0]
    assert (~m).any()
    state = tv.initialize(4)
    sc_a, _, _ = tv.inference(state, batch)

    import dataclasses

    poisoned = batch.points.copy()
    poisoned[0, ~m] = 1e6
    batch2 = dataclasses.replace(batch, points=poisoned)
    sc_b, _, _ = tv.inference(state, batch2)
    np.testing.assert_array_equal(
        np.asarray(sc_a)[0, m], np.asarray(sc_b)[0, m]
    )


def test_head_factorized_adopted_from_checkpoint(tmp_path):
    """MODEL-DEFINING: a serve that forgets --head_factorized must adopt
    it from the checkpoint and reproduce the factorized predictions
    exactly."""
    import h5py

    from dgcnn_tpu.io import SyntheticIO as SIO, write_canonical
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
        num_devices=2,
        use_pallas=False,
        precision="highest",
        weight_prefix=str(tmp_path / "w/snap"),
        log_dir=str(tmp_path / "log"),
        seed=7,
    )
    train(Config(
        command="train", iteration=10, checkpoint_step=10, report_step=5,
        learning_rate=1e-2, head_factorized=True, **base,
    ))
    events = str(tmp_path / "events.h5")
    io = SIO(num_events=4, num_point=128, num_class=2, seed=7).initialize()
    write_canonical(events, [io.read_event(i) for i in range(4)], "h5")

    def serve(tag, **extra):
        cfg = Config(
            command="inference", input_file=events,
            model_path=str(tmp_path / "w/snap"),
            output_file=str(tmp_path / f"p_{tag}.h5"),
            shuffle=False, iteration=0,
            **{**base, "io_type": "h5", **extra},
        )
        return inference(cfg)

    serve("flagged", head_factorized=True)
    serve("forgot")  # flag omitted -> must be adopted
    with h5py.File(tmp_path / "p_flagged.h5") as fa, h5py.File(
        tmp_path / "p_forgot.h5"
    ) as fb:
        np.testing.assert_array_equal(
            np.asarray(fa["prediction"]), np.asarray(fb["prediction"])
        )
        np.testing.assert_array_equal(
            np.asarray(fa["scores"]), np.asarray(fb["scores"])
        )


@pytest.mark.parametrize("window", [0, 32])
def test_head_factorized_under_cp(window):
    """Composes with both CP paths (the pooled global is replicated; the
    factored per-event term broadcasts over the sharded points): CP ==
    single-device to float tolerance."""
    extra = dict(knn_window=window) if window else {}
    cfg_cp = Config(
        minibatch_size=2, point_shards=4, head_factorized=True,
        **SMALL, **extra,
    )
    cfg_1 = Config(minibatch_size=2, head_factorized=True, **SMALL, **extra)
    tv_cp = Trainval(cfg_cp, mesh=make_mesh(8, num_point_shards=4))
    tv_1 = Trainval(cfg_1, mesh=make_mesh(1))
    batch = _batch()
    s_cp = tv_cp.initialize(4)
    s_1 = tv_1.initialize(4)
    for _ in range(3):
        s_cp, m_cp = tv_cp.train_step(s_cp, batch)
        s_1, m_1 = tv_1.train_step(s_1, batch)
        np.testing.assert_allclose(
            float(m_cp["loss"]), float(m_1["loss"]), rtol=1e-4
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_cp.params),
        jax.tree_util.tree_leaves(s_1.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_head_factorized_needs_mlp_layer():
    cfg = Config(
        minibatch_size=1, num_point=128, head_factorized=True,
        **{**SMALL, "head_mlp": ()},
    )
    with pytest.raises(ValueError, match="head_mlp"):
        cfg.validate()
