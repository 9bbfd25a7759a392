"""Per-point loss weights (reference WEIGHT_KEY) flow end-to-end."""

import numpy as np

from dgcnn_tpu.config import Config
from dgcnn_tpu.io import BucketBatcher, SyntheticIO, write_canonical
from dgcnn_tpu.parallel.mesh import make_mesh
from dgcnn_tpu.train import Trainval
from dgcnn_tpu.train.loop import train

SMALL = dict(
    num_class=2,
    kvalue=6,
    edge_filters=(8,),
    head_feat_dim=16,
    head_mlp=(16,),
    use_pallas=False,
    precision="highest",
)


def test_weights_change_loss():
    io = SyntheticIO(num_events=8, num_point=128, seed=0, with_weights=True).initialize()
    batch = next(BucketBatcher(io, 8, num_point=128, shuffle=False).epoch())
    assert batch.weights is not None and batch.weights.max() > batch.weights.min()

    cfg = Config(minibatch_size=8, **SMALL)
    tv = Trainval(cfg, mesh=make_mesh(8))
    state = tv.initialize(4)
    _, m_weighted = tv.train_step(state, batch)

    unweighted = batch.__class__(
        points=batch.points,
        labels=batch.labels,
        weights=None,
        mask=batch.mask,
        event_ids=batch.event_ids,
        lengths=batch.lengths,
    )
    state2 = tv.initialize(4)
    _, m_plain = tv.train_step(state2, unweighted)
    assert abs(float(m_weighted["loss"]) - float(m_plain["loss"])) > 1e-6


def test_weighted_h5_training_e2e(tmp_path):
    io = SyntheticIO(num_events=16, num_point=128, seed=1, with_weights=True).initialize()
    path = str(tmp_path / "w.h5")
    write_canonical(path, [io.read_event(i) for i in range(16)], "h5")
    cfg = Config(
        command="train",
        io_type="h5",
        input_file=path,
        weight_key="weight",
        minibatch_size=8,
        num_point=128,
        iteration=10,
        report_step=5,
        checkpoint_step=0,
        learning_rate=1e-2,
        weight_prefix=str(tmp_path / "w/s"),
        log_dir=str(tmp_path / "log"),
        seed=3,
        **SMALL,
    )
    metrics = train(cfg)
    assert np.isfinite(metrics["loss"])


def test_class_weights_compose_with_point_weights():
    """--class_weights w0 w1 must scale each point's loss weight by its
    label's multiplier — equivalent to baking the multipliers into the
    per-point weight array."""
    import dataclasses

    base = Config(
        num_class=2, kvalue=6, edge_filters=(8,), head_feat_dim=16,
        head_mlp=(16,), minibatch_size=1, num_point=96, use_pallas=False,
        optimizer="sgd", learning_rate=1e-2, num_devices=1,
        precision="highest",
    )
    io = SyntheticIO(num_events=1, num_point=96, seed=4).initialize()
    batch = next(BucketBatcher(io, 1, num_point=96, shuffle=False).epoch())

    cw = (1.0, 3.5)
    tv_flag = Trainval(
        dataclasses.replace(base, class_weights=cw), mesh=make_mesh(1)
    )
    s0 = tv_flag.initialize(4)
    _, m_flag = tv_flag.train_step(s0, batch)

    manual_w = np.asarray(cw, np.float32)[batch.labels] * (
        batch.weights if batch.weights is not None else 1.0
    )
    manual = batch.__class__(
        points=batch.points, labels=batch.labels,
        weights=manual_w.astype(np.float32), mask=batch.mask,
        event_ids=batch.event_ids, lengths=batch.lengths,
    )
    tv_plain = Trainval(base, mesh=make_mesh(1))
    s1 = tv_plain.initialize(4)
    _, m_manual = tv_plain.train_step(s1, manual)
    np.testing.assert_allclose(
        float(m_flag["loss"]), float(m_manual["loss"]), rtol=1e-6
    )
    # and it actually changes the loss vs uniform weighting
    tv_uni = Trainval(base, mesh=make_mesh(1))
    s2 = tv_uni.initialize(4)
    _, m_uni = tv_uni.train_step(s2, batch)
    assert abs(float(m_flag["loss"]) - float(m_uni["loss"])) > 1e-6
