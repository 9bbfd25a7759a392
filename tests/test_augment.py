"""Training-time augmentation: geometry-preserving, padding-invariant,
seed-deterministic, and the train loop still converges with it on."""

import numpy as np

from dgcnn_tpu.config import Config
from dgcnn_tpu.io import BucketBatcher, SyntheticIO
from dgcnn_tpu.io.augment import augment_batch, augment_stream
from dgcnn_tpu.train.loop import train


def _batch():
    io = SyntheticIO(num_events=4, num_point=200, seed=0).initialize()
    return next(BucketBatcher(io, 4, num_point=256, shuffle=False).epoch())


def test_augment_preserves_distances_up_to_scale():
    batch = _batch()
    rng = np.random.RandomState(3)
    out = augment_batch(batch, rng, jitter_sigma=0.0)
    for i in range(4):
        m = batch.mask[i]
        a, b = batch.points[i, m, :3], out.points[i, m, :3]
        da = np.linalg.norm(a[0] - a[1:], axis=1)
        db = np.linalg.norm(b[0] - b[1:], axis=1)
        ratio = db / np.maximum(da, 1e-9)
        # rigid rotation x isotropic scale: all pairwise ratios equal
        np.testing.assert_allclose(ratio, ratio[0], rtol=1e-4)
        assert 0.94 <= ratio[0] <= 1.06
        # value channel untouched
        np.testing.assert_array_equal(batch.points[i, :, 3], out.points[i, :, 3])


def test_augment_padding_stays_zero_and_labels_untouched():
    batch = _batch()
    out = augment_batch(batch, np.random.RandomState(0))
    assert (out.points[~out.mask] == 0).all()
    np.testing.assert_array_equal(out.labels, batch.labels)
    np.testing.assert_array_equal(out.mask, batch.mask)


def test_augment_stream_deterministic():
    a = [b.points.copy() for b in augment_stream(iter([_batch(), _batch()]), 7)]
    b = [b.points.copy() for b in augment_stream(iter([_batch(), _batch()]), 7)]
    c = [b.points.copy() for b in augment_stream(iter([_batch(), _batch()]), 8)]
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    assert not np.array_equal(a[0], c[0])
    assert not np.array_equal(a[0], a[1])  # fresh draw per batch


def test_train_with_augment_progresses(tmp_path):
    """End-to-end: the loop trains with --augment on and the loss drops
    below the untrained level (~0.93 at init). Tight convergence bounds
    are not asserted here — per-batch random rotations make the tiny CI
    model converge slowly by design; augmentation *semantics* are pinned
    by the unit tests above and training quality by test_convergence."""
    cfg = Config(
        command="train", io_type="synthetic", iteration=60, report_step=60,
        checkpoint_step=0, num_class=2, kvalue=6, edge_filters=(16,),
        head_feat_dim=16, head_mlp=(16,), minibatch_size=4, num_point=256,
        num_devices=1, use_pallas=False, augment=True, seed=5,
        weight_prefix=str(tmp_path / "w/s"), log_dir=str(tmp_path / "log"),
    )
    m = train(cfg)
    assert np.isfinite(m["loss"]) and m["loss"] < 0.85, m
