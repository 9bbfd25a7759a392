"""Model-level fuzz: random event shapes, masks and hyperparameters must
never produce NaN/inf losses or gradients through the full train step
(complements test_knn_fuzz.py's kernel-level fuzz)."""

import numpy as np
import pytest

from dgcnn_tpu.config import Config
from dgcnn_tpu.io.batching import Batch
from dgcnn_tpu.train.trainval import Trainval


def _random_batch(rng, b, n, num_class, all_padded_row=False):
    points = rng.randn(b, n, 4).astype(np.float32) * rng.uniform(0.1, 10)
    labels = rng.randint(0, num_class, (b, n)).astype(np.int32)
    weights = rng.gamma(1.0, 1.0, (b, n)).astype(np.float32)
    mask = np.zeros((b, n), bool)
    for i in range(b):
        mask[i, : rng.randint(1, n + 1)] = True
    if all_padded_row:
        mask[-1] = False  # a fully-empty event slot (remainder filler)
    return Batch(points, labels, weights, mask, np.arange(b), mask.sum(1))


@pytest.mark.parametrize("case", range(4))
def test_train_step_finite_under_fuzz(case):
    rng = np.random.RandomState(100 + case)
    b = int(rng.choice([1, 2, 4]))
    n = int(rng.choice([128, 256, 384]))
    k = int(rng.choice([3, 8, 17]))
    blocks = tuple(int(x) for x in rng.choice([8, 16], size=rng.randint(1, 4)))
    cfg = Config(
        model_name=str(rng.choice(["dgcnn", "residual-dgcnn"])),
        num_class=int(rng.choice([2, 4])),
        kvalue=k,
        edge_filters=blocks,
        head_feat_dim=16,
        head_mlp=(16,),
        minibatch_size=b,
        num_point=n,
        num_devices=1,
        use_pallas=False,
        dropout=float(rng.choice([0.0, 0.3])),
        remat=bool(rng.randint(2)),
        knn_every=int(rng.choice([1, 2, 3])),
        # banded windows must stay >= kvalue (flag validation); 0 = exact
        knn_window=int(rng.choice([0, 0, max(k, 32), n])),
        precision=str(rng.choice(["highest", "bfloat16"])),
        block_impl=str(rng.choice(["auto", "edge", "reduced", "fused"])),
        block_convs=int(rng.choice([1, 1, 2])),
        block_scan=str(rng.choice(["auto", "on", "off"])),
        seed=case,
    )
    tv = Trainval(cfg)
    state = tv.initialize(4)
    batch = _random_batch(rng, b, n, cfg.num_class, all_padded_row=(case == 2))
    for _ in range(2):
        state, metrics = tv.train_step(state, batch)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), metrics
    if batch.mask.any():
        assert loss > 0, metrics
    else:
        # a fully-padded batch legitimately yields zero loss (and must
        # not poison params — checked below)
        assert loss == 0, metrics
    assert 0.0 <= float(metrics["acc"]) <= 1.0
    for leaf in __import__("jax").tree_util.tree_leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all(), "non-finite params"


@pytest.mark.parametrize("case", range(2))
def test_train_step_finite_under_cp_fuzz(case):
    """Context-parallel fuzz: random masks/hyperparams through the
    sharded step on a (data x points) mesh, exact-ring AND banded-halo
    graph builds (knn_window 0 vs >0), must stay finite."""
    from dgcnn_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(300 + case)
    data, points = (2, 2) if case == 0 else (1, 4)
    n = 256
    k = int(rng.choice([4, 8]))
    cfg = Config(
        model_name=str(rng.choice(["dgcnn", "residual-dgcnn"])),
        num_class=2,
        kvalue=k,
        edge_filters=(8, 8),
        head_feat_dim=16,
        head_mlp=(16,),
        minibatch_size=data,
        num_point=n,
        point_shards=points,
        num_devices=data * points,
        use_pallas=False,
        dropout=float(rng.choice([0.0, 0.3])),
        remat=bool(rng.randint(2)),
        knn_every=int(rng.choice([1, 2])),
        # 0 = exact ring CP; 32/64 = banded halo CP (w <= n/points)
        knn_window=int(rng.choice([0, 32, 64])),
        precision="highest",
        # auto = fused under banded CP (halo-decomposed gather), edge
        # under the exact ring; explicit fused falls through to reduced
        # on the exact ring — all four must stay finite either way
        block_impl=str(rng.choice(["auto", "edge", "reduced", "fused"])),
        block_scan=str(rng.choice(["auto", "on", "off"])),
        seed=case,
    )
    cfg.validate()
    tv = Trainval(cfg, mesh=make_mesh(data * points, num_point_shards=points))
    state = tv.initialize(4)
    batch = _random_batch(rng, data, n, cfg.num_class)
    for _ in range(2):
        state, metrics = tv.train_step(state, batch)
    loss = float(metrics["loss"])
    assert np.isfinite(loss) and loss > 0, metrics
    for leaf in __import__("jax").tree_util.tree_leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all(), "non-finite params"
