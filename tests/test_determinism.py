"""Seed determinism: identical flags + seed → identical trajectory."""

import numpy as np

from dgcnn_tpu.config import Config
from dgcnn_tpu.train.loop import train


def _cfg(tmp_path, tag, **kw):
    base = dict(
        command="train",
        io_type="synthetic",
        num_class=2,
        kvalue=6,
        edge_filters=(8,),
        head_feat_dim=16,
        head_mlp=(16,),
        minibatch_size=8,
        num_point=128,
        iteration=8,
        report_step=4,
        checkpoint_step=0,
        learning_rate=1e-2,
        use_pallas=False,
        precision="highest",
        weight_prefix=str(tmp_path / f"w{tag}/snap"),
        log_dir=str(tmp_path / f"log{tag}"),
        seed=21,
    )
    base.update(kw)
    return Config(**base)


def test_same_seed_same_trajectory(tmp_path):
    m1 = train(_cfg(tmp_path, "a"))
    m2 = train(_cfg(tmp_path, "b"))
    assert m1 == m2, (m1, m2)
    # CSV logs match except the timing column
    rows = []
    for tag in ("a", "b"):
        with open(tmp_path / f"log{tag}/train_log.csv") as f:
            rows.append(
                [line.rsplit(",", 1)[0] for line in f.read().strip().split("\n")]
            )
    assert rows[0] == rows[1]


def test_different_seed_differs(tmp_path):
    m1 = train(_cfg(tmp_path, "c", seed=21))
    m2 = train(_cfg(tmp_path, "d", seed=22))
    assert m1 != m2
