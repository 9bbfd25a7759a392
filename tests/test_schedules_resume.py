"""LR schedules and auto-resume."""

import os

import numpy as np
import pytest

from dgcnn_tpu.config import Config
from dgcnn_tpu.train.loop import train

SMALL = dict(
    command="train",
    io_type="synthetic",
    num_class=2,
    kvalue=6,
    edge_filters=(8,),
    head_feat_dim=16,
    head_mlp=(16,),
    minibatch_size=8,
    num_point=128,
    report_step=4,
    checkpoint_step=4,
    use_pallas=False,
    precision="highest",
    seed=11,
)


def _cfg(tmp_path, **kw):
    base = dict(
        SMALL,
        weight_prefix=str(tmp_path / "w/s"),
        log_dir=str(tmp_path / "log"),
    )
    base.update(kw)
    return Config(**base)


@pytest.mark.parametrize("sched", ["cosine", "step"])
def test_lr_schedules_train(tmp_path, sched):
    cfg = _cfg(
        tmp_path, iteration=8, lr_schedule=sched, learning_rate=1e-2,
        lr_decay_steps=4,
    )
    m = train(cfg)
    assert np.isfinite(m["loss"])


def test_auto_resume_continues(tmp_path):
    m1 = train(_cfg(tmp_path, iteration=8))
    assert os.path.exists(tmp_path / "w/s-8.ckpt")
    # second invocation with auto_resume picks up step 8 and continues
    m2 = train(_cfg(tmp_path, iteration=12, auto_resume=True))
    assert os.path.exists(tmp_path / "w/s-12.ckpt")
    # and a run without auto_resume IGNORES the existing step-12
    # checkpoint in the SAME directory: it trains from step 0 and its
    # final save is s-8 (a regression that always resumed would do zero
    # steps past 12 and never produce a step-8 save from this config)
    import csv as _csv

    m3 = train(_cfg(tmp_path, iteration=8))
    assert os.path.exists(tmp_path / "w/s-8.ckpt")
    # a cold (non-resume) run truncates the CSV and reports from step 0:
    # its first data row must be an early iteration, not a post-12 one
    with open(tmp_path / "log/train_log.csv") as f:
        first_new = int(next(_csv.DictReader(f))["iter"])
    assert first_new <= 5, (
        f"cold run did not start from step 0 (first report iter {first_new})"
    )


def test_max_to_keep_prunes_old_checkpoints(tmp_path):
    cfg = _cfg(tmp_path, iteration=9)
    import dataclasses
    cfg = dataclasses.replace(cfg, checkpoint_step=2, max_to_keep=2)
    train(cfg)
    import glob
    ckpts = sorted(glob.glob(str(tmp_path / "w/s-*.ckpt")))
    # max_to_keep bounds the history INCLUDING the final save — the
    # state a consumer sees at run end must honor the flag
    steps = sorted(int(p.rsplit("-", 1)[1].split(".")[0]) for p in ckpts)
    assert len(steps) == 2 and steps[-1] == 9, steps
    assert steps[0] == 8, steps  # everything older pruned


def test_lr_column_reported(tmp_path):
    cfg = _cfg(tmp_path, iteration=4, lr_schedule="cosine", learning_rate=1e-2,
               lr_decay_steps=8)
    train(cfg)
    with open(tmp_path / "log/train_log.csv") as f:
        header = f.readline().strip().split(",")
        row = f.readline().strip().split(",")
    assert "lr" in header
    lr = float(row[header.index("lr")])
    # the row for iteration 4 reports the rate the 4th update actually
    # applied = schedule(count=3) (optax indexes by prior-update count),
    # not the next step's rate: cosine at 3 of an 8-step horizon
    expect = 0.5e-2 * (1 + np.cos(np.pi * 3 / 8))
    np.testing.assert_allclose(lr, expect, rtol=1e-4)
