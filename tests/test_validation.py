"""--val_file: periodic held-out evaluation during training."""

import numpy as np

from dgcnn_tpu.config import Config
from dgcnn_tpu.io import SyntheticIO, write_canonical
from dgcnn_tpu.train.loop import train


def _cfg(tmp_path, **kw):
    base = dict(
        command="train",
        io_type="synthetic",
        num_class=2,
        kvalue=6,
        edge_filters=(8,),
        head_feat_dim=16,
        head_mlp=(16,),
        minibatch_size=4,
        num_point=96,
        iteration=6,
        report_step=3,
        checkpoint_step=0,
        val_batches=2,
        use_pallas=False,
        precision="highest",
        weight_prefix=str(tmp_path / "w/s"),
        log_dir=str(tmp_path / "log"),
        seed=5,
        num_devices=1,
    )
    base.update(kw)
    return Config(**base)


def test_val_metrics_in_report(tmp_path):
    tr = SyntheticIO(num_events=16, num_point=128, seed=0).initialize()
    va = SyntheticIO(num_events=8, num_point=128, seed=9).initialize()
    tr_path, va_path = str(tmp_path / "tr.h5"), str(tmp_path / "va.h5")
    write_canonical(tr_path, [tr.read_event(i) for i in range(16)], "h5")
    write_canonical(va_path, [va.read_event(i) for i in range(8)], "h5")

    cfg = Config(
        command="train",
        io_type="h5",
        input_file=tr_path,
        val_file=va_path,
        val_batches=2,
        num_class=2,
        kvalue=6,
        edge_filters=(8,),
        head_feat_dim=16,
        head_mlp=(16,),
        minibatch_size=8,
        num_point=128,
        iteration=6,
        report_step=3,
        checkpoint_step=0,
        use_pallas=False,
        precision="highest",
        weight_prefix=str(tmp_path / "w/s"),
        log_dir=str(tmp_path / "log"),
        seed=5,
    )
    train(cfg)
    with open(tmp_path / "log/train_log.csv") as f:
        header = f.readline().strip().split(",")
        rows = f.read().strip().split("\n")
    for col in ("val_loss", "val_acc", "val_miou"):
        assert col in header, header
    assert len(rows) == 2  # report at 3 and 6
    vals = dict(zip(header, rows[0].split(",")))
    assert 0.0 <= float(vals["val_acc"]) <= 1.0


def test_val_file_format_follows_its_extension(tmp_path):
    """`-io dgb -vf val.h5` must read the val file as HDF5 — the val
    reader dispatches on the val file's own extension, not the training
    io_type (found by a production-rehearsal run that died with 'not a
    DGB file')."""
    from dgcnn_tpu.io import SyntheticIO, write_canonical
    from dgcnn_tpu.io.dgb import write_dgb

    events = [
        SyntheticIO(num_events=8, num_point=96, seed=1).initialize().read_event(i)
        for i in range(8)
    ]
    train_path = str(tmp_path / "tr.dgb")
    val_path = str(tmp_path / "val.h5")
    write_dgb(train_path, events)
    write_canonical(val_path, events[:4], "h5")

    cfg = _cfg(
        tmp_path, io_type="dgb", input_file=train_path, val_file=val_path,
        iteration=4, report_step=2,
    )
    train(cfg)
    with open(tmp_path / "log/train_log.csv") as f:
        header = f.readline().strip().split(",")
        row = dict(zip(header, f.readline().strip().split(",")))
    assert "val_loss" in row and np.isfinite(float(row["val_loss"]))


def test_early_stopping_on_stale_val_loss(tmp_path):
    """--early_stop_patience halts training when val_loss stops
    improving (lr=0 makes every validation identical, so the run must
    stop after 1 + patience validations instead of reaching
    --iteration)."""
    import glob

    from dgcnn_tpu.io import SyntheticIO, write_canonical

    events = [
        SyntheticIO(num_events=4, num_point=96, seed=2).initialize().read_event(i)
        for i in range(4)
    ]
    val_path = str(tmp_path / "v.h5")
    write_canonical(val_path, events, "h5")
    cfg = _cfg(
        tmp_path, val_file=val_path, iteration=100, report_step=2,
        learning_rate=0.0, early_stop_patience=2,
    )
    train(cfg)
    ckpts = glob.glob(str(tmp_path / "w/s-*.ckpt"))
    final = max(int(p.rsplit("-", 1)[1].split(".")[0]) for p in ckpts)
    # validations at iters 2,4,6: first sets best, next two are stale ->
    # stop at iter 6, far short of the configured 100
    assert final <= 10, f"early stopping did not fire (ran to {final})"
