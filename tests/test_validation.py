"""--val_file: periodic held-out evaluation during training."""

from dgcnn_tpu.config import Config
from dgcnn_tpu.io import SyntheticIO, write_canonical
from dgcnn_tpu.train.loop import train


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
