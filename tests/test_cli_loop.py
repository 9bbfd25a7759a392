"""End-to-end driver loops: train → checkpoint → resume → inference → write-back."""

import os

import numpy as np
import pytest

from dgcnn_tpu.config import Config, parse_args
from dgcnn_tpu.io import SyntheticIO, write_canonical
from dgcnn_tpu.train.loop import inference, train


def _cfg(tmp_path, **kw):
    base = dict(
        command="train",
        io_type="synthetic",
        num_class=2,
        kvalue=8,
        edge_filters=(16, 16),
        head_feat_dim=32,
        head_mlp=(32,),
        minibatch_size=8,
        num_point=192,
        iteration=150,
        report_step=5,
        checkpoint_step=10,
        learning_rate=1e-2,
        use_pallas=False,
        precision="highest",
        weight_prefix=str(tmp_path / "w/snap"),
        log_dir=str(tmp_path / "log"),
        seed=7,
    )
    base.update(kw)
    return Config(**base)


def test_parse_args_parity():
    cfg = parse_args(
        [
            "train",
            "-io", "h5", "-if", "ev.h5", "-mb", "16", "-k", "10",
            "-i", "500", "-lr", "0.005", "-mn", "residual-dgcnn",
            "--edge_filters", "32", "32", "32", "--no_shuffle",
        ]
    )
    assert cfg.command == "train"
    assert cfg.io_type == "h5" and cfg.input_file == "ev.h5"
    assert cfg.minibatch_size == 16 and cfg.kvalue == 10
    assert cfg.iteration == 500 and cfg.learning_rate == 0.005
    assert cfg.model_name == "residual-dgcnn"
    assert cfg.edge_filters == (32, 32, 32) and cfg.num_edge_conv == 3
    assert not cfg.shuffle

    inf = parse_args(["inference", "-mp", "w/snap", "-of", "out.h5"])
    assert inf.command == "inference" and inf.model_path == "w/snap"


def test_train_checkpoint_resume_inference(tmp_path):
    cfg = _cfg(tmp_path)
    metrics = train(cfg)
    assert metrics["loss"] < 0.7, metrics
    assert os.path.exists(str(tmp_path / "w/snap-150.ckpt"))
    assert os.path.exists(str(tmp_path / "log/train_log.csv"))
    with open(tmp_path / "log/train_log.csv") as f:
        header = f.readline().strip().split(",")
    assert header[:2] == ["iter", "epoch"] and "loss" in header and "titer" in header

    # resume from the final checkpoint and keep training
    cfg2 = _cfg(tmp_path, iteration=160, model_path=str(tmp_path / "w/snap"))
    m2 = train(cfg2)
    assert os.path.exists(str(tmp_path / "w/snap-160.ckpt"))

    # inference over a real file with write-back — use the same event
    # distribution the model trained on (io_factory synthetic, seed 7) so
    # accuracy checks restore correctness, not tiny-model generalization
    events_path = str(tmp_path / "events.h5")
    io = SyntheticIO(num_events=16, num_point=192, num_class=2, seed=7).initialize()
    write_canonical(events_path, [io.read_event(i) for i in range(16)], "h5")
    cfg3 = _cfg(
        tmp_path,
        command="inference",
        io_type="h5",
        input_file=events_path,
        model_path=str(tmp_path / "w/snap"),
        output_file=str(tmp_path / "pred.h5"),
        shuffle=False,
        iteration=0,
    )
    summary = inference(cfg3)
    assert summary["acc"] > 0.65, summary
    import h5py

    with h5py.File(tmp_path / "pred.h5", "r") as f:
        assert set(f.keys()) >= {"data", "event_ids", "offsets", "prediction"}
        ids = np.asarray(f["event_ids"])
        off = np.asarray(f["offsets"])
        assert len(ids) == 16
        # every event's prediction count matches its true (≤cropped) size
        for j, eid in enumerate(ids):
            n_pred = off[j + 1] - off[j]
            assert 0 < n_pred <= 192
            assert n_pred == min(len(io.read_event(int(eid))), 192)


def test_multi_bucket_training(tmp_path):
    """Variable-length events spanning several buckets: one jit entry per
    bucket shape, one run."""
    from dgcnn_tpu.io import SyntheticIO, write_canonical

    io = SyntheticIO(num_events=24, num_point=700, seed=13).initialize()
    path = str(tmp_path / "var.h5")
    write_canonical(path, [io.read_event(i) for i in range(24)], "h5")
    cfg = _cfg(
        tmp_path,
        io_type="h5",
        input_file=path,
        num_point=0,
        buckets=(256, 512, 1024),
        iteration=6,
        report_step=3,
        checkpoint_step=0,
    )
    metrics = train(cfg)
    assert np.isfinite(metrics["loss"])


def test_profile_dir_writes_trace(tmp_path):
    cfg = _cfg(
        tmp_path,
        iteration=2,
        report_step=2,
        checkpoint_step=0,
        profile_dir=str(tmp_path / "prof"),
    )
    train(cfg)
    import glob

    files = glob.glob(str(tmp_path / "prof/**/*"), recursive=True)
    assert any("trace" in f or f.endswith(".pb") or f.endswith(".json.gz") for f in files), files


def test_inference_without_labels(tmp_path):
    """Scoring runs on unlabeled events: write-back works, metrics are
    meaningless-but-harmless (labels default to zeros)."""
    import h5py

    from dgcnn_tpu.io import SyntheticIO

    # train briefly
    cfg = _cfg(tmp_path, iteration=5, report_step=5, checkpoint_step=0)
    train(cfg)
    # unlabeled input file (canonical layout without a label dataset)
    io = SyntheticIO(num_events=6, num_point=192, num_class=2, seed=7).initialize()
    events = [io.read_event(i) for i in range(6)]
    path = str(tmp_path / "unlabeled.h5")
    pts = np.concatenate([e.points for e in events])
    offsets = np.zeros(len(events) + 1, np.int64)
    np.cumsum([len(e) for e in events], out=offsets[1:])
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=pts)
        f.create_dataset("offsets", data=offsets)
    cfg2 = _cfg(
        tmp_path,
        command="inference",
        io_type="h5",
        input_file=path,
        model_path=str(tmp_path / "w/snap"),
        output_file=str(tmp_path / "pred_unlabeled.h5"),
        shuffle=False,
        iteration=0,
    )
    summary = inference(cfg2)
    assert summary["batches"] >= 1
    with h5py.File(tmp_path / "pred_unlabeled.h5") as f:
        assert len(f["event_ids"]) == 6
        assert len(f["prediction"]) == sum(min(len(e), 192) for e in events)


def test_inference_adopts_checkpoint_model_flags(tmp_path, capsys):
    """kvalue/knn_every change predictions without changing parameter
    shapes — inference must adopt the checkpoint's model-defining flags
    so forgetting to repeat them cannot silently serve a different
    model."""
    import dataclasses

    from dgcnn_tpu.io.synthetic import write_canonical as _wc
    from dgcnn_tpu.io import SyntheticIO as _S

    events = [
        _S(num_events=8, num_point=96, seed=3).initialize().read_event(i)
        for i in range(8)
    ]
    data = str(tmp_path / "ev.h5")
    _wc(data, events, "h5")

    trained = _cfg(
        tmp_path, kvalue=5, knn_every=2, iteration=6, checkpoint_step=0,
        io_type="h5", input_file=data, minibatch_size=8, num_point=96,
    )
    train(trained)
    ckpt = str(tmp_path / "w/snap-6.ckpt")
    assert os.path.exists(ckpt)

    def infer(cfg_kw, out):
        cfg = _cfg(
            tmp_path, command="inference", io_type="h5", input_file=data,
            minibatch_size=8, num_point=96, model_path=ckpt,
            output_file=str(tmp_path / out), iteration=0,
            log_dir=str(tmp_path / "log_inf"), **cfg_kw,
        )
        return inference(cfg)

    # matching flags = ground truth; DEFAULT flags (k=8, knn_every=1 from
    # _cfg) must be overridden by adoption and give identical metrics
    m_match = infer(dict(kvalue=5, knn_every=2), "a.h5")
    capsys.readouterr()
    m_default = infer({}, "b.h5")
    out = capsys.readouterr().out
    assert "adopting model flags from checkpoint" in out
    assert "knn_every=2" in out and "kvalue=5" in out
    assert m_match["acc"] == m_default["acc"]
    assert m_match["miou"] == m_default["miou"]
    import h5py

    with h5py.File(tmp_path / "a.h5") as fa, h5py.File(tmp_path / "b.h5") as fb:
        np.testing.assert_array_equal(fa["scores"][:], fb["scores"][:])


def test_resume_warns_on_model_flag_mismatch(tmp_path, capsys):
    cfg = _cfg(tmp_path, iteration=4, checkpoint_step=0, kvalue=6)
    train(cfg)
    capsys.readouterr()
    import dataclasses

    cfg2 = dataclasses.replace(
        cfg, kvalue=8, iteration=6,
        model_path=str(tmp_path / "w/snap-4.ckpt"),
    )
    train(cfg2)
    out = capsys.readouterr().out
    assert "WARNING: model flags differ" in out and "kvalue" in out


def _untrained_serving_setup(tmp_path, num_events=40):
    """Events file + untrained checkpoint: enough for serving-loop tests
    that exercise loop mechanics rather than model quality."""
    from dgcnn_tpu.train.checkpoint import save
    from dgcnn_tpu.train.trainval import Trainval

    io = SyntheticIO(
        num_events=num_events, num_point=192, num_class=2, seed=7
    ).initialize()
    events_path = str(tmp_path / "ev.h5")
    write_canonical(events_path, [io.read_event(i) for i in range(num_events)], "h5")
    cfg = _cfg(tmp_path, checkpoint_step=0)
    tv = Trainval(cfg)
    state = tv.initialize(io.read_event(0).points.shape[1])
    ckpt = save(str(tmp_path / "w/snap"), 0, state, vars(cfg))
    return events_path, ckpt


def test_inference_worker_error_propagates(tmp_path, monkeypatch):
    """A write-back failure in the consume worker thread must surface as
    the loop's exception (not deadlock, not be swallowed) and must skip
    writer.finalize so no partial output file appears."""
    from dgcnn_tpu.train import loop as loop_mod

    events_path, ckpt = _untrained_serving_setup(tmp_path)

    class _BoomWriter:
        def __init__(self, path):
            self.path = path

        def store_segment(self, *a, **kw):
            raise RuntimeError("disk full (injected)")

        def finalize(self):  # pragma: no cover - must NOT be reached
            raise AssertionError("finalize must be skipped after a worker error")

        def __len__(self):
            return 0

    monkeypatch.setattr(loop_mod, "SegmentWriter", _BoomWriter)
    cfg = _cfg(
        tmp_path, command="inference", io_type="h5", input_file=events_path,
        model_path=ckpt,
        output_file=str(tmp_path / "pred.h5"), shuffle=False, iteration=0,
    )
    with pytest.raises(RuntimeError, match="disk full"):
        loop_mod.inference(cfg)
    assert not os.path.exists(tmp_path / "pred.h5")


def test_inference_cm_flush_invariance(tmp_path, monkeypatch):
    """Flushing the on-device confusion accumulator every batch must give
    metrics identical to the default (rare-flush) cadence, and the
    mid-loop + residual flush paths must not double count."""
    from dgcnn_tpu.train import loop as loop_mod

    events_path, ckpt = _untrained_serving_setup(tmp_path)

    def run(out):
        cfg = _cfg(
            tmp_path, command="inference", io_type="h5",
            input_file=events_path, model_path=ckpt,
            output_file=str(tmp_path / out), shuffle=False, iteration=0,
            log_dir=str(tmp_path / "log_inf"),
        )
        return loop_mod.inference(cfg)

    base = run("a.h5")
    monkeypatch.setattr(loop_mod, "_CM_FLUSH_POINTS", 1)
    frequent = run("b.h5")
    assert base["batches"] == frequent["batches"] == 5
    assert base["acc"] == frequent["acc"]
    assert base["miou"] == frequent["miou"]
