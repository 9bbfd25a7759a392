"""IO subsystem: readers round-trip, bucketed batching, prefetch, write-back."""

import numpy as np
import pytest

from dgcnn_tpu.config import Config
from dgcnn_tpu.io import (
    BucketBatcher,
    CSVIO,
    SegmentWriter,
    SyntheticIO,
    io_factory,
    pad_events,
    prefetch,
    write_canonical,
)
from dgcnn_tpu.io.readers import Event


def _make_events(n=10, seed=0, with_weights=False):
    io = SyntheticIO(
        num_events=n, num_point=300, seed=seed, with_weights=with_weights
    ).initialize()
    return [io.read_event(i) for i in range(n)]


@pytest.mark.parametrize("fmt,ext", [("h5", "h5"), ("npz", "npz")])
def test_canonical_roundtrip(tmp_path, fmt, ext):
    events = _make_events(with_weights=True)
    path = str(tmp_path / f"ev.{ext}")
    write_canonical(path, events, fmt)
    cfg = Config(io_type=fmt, input_file=path, weight_key="weight")
    io = io_factory(cfg).initialize()
    assert io.num_events() == len(events)
    for i in (0, 3, 9):
        ev = io.read_event(i)
        np.testing.assert_allclose(ev.points, events[i].points)
        np.testing.assert_array_equal(ev.labels, events[i].labels)
        np.testing.assert_allclose(ev.weights, events[i].weights, rtol=1e-6)
    io.finalize()


def test_csv_roundtrip(tmp_path):
    events = _make_events(4)
    path = str(tmp_path / "ev.csv")
    with open(path, "w") as f:
        f.write("event_id,x,y,z,value,label\n")
        for e in events:
            for p, l in zip(e.points, e.labels):
                f.write(f"{e.id},{p[0]},{p[1]},{p[2]},{p[3]},{l}\n")
    io = CSVIO(path).initialize()
    assert io.num_events() == 4
    ev = io.read_event(2)
    np.testing.assert_allclose(ev.points, events[2].points, rtol=1e-5)
    np.testing.assert_array_equal(ev.labels, events[2].labels)


def test_pad_events_crop_and_pad():
    events = _make_events(3)
    batch = pad_events(events, 256, crop_mode="random", seed=0)
    assert batch.points.shape == (3, 256, 4)
    for i, e in enumerate(events):
        m = min(len(e), 256)
        assert batch.mask[i, :m].all() and not batch.mask[i, m:].any()
        assert batch.lengths[i] == len(e)


def test_bucket_batcher_shapes_and_coverage():
    io = SyntheticIO(num_events=13, num_point=700, seed=1).initialize()
    b = BucketBatcher(io, batch_size=4, buckets=(256, 512, 1024), seed=0)
    seen = set()
    for batch in b.epoch():
        assert batch.points.shape[0] == 4
        n = batch.points.shape[1]
        assert n % 128 == 0 and n in (256, 512, 1024)
        # bucket is the smallest that fits
        assert batch.mask.sum(axis=1).max() <= n
        seen.update(batch.event_ids.tolist())
    assert seen == set(range(13))  # every event appears despite fill-up


def test_bucket_batcher_fixed_num_point():
    io = SyntheticIO(num_events=8, num_point=700, seed=2).initialize()
    b = BucketBatcher(io, batch_size=4, num_point=300, seed=0)
    for batch in b.epoch():
        assert batch.points.shape[1] == 384  # 300 rounded to lane multiple
        assert batch.mask.sum(axis=1).max() <= 300


def test_prefetch_order_and_errors():
    assert list(prefetch(iter(range(50)), 4)) == list(range(50))

    def boom():
        yield 1
        raise RuntimeError("reader failed")

    it = prefetch(boom(), 2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="reader failed"):
        next(it)


@pytest.mark.parametrize("ext", ["h5", "npz", "csv"])
def test_segment_writer_roundtrip(tmp_path, ext):
    path = str(tmp_path / f"out.{ext}")
    w = SegmentWriter(path)
    rng = np.random.RandomState(0)
    recs = {}
    for eid in (3, 1, 1, 2):  # duplicate id 1 → first wins
        pts = rng.randn(5 + eid, 4).astype(np.float32)
        pred = rng.randint(0, 3, len(pts)).astype(np.int32)
        scores = rng.rand(len(pts), 3).astype(np.float32)
        w.store_segment(eid, pts, pred, scores)
        recs.setdefault(eid, (pts, pred, scores))
    assert len(w) == 3
    w.finalize()
    if ext == "csv":
        import csv

        with open(path) as f:
            rows = list(csv.reader(f))
        assert rows[0][:6] == ["event_id", "x", "y", "z", "value", "prediction"]
        assert len(rows) - 1 == sum(len(r[0]) for r in recs.values())
    else:
        if ext == "h5":
            import h5py

            with h5py.File(path, "r") as f:
                data = {k: np.asarray(f[k]) for k in f}
        else:
            with np.load(path) as z:
                data = {k: z[k] for k in z}
        np.testing.assert_array_equal(data["event_ids"], [1, 2, 3])
        off = data["offsets"]
        for j, eid in enumerate([1, 2, 3]):
            np.testing.assert_array_equal(
                data["prediction"][off[j] : off[j + 1]], recs[eid][1]
            )
            np.testing.assert_allclose(
                data["scores"][off[j] : off[j + 1]], recs[eid][2]
            )


def test_csv_weight_column(tmp_path):
    path = str(tmp_path / "w.csv")
    with open(path, "w") as f:
        f.write("event_id,x,y,z,value,label,weight\n")
        for i in range(4):
            f.write(f"0,{i},0,0,1.0,{i % 2},{0.5 + i}\n")
    io = CSVIO(path).initialize()
    ev = io.read_event(0)
    np.testing.assert_allclose(ev.weights, [0.5, 1.5, 2.5, 3.5])
    np.testing.assert_array_equal(ev.labels, [0, 1, 0, 1])


def test_convert_any_to_any_roundtrip(tmp_path):
    """`convert` (any->any by extension) preserves events incl. weights."""
    from dgcnn_tpu.io.convert import main as convert_main
    from dgcnn_tpu.io.readers import H5IO, NPZIO

    convert_main(["synth", str(tmp_path / "a.h5"), "--events", "5",
                  "--points", "150", "--weights"])
    convert_main(["convert", str(tmp_path / "a.h5"), str(tmp_path / "a.dgb")])
    convert_main(["convert", str(tmp_path / "a.dgb"), str(tmp_path / "a.npz")])
    h5 = H5IO(str(tmp_path / "a.h5"), "data", "label", "weight").initialize()
    npz = NPZIO(str(tmp_path / "a.npz"), "data", "label", "weight").initialize()
    assert h5.num_events() == npz.num_events() == 5
    for i in range(5):
        a, b = h5.read_event(i), npz.read_event(i)
        np.testing.assert_allclose(a.points, b.points, rtol=1e-6)
        np.testing.assert_array_equal(a.labels, b.labels)
        np.testing.assert_allclose(a.weights, b.weights, rtol=1e-6)


def _rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024
    return 0.0


def test_segment_writer_flat_rss(tmp_path):
    """VERDICT r2 #4: write-back far beyond any in-RAM budget must keep
    host RSS flat (the old writer accumulated every event until
    finalize). ~180 MB of predictions, RSS growth bounded well below
    the payload size."""
    rng = np.random.RandomState(0)
    pts = rng.randn(4096, 4).astype(np.float32)
    pred = rng.randint(0, 2, 4096).astype(np.int32)
    sc = rng.rand(4096, 2).astype(np.float32)
    path = str(tmp_path / "big.h5")
    w = SegmentWriter(path)
    base = _rss_mb()
    n_events = 1600  # ~184 MB total payload
    for e in range(n_events):
        w.store_segment(e, pts, pred, sc)
    grew_store = _rss_mb() - base
    w.finalize()
    grew_total = _rss_mb() - base
    import os

    assert os.path.getsize(path) > 150e6
    assert grew_store < 60, f"store leaked {grew_store:.0f} MB into RSS"
    assert grew_total < 90, f"finalize leaked {grew_total:.0f} MB into RSS"
    import h5py

    with h5py.File(path) as f:
        assert f["data"].shape == (n_events * 4096, 4)
        np.testing.assert_array_equal(f["event_ids"][:5], np.arange(5))


def test_write_stream_matches_write_any(tmp_path):
    """Streaming converter output is array-identical to the in-RAM path."""
    from dgcnn_tpu.io.convert import write_any, write_stream
    from dgcnn_tpu.io.dgb import DGBIO
    from dgcnn_tpu.io.readers import H5IO, NPZIO

    io = SyntheticIO(
        num_events=7, num_point=60, seed=3, variable_length=True,
        with_weights=True,
    ).initialize()
    events = [io.read_event(i) for i in range(7)]
    readers = {"h5": H5IO, "npz": NPZIO, "dgb": DGBIO}
    for ext, reader in readers.items():
        a = str(tmp_path / f"a.{ext}")
        b = str(tmp_path / f"b.{ext}")
        write_any(a, events)
        n, total = write_stream(b, iter(events))
        assert (n, total) == (7, sum(len(e) for e in events))
        ra, rb = reader(a).initialize(), reader(b).initialize()
        assert ra.num_events() == rb.num_events() == 7
        for i in range(7):
            ea, eb = ra.read_event(i), rb.read_event(i)
            np.testing.assert_array_equal(ea.points, eb.points)
            np.testing.assert_array_equal(ea.labels, eb.labels)
            np.testing.assert_array_equal(ea.weights, eb.weights)
        ra.finalize(), rb.finalize()


def test_write_stream_mixed_labels_dropped(tmp_path):
    from dgcnn_tpu.io.convert import write_stream
    from dgcnn_tpu.io.readers import Event, H5IO

    evs = [
        Event(0, np.zeros((4, 4), np.float32), np.zeros(4, np.int32), None),
        Event(1, np.ones((3, 4), np.float32), None, None),
    ]
    path = str(tmp_path / "m.h5")
    write_stream(path, iter(evs))
    r = H5IO(path).initialize()
    assert r.num_events() == 2
    assert r.read_event(0).labels is None  # mixed -> dropped, like write_any
    r.finalize()


@pytest.mark.parametrize("ext", ["h5", "npz", "csv"])
def test_segment_writer_all_empty_events(tmp_path, ext):
    """Zero-point events exist in real dumps; an all-empty run must still
    produce a structurally complete output (and clean up its temps)."""
    import os

    path = str(tmp_path / f"empty.{ext}")
    w = SegmentWriter(path)
    for eid in range(3):
        w.store_segment(
            eid,
            np.zeros((0, 4), np.float32),
            np.zeros((0,), np.int32),
            np.zeros((0, 2), np.float32),
        )
    w.finalize()
    assert not [f for f in os.listdir(tmp_path) if ".tmp." in f]
    if ext == "csv":
        with open(path) as f:
            rows = f.read().strip().splitlines()
        assert len(rows) == 1  # header only
    elif ext == "h5":
        import h5py

        with h5py.File(path) as f:
            assert f["data"].shape == (0, 4)
            np.testing.assert_array_equal(f["event_ids"][:], [0, 1, 2])
            np.testing.assert_array_equal(f["offsets"][:], [0, 0, 0, 0])
    else:
        with np.load(path) as z:
            assert z["data"].shape == (0, 4)
            np.testing.assert_array_equal(z["event_ids"], [0, 1, 2])
