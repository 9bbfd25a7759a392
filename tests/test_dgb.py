"""DGB binary event store: native C++ reader vs Python fallback."""

import numpy as np
import pytest

from dgcnn_tpu.config import Config
from dgcnn_tpu.io import BucketBatcher, SyntheticIO, io_factory, native
from dgcnn_tpu.io.dgb import DGBIO, write_dgb


def _events(n=12, seed=0, with_weights=True):
    io = SyntheticIO(
        num_events=n, num_point=300, seed=seed, with_weights=with_weights
    ).initialize()
    return [io.read_event(i) for i in range(n)]


@pytest.fixture(scope="module")
def dgb_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dgb") / "events.dgb")
    events = _events()
    write_dgb(path, events)
    return path, events


def test_native_library_builds():
    assert native.load() is not None, "g++ build of libdgbio.so failed"


def test_roundtrip_read_event(dgb_file):
    path, events = dgb_file
    io = DGBIO(path).initialize()
    assert io.num_events() == len(events)
    for i in (0, 5, 11):
        ev = io.read_event(i)
        np.testing.assert_allclose(ev.points, events[i].points)
        np.testing.assert_array_equal(ev.labels, events[i].labels)
        np.testing.assert_allclose(ev.weights, events[i].weights)
    io.finalize()


def test_native_batch_matches_python_batch(dgb_file):
    path, events = dgb_file
    io = DGBIO(path).initialize()
    assert io.native_active, "native path not active"
    ids = [3, 0, 7, 7]
    b_native = io.read_batch(ids, n_pad=384, crop=256)

    io_py = DGBIO(path).initialize()
    io_py._handle = None  # force the Python fallback
    b_py = io_py.read_batch(ids, n_pad=384, crop=256)

    np.testing.assert_array_equal(b_native.points, b_py.points)
    np.testing.assert_array_equal(b_native.labels, b_py.labels)
    np.testing.assert_array_equal(b_native.weights, b_py.weights)
    np.testing.assert_array_equal(b_native.mask, b_py.mask)
    np.testing.assert_array_equal(b_native.lengths, b_py.lengths)
    # mask/crop semantics
    for j, eid in enumerate(ids):
        m = min(len(events[eid]), 256)
        assert b_native.mask[j].sum() == m
        assert b_native.lengths[j] == len(events[eid])
    io.finalize()
    io_py.finalize()


def test_batcher_uses_native_path(dgb_file):
    path, events = dgb_file
    cfg = Config(io_type="dgb", input_file=path, minibatch_size=4)
    io = io_factory(cfg).initialize()
    assert isinstance(io, DGBIO)
    seen = set()
    for batch in BucketBatcher(io, 4, buckets=(256, 512), seed=0).epoch():
        assert batch.points.shape[0] == 4
        assert batch.points.shape[1] in (256, 512)
        # weights present (events carry them)
        assert batch.weights is not None
        seen.update(batch.event_ids.tolist())
    assert seen == set(range(len(events)))
    io.finalize()


def test_corrupt_file_rejected(tmp_path):
    bad = tmp_path / "bad.dgb"
    bad.write_bytes(b"NOPE" + b"\x00" * 64)
    with pytest.raises(ValueError, match="not a DGB"):
        DGBIO(str(bad)).initialize()


def test_truncated_file_rejected(dgb_file, tmp_path):
    path, _ = dgb_file
    data = open(path, "rb").read()
    trunc = tmp_path / "trunc.dgb"
    trunc.write_bytes(data[: len(data) // 2])
    with pytest.raises(ValueError, match="truncated"):
        DGBIO(str(trunc)).initialize()
