"""Regression tests for the round-1 self-review findings."""

import threading
import time

import numpy as np
import pytest

from dgcnn_tpu.io import BucketBatcher, SyntheticIO, prefetch
from dgcnn_tpu.io.dgb import DGBIO, write_dgb
from dgcnn_tpu.io.readers import SubsetIO


def test_remainder_fill_slots_are_fully_masked():
    """Filler duplicates in a short remainder batch must not contribute
    to loss/metrics: their masks are all-False."""
    io = SyntheticIO(num_events=9, num_point=200, seed=0).initialize()
    b = BucketBatcher(io, batch_size=8, buckets=(256,), shuffle=False)
    batches = list(b.epoch())
    assert len(batches) == 2
    last = batches[1]
    assert last.mask[0].any()  # the one real event
    assert not last.mask[1:].any()  # seven filler slots contribute nothing


def test_remainder_fill_masked_native_path(tmp_path):
    io = SyntheticIO(num_events=5, num_point=200, seed=1).initialize()
    path = str(tmp_path / "e.dgb")
    write_dgb(path, [io.read_event(i) for i in range(5)])
    dgb = DGBIO(path).initialize()
    b = BucketBatcher(dgb, batch_size=4, buckets=(256,), shuffle=False)
    batches = list(b.epoch())
    last = batches[-1]
    assert last.mask[0].any() and not last.mask[1:].any()
    dgb.finalize()


def test_prefetch_close_joins_worker():
    """Breaking out early and closing the stream must stop the worker
    before the reader is torn down (DGB munmap use-after-free guard)."""
    state = {"alive": True, "produced": 0}

    def gen():
        while True:
            state["produced"] += 1
            yield state["produced"]

    it = prefetch(gen(), size=2)
    assert next(it) == 1
    # identify the worker by name — asserting on the GLOBAL thread count
    # races with unrelated pool threads starting/stopping
    workers = [
        t for t in threading.enumerate() if t.name == "dgcnn-prefetch"
    ]
    assert workers, "prefetch worker not found"
    it.close()
    for t in workers:
        t.join(timeout=3.0)
    assert all(not t.is_alive() for t in workers)  # worker exited
    produced_after_close = state["produced"]
    time.sleep(0.3)
    assert state["produced"] == produced_after_close  # no more production


def test_subset_io_offsets_and_ids(tmp_path):
    io = SyntheticIO(num_events=10, num_point=100, seed=2).initialize()
    path = str(tmp_path / "s.dgb")
    write_dgb(path, [io.read_event(i) for i in range(10)])
    dgb = DGBIO(path).initialize()
    sub = SubsetIO(dgb, 4, 8).initialize()
    assert sub.num_events() == 4
    np.testing.assert_array_equal(sub.event_lengths(), dgb.event_lengths()[4:8])
    np.testing.assert_allclose(sub.read_event(0).points, dgb.read_event(4).points)
    batch = sub.read_batch([0, 3], n_pad=128, crop=128)
    np.testing.assert_array_equal(batch.event_ids, [4, 7])
    dgb.finalize()


def test_corrupt_dgb_header_fails_cleanly(tmp_path):
    """A header claiming a huge num_events must not crash the C++ reader."""
    import struct

    bad = tmp_path / "huge.dgb"
    bad.write_bytes(b"DGB1" + struct.pack("<IQII", 4, 10**15, 0, 0) + b"\0" * 64)
    from dgcnn_tpu.io import native

    lib = native.load()
    if lib is not None:
        handle = lib.dgb_open(str(bad).encode())
        assert not handle  # clean rejection, no segfault
    with pytest.raises(ValueError):
        DGBIO(str(bad)).initialize()


def test_model_init_many_blocks():
    """>64 RNG draws must not exhaust the key pool."""
    import jax

    from dgcnn_tpu.models import ModelSpec, get_model

    spec = ModelSpec(num_class=2, k=4, edge_filters=(4,) * 40, head_feat_dim=8, head_mlp=(8,))
    model = get_model("residual-dgcnn", spec)
    params, state = model.init(jax.random.PRNGKey(0), 3)
    assert len(params["blocks"]) == 40
