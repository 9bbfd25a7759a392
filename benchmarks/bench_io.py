#!/usr/bin/env python
"""Host IO benchmark: batch-assembly throughput per reader path.

The reference's host-side hot path is larcv (C++) event reads + threaded
batch stacking [H per SURVEY.md §3.4]; the rebuild's equivalents are the
DGB C++ reader (mmap + one worker thread per event) and the Python
readers. This measures padded-batch assembly throughput (events/s and
points/s into pinned numpy, before device transfer) so the native-path
claim is a number, not an assertion.

Usage: python benchmarks/bench_io.py  [BENCH_EVENTS=512 BENCH_POINTS=4096]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dgcnn_tpu.io import BucketBatcher, SyntheticIO
from dgcnn_tpu.io.dgb import DGBIO, write_dgb
from dgcnn_tpu.io.readers import H5IO, NPZIO
from dgcnn_tpu.io.synthetic import write_canonical

EVENTS = int(os.environ.get("BENCH_EVENTS", 512))
POINTS = int(os.environ.get("BENCH_POINTS", 4096))
BATCH = int(os.environ.get("BENCH_BATCH", 8))


def sweep(name, io, crop):
    batcher = BucketBatcher(io, BATCH, num_point=crop, shuffle=True, seed=0)
    # warm (page cache, lazy init)
    next(batcher.epoch())
    t0 = time.perf_counter()
    n_ev = n_pt = 0
    for batch in batcher.epoch():
        n_ev += int(batch.points.shape[0])
        n_pt += int(batch.mask.sum())
    dt = time.perf_counter() - t0
    print(
        f"{name:26s} {n_ev/dt:10.0f} events/s  {n_pt/dt/1e6:8.1f} Mpoints/s",
        flush=True,
    )
    io.finalize()


def main():
    src = SyntheticIO(
        num_events=EVENTS, num_point=POINTS, seed=0, with_weights=True
    ).initialize()
    events = [src.read_event(i) for i in range(EVENTS)]
    crop = POINTS // 2  # force the crop branch on most events

    with tempfile.TemporaryDirectory() as d:
        dgb_path = os.path.join(d, "ev.dgb")
        h5_path = os.path.join(d, "ev.h5")
        npz_path = os.path.join(d, "ev.npz")
        write_dgb(dgb_path, events)
        write_canonical(h5_path, events, "h5")
        write_canonical(npz_path, events, "npz")

        io_native = DGBIO(dgb_path).initialize()
        assert io_native.native_active, "C++ reader unavailable"
        sweep("DGB (C++ threaded)", io_native, crop)

        io_py = DGBIO(dgb_path).initialize()
        io_py._handle = None
        sweep("DGB (python mmap)", io_py, crop)

        sweep("HDF5", H5IO(h5_path, "data", "label", "weight").initialize(), crop)
        sweep("NPZ", NPZIO(npz_path, "data", "label", "weight").initialize(), crop)


if __name__ == "__main__":
    main()
