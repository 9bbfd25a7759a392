#!/usr/bin/env python
"""Interleaved A/B of --block_impl variants at one operating point.

Run-to-run variance on the shared dev chip is ~±8% (CLAUDE.md), so
sub-10% comparisons MUST interleave the configs inside one process:
this driver builds one Trainval per impl on the same batch, alternates
steps A,B,A,B,... and reports per-impl medians.

Env: BENCH_N (default 16384), BENCH_B (1), BENCH_IMPLS (edge,fused),
BENCH_ITERS (12 per impl), BENCH_REMAT (0), BENCH_KNN_WINDOW (0),
BENCH_KNN_EVERY (1).

An impl entry may carry a `+hf` suffix (e.g. `auto+hf`) to set
head_factorized for that arm — measures what the model-defining head
opt-in buys OUTSIDE the memory-bound frontier regimes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dgcnn_tpu.config import Config
from dgcnn_tpu.io import BucketBatcher, SyntheticIO
from dgcnn_tpu.parallel.mesh import make_mesh
from dgcnn_tpu.train import Trainval

N = int(os.environ.get("BENCH_N", 16384))
B = int(os.environ.get("BENCH_B", 1))
IMPLS = os.environ.get("BENCH_IMPLS", "edge,fused").split(",")
ITERS = int(os.environ.get("BENCH_ITERS", 12))
REMAT = os.environ.get("BENCH_REMAT", "0") == "1"
KNN_WINDOW = int(os.environ.get("BENCH_KNN_WINDOW", 0))
KNN_EVERY = int(os.environ.get("BENCH_KNN_EVERY", 1))


def main():
    io = SyntheticIO(num_events=B, num_point=N, seed=0, variable_length=False).initialize()
    batch = next(BucketBatcher(io, B, num_point=N, shuffle=False).epoch())
    runs = {}
    for impl in IMPLS:
        base, _, suffix = impl.partition("+")
        cfg = Config(
            model_name="residual-dgcnn", num_class=2, kvalue=20,
            edge_filters=(64,) * 6, minibatch_size=B, num_point=N,
            use_pallas=True, remat=REMAT, knn_every=KNN_EVERY,
            knn_window=KNN_WINDOW, block_impl=base,
            head_factorized=(suffix == "hf"),
        )
        tv = Trainval(cfg, mesh=make_mesh(1))
        state = tv.initialize(4)
        # warm both jits before any timing
        state, m = tv.train_step(state, batch)
        float(m["loss"])
        runs[impl] = {"tv": tv, "state": state, "times": []}

    for it in range(ITERS):
        for impl in IMPLS:
            r = runs[impl]
            t0 = time.perf_counter()
            r["state"], m = r["tv"].train_step(r["state"], batch)
            float(m["loss"])  # host sync (block_until_ready can lie here)
            r["times"].append((time.perf_counter() - t0) * 1e3)

    pts = B * N
    for impl in IMPLS:
        ts = np.asarray(runs[impl]["times"])
        med = float(np.median(ts))
        print(
            f"{impl:8s} median {med:8.2f} ms  ({pts / med * 1e3:,.0f} pts/s)"
            f"  min {ts.min():.2f}  max {ts.max():.2f}  n={len(ts)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
