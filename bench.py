#!/usr/bin/env python
"""Benchmark: flagship training throughput on the local accelerator.

Measures steady-state full training steps (dynamic kNN graph + EdgeConv
fwd+bwd + optimizer) of the 6-block residual DGCNN at 16k-point events —
the BASELINE.json north-star metric "points/sec/chip (EdgeConv fwd+bwd);
events/sec at 16k-pt segmentation".

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

``vs_baseline`` is the ratio to the TF-CPU stand-in (the reference repo
publishes no numbers and its TF1 source was unavailable — per SURVEY.md
§6 the stand-in is this framework's own jnp path on the host CPU, same
config, measured in-session; see BASELINE.md "Measured" table).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# CPU stand-in for the reference TF-CPU baseline: jnp path, N=16384, B=1,
# full train_step on this container's host CPU (2026-08-16): 1104 points/s.
CPU_BASELINE_PPS = 1104.0

N_POINTS = int(os.environ.get("BENCH_POINTS", 16384))
BATCH = int(os.environ.get("BENCH_BATCH", 1))
ITERS = int(os.environ.get("BENCH_ITERS", 10))
USE_PALLAS = os.environ.get("BENCH_PALLAS", "1") == "1"
PRECISION = os.environ.get("BENCH_PRECISION", "default")


def main():
    import jax

    from dgcnn_tpu.config import Config
    from dgcnn_tpu.io import BucketBatcher, SyntheticIO
    from dgcnn_tpu.parallel.mesh import make_mesh
    from dgcnn_tpu.train import Trainval

    cfg = Config(
        model_name="residual-dgcnn",
        num_class=2,
        kvalue=20,
        edge_filters=(64,) * 6,
        minibatch_size=BATCH,
        num_point=N_POINTS,
        use_pallas=USE_PALLAS,
        precision=PRECISION,
    )
    tv = Trainval(cfg, mesh=make_mesh(1))
    state = tv.initialize(4)
    io = SyntheticIO(
        num_events=BATCH, num_point=N_POINTS, seed=0, variable_length=False
    ).initialize()
    batch = next(BucketBatcher(io, BATCH, num_point=N_POINTS, shuffle=False).epoch())

    # warmup/compile; the float() host transfer is the sync barrier —
    # block_until_ready on donated outputs has been seen returning early
    # through the axon PJRT tunnel
    for _ in range(2):
        state, metrics = tv.train_step(state, batch)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = tv.train_step(state, batch)
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    pps = BATCH * N_POINTS * ITERS / dt
    print(
        json.dumps(
            {
                "metric": f"train points/sec/chip (residual-dgcnn 6x64, "
                f"k=20, {N_POINTS}-pt events, fwd+bwd+opt)",
                "value": round(pps, 1),
                "unit": "points/s",
                "vs_baseline": round(pps / CPU_BASELINE_PPS, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
