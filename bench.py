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
config). The stand-in is MEASURED IN-RUN by default (VERDICT r3 #3: the
artifact of record must self-prove its ratio — the recorded constant is
±10% host-load-dependent across rounds): a subprocess times the same
config on the host CPU (~1-2 min inside the 3-5 min budget). Set
BENCH_MEASURE_CPU=0 to skip it; on subprocess failure the recorded
constant (CPU_BASELINE_PPS) is the fallback, flagged by
``cpu_standin_measured: false`` in the JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# CPU stand-in for the reference TF-CPU baseline: jnp path, N=16384, B=1,
# full train_step on this container's host CPU. Re-measured 2026-08-17
# (round 3, BENCH_MEASURE_CPU=1): 1319.5 points/s (was 1104 in round 1 —
# host load dependent). Re-measure with BENCH_MEASURE_CPU=1 (~2 min).
CPU_BASELINE_PPS = 1319.5

N_POINTS = int(os.environ.get("BENCH_POINTS", 16384))
BATCH = int(os.environ.get("BENCH_BATCH", 1))
ITERS = int(os.environ.get("BENCH_ITERS", 10))
USE_PALLAS = os.environ.get("BENCH_PALLAS", "1") == "1"
PRECISION = os.environ.get("BENCH_PRECISION", "default")
# optional: measure with graph reuse (BENCH_KNN_EVERY=3). Default 1 keeps
# the headline comparable across rounds (reference per-block semantics).
KNN_EVERY = int(os.environ.get("BENCH_KNN_EVERY", 1))


def measure(n_points: int, batch: int, iters: int, use_pallas: bool,
            precision: str, force_cpu: bool = False):
    """Steady-state points/s of the flagship train step; returns
    (points_per_sec, step_ms)."""
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from dgcnn_tpu.config import Config
    from dgcnn_tpu.io import BucketBatcher, SyntheticIO
    from dgcnn_tpu.parallel.mesh import make_mesh
    from dgcnn_tpu.train import Trainval

    cfg = Config(
        model_name="residual-dgcnn",
        num_class=2,
        kvalue=20,
        edge_filters=(64,) * 6,
        minibatch_size=batch,
        num_point=n_points,
        use_pallas=use_pallas,
        precision=precision,
        knn_every=KNN_EVERY,
    )
    tv = Trainval(cfg, mesh=make_mesh(1))
    state = tv.initialize(4)
    io = SyntheticIO(
        num_events=batch, num_point=n_points, seed=0, variable_length=False
    ).initialize()
    b = next(BucketBatcher(io, batch, num_point=n_points, shuffle=False).epoch())

    # warmup/compile; the float() host transfer is the sync barrier —
    # block_until_ready on donated outputs has been seen returning early
    # through the axon PJRT tunnel
    for _ in range(2):
        state, metrics = tv.train_step(state, b)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = tv.train_step(state, b)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    return batch * n_points * iters / dt, dt / iters * 1e3


def _measure_cpu_standin() -> float:
    """Re-measure the TF-CPU stand-in in a fresh subprocess (the CPU
    backend must be chosen before jax initializes, and this process has
    already touched the TPU). Same model precision as the TPU leg so
    vs_baseline stays like-for-like (the CPU path never uses Pallas)."""
    cpu_iters = int(os.environ.get("BENCH_CPU_ITERS", 3))
    code = (
        "import bench, json;"
        f"pps, ms = bench.measure(bench.N_POINTS, bench.BATCH, {cpu_iters},"
        f" use_pallas=False, precision={PRECISION!r}, force_cpu=True);"
        "print(json.dumps({'pps': pps}))"
    )
    env = dict(os.environ)
    env.pop("BENCH_MEASURE_CPU", None)
    out = subprocess.run(
        [sys.executable, "-c", code],
        cwd=os.path.dirname(os.path.abspath(__file__)),
        env=env, capture_output=True, text=True, timeout=1800,
    )
    if out.returncode != 0 or not out.stdout.strip():
        raise RuntimeError(
            f"CPU stand-in re-measure failed (rc={out.returncode}):\n"
            f"{out.stderr[-2000:]}"
        )
    return float(json.loads(out.stdout.strip().splitlines()[-1])["pps"])


def main():
    cpu_pps = CPU_BASELINE_PPS
    default_config = (N_POINTS, BATCH, KNN_EVERY) == (16384, 1, 1)
    cpu_measured = False
    if os.environ.get("BENCH_MEASURE_CPU", "1") == "1":
        try:
            cpu_pps = _measure_cpu_standin()
            cpu_measured = True
        except Exception as e:  # fall back to the recorded constant
            print(
                f"WARNING: in-run CPU stand-in measure failed ({e}); "
                f"falling back to the recorded constant "
                f"{CPU_BASELINE_PPS} points/s",
                file=sys.stderr,
                flush=True,
            )
    # the recorded CPU constant was measured at the default config — a
    # ratio against it is only meaningful there; an in-run measurement
    # is like-for-like at ANY config
    baseline_valid = cpu_measured or default_config
    pps, step_ms = measure(N_POINTS, BATCH, ITERS, USE_PALLAS, PRECISION)
    print(
        json.dumps(
            {
                "metric": f"train points/sec/chip (residual-dgcnn 6x64, "
                f"k=20, {N_POINTS}-pt events, fwd+bwd+opt)",
                "value": round(pps, 1),
                "unit": "points/s",
                "vs_baseline": (
                    round(pps / cpu_pps, 2) if baseline_valid else None
                ),
                "step_ms": round(step_ms, 1),
                "events_per_sec": round(pps / N_POINTS, 2),
                "cpu_standin_pps": round(cpu_pps, 1),
                "cpu_standin_measured": cpu_measured,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
