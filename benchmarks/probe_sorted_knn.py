#!/usr/bin/env python
"""Probe: does spatially coherent (Morton-sorted) point ORDER speed up the
EXACT Pallas kNN kernel?

Mechanism under test: the kernel's per-tile merge loop (kernels/
knn_pallas.py `pass_body`) exits as soon as no row's tile max can still
enter its running top-k, and the per-tile pass count is the MAX over the
256 query rows (straggler-bound: ~8.4 passes/tile measured on random
order, DESIGN.md §8). If points arrive sorted along a space-filling
curve, each query block's true top-k concentrates in a few nearby key
tiles — distant tiles should knock out after ~one max scan, collapsing
total merge work toward (fill k) + (1 scan x far tiles).

The EXACT selection is order-invariant up to distance ties, so if this
wins it is a pure input-layout lever (same O(N^2) matmul FLOPs, less
merge), composable with everything: the candidate productization is the
entry permute the banded path already has, minus the window.

Arms, interleaved within ONE process (the +-8% shared-chip rule):
  coords4        layer-1 graph input: 4-channel LArTPC-like event
                 (io.synthetic.make_event), event order (shuffled by the
                 generator) vs morton_order of the same rows.
  feats64 L2..L6 the ACTUAL kNN inputs of blocks 2..6 of the flagship
                 model at init params (captured via a recording knn_fn),
                 event order vs morton_order over their first 8 channels
                 (ops.sfc.MAX_CODE_DIMS) — deep layers rebuild the graph
                 in FEATURE space, so this measures how much locality
                 survives the learned embedding's proxy at init.

Usage (real TPU): python benchmarks/probe_sorted_knn.py
  BENCH_N=16384 BENCH_ITERS=10 BENCH_REPS=3
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.io.synthetic import make_event
from dgcnn_tpu.kernels.knn_pallas import knn_pallas
from dgcnn_tpu.models.dgcnn import ModelSpec, make_model
from dgcnn_tpu.ops.sfc import morton_order

N = int(os.environ.get("BENCH_N", 16384))
K = int(os.environ.get("BENCH_K", 20))
ITERS = int(os.environ.get("BENCH_ITERS", 10))
REPS = int(os.environ.get("BENCH_REPS", 3))


def timeit(fn, x, iters=ITERS):
    r = fn(x)
    np.asarray(r[0][(0,) * (r[0].ndim - 1)])  # ndim-generic sync, as bench_knn
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(x)
    np.asarray(r[0][(0,) * (r[0].ndim - 1)])
    return (time.perf_counter() - t0) / iters * 1e3


def sorted_copy(x):
    order, _ = morton_order(x, None)
    return jnp.take_along_axis(x, order[..., None], axis=-2)


def main():
    rng = np.random.RandomState(0)
    ev = make_event(rng, N, num_class=2)
    pts4 = jnp.asarray(ev.points[None])  # (1, N, 4), generator-shuffled

    # capture the real per-block kNN inputs at init params (eager apply)
    records = []

    def rec_knn(x, k, mask):
        records.append(x)
        return knn_pallas(x, k, mask)

    spec = ModelSpec(residual=True, k=K, edge_filters=(64,) * 6)
    model = make_model(spec, knn_fn=rec_knn)
    params, state = model.init(jax.random.PRNGKey(0), 4)
    model.apply(params, state, pts4, None, train=False)
    print(f"captured {len(records)} kNN inputs "
          f"(shapes {[tuple(r.shape) for r in records]})", flush=True)

    # precompute the morton variant once per arm (the sort+gather is not
    # in the timed region, but re-running it per rep wasted device time
    # and noised the interleaving)
    arms = [("coords4", {"event": pts4, "morton": sorted_copy(pts4)})]
    for i, x in enumerate(records[1:], start=2):
        arms.append(
            (f"feats{x.shape[-1]}_L{i}", {"event": x, "morton": sorted_copy(x)})
        )

    kernel = jax.jit(lambda x: knn_pallas(x, K))
    results = {}
    for rep in range(REPS):
        for name, variants in arms:
            for variant, xv in variants.items():
                dt = timeit(kernel, xv)
                results.setdefault((name, variant), []).append(dt)
                if rep == REPS - 1:
                    ts = results[(name, variant)]
                    print(f"{name:12s} {variant:7s}: "
                          f"min {min(ts):7.2f} ms  med {sorted(ts)[len(ts)//2]:7.2f} ms",
                          flush=True)

    print("\nspeedup (event/morton, min-of-reps):", flush=True)
    for name, _ in arms:
        a = min(results[(name, "event")])
        b = min(results[(name, "morton")])
        print(f"  {name:12s}: {a / b:5.2f}x  ({a:.2f} -> {b:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
