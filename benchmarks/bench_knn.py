#!/usr/bin/env python
"""Kernel benchmark: fused Pallas kNN vs XLA top_k, with a config sweep.

Usage (real TPU):
  python benchmarks/bench_knn.py                 # default N=16384 sweep
  BENCH_N=32768 python benchmarks/bench_knn.py
  BENCH_FULL=1 python benchmarks/bench_knn.py    # full block/precision grid
"""

from __future__ import annotations

import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.kernels.knn_pallas import knn_pallas
from dgcnn_tpu.ops.knn import knn_indices

P = jax.lax.Precision
N = int(os.environ.get("BENCH_N", 16384))
C = int(os.environ.get("BENCH_C", 64))
K = int(os.environ.get("BENCH_K", 20))
FULL = os.environ.get("BENCH_FULL", "0") == "1"


def timeit(fn, x, iters=10):
    r = fn(x)
    np.asarray(r[0][(0,) * (r[0].ndim - 1)])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(x)
    np.asarray(r[0][(0,) * (r[0].ndim - 1)])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, N, C).astype(np.float32))
    x_small = jnp.asarray(rng.randn(1, 2048, C).astype(np.float32))
    idx_oracle = np.asarray(knn_indices(x_small, K, precision=P.HIGHEST)[0])

    dt = timeit(jax.jit(lambda x: knn_indices(x, K)), x)
    print(f"xla top_k baseline: {dt:8.2f} ms @ N={N} C={C} k={K}", flush=True)

    precisions = [P.HIGHEST, P.HIGH, P.DEFAULT] if FULL else [P.HIGHEST, P.DEFAULT]
    bqs = [128, 256, 512] if FULL else [256]
    bts = [1024, 2048, 4096] if FULL else [1024, 2048]
    best = None
    for prec, bq, bt in itertools.product(precisions, bqs, bts):
        try:
            f = jax.jit(
                lambda x: knn_pallas(x, K, block_q=bq, block_t=bt, precision=prec)
            )
            dt = timeit(f, x)
            ik = np.asarray(
                knn_pallas(x_small, K, block_q=bq, block_t=bt, precision=prec)[0]
            )
            mm = int((ik != idx_oracle).sum())
            print(
                f"pallas prec={str(prec):18s} bq={bq:4d} bt={bt:5d}: "
                f"{dt:8.2f} ms  oracle-mismatch@2048={mm}",
                flush=True,
            )
            if best is None or dt < best[0]:
                best = (dt, prec, bq, bt, mm)
        except Exception as e:
            print(f"pallas prec={prec} bq={bq} bt={bt}: FAIL {e}", flush=True)
    if best:
        print(
            f"best: {best[0]:.2f} ms (prec={best[1]}, bq={best[2]}, "
            f"bt={best[3]}, mismatches={best[4]})",
            flush=True,
        )


if __name__ == "__main__":
    main()
