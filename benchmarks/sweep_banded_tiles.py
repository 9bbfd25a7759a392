#!/usr/bin/env python
"""Tile-geometry sweep for the banded kNN kernel at large N.

The banded kernel inherits the exact kernel's (QB=256, T=1024) default,
but its merge economics differ: the exact kernel scans ~N/T tiles per
chunk of which most contribute no top-k entries (1 cheap pass), while a
banded chunk scans only ~W/T tiles of which nearly EVERY tile holds
winners — so per-pair cost is pass-bound, not stream-bound, and the
optimal (QB, T) may not match. Interleaves configs within one process
(±8% chip variance rule).

Env: BENCH_N (524288), BENCH_W (8192), BENCH_ITERS (6).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.kernels.knn_banded import knn_pallas_banded

N = int(os.environ.get("BENCH_N", 524288))
W = int(os.environ.get("BENCH_W", 8192))
ITERS = int(os.environ.get("BENCH_ITERS", 6))
C, K = 64, 20
GRID = [
    (256, 512), (256, 1024), (256, 2048), (256, 4096),
    (128, 1024), (512, 1024), (512, 2048),
]


def main():
    rng = np.random.RandomState(0)
    # sorted-order stand-in: random features are fine for timing (band
    # masks and tile ranges depend only on positions/nvalid)
    x = jnp.asarray(rng.randn(1, N, C).astype(np.float32))
    mask = jnp.ones((1, N), bool)
    fns = {}
    for qb, bt in GRID:
        try:
            f = jax.jit(
                lambda x, m, qb=qb, bt=bt: knn_pallas_banded(
                    x, K, m, window=W, block_q=qb, block_t=bt
                )[0]
            )
            r = f(x, mask)
            np.asarray(r.ravel()[0])
            fns[(qb, bt)] = f
        except Exception as e:  # noqa: BLE001 - sweep survives bad configs
            print(f"QB={qb} T={bt}: failed to compile/run: {type(e).__name__}",
                  flush=True)
    times = {k: [] for k in fns}
    for _ in range(ITERS):
        for key, f in fns.items():
            t0 = time.perf_counter()
            r = f(x, mask)
            np.asarray(r.ravel()[0])
            times[key].append((time.perf_counter() - t0) * 1e3)
    pairs = N * W
    for (qb, bt), ts in sorted(times.items(), key=lambda kv: np.median(kv[1])):
        med = float(np.median(ts))
        print(
            f"QB={qb:4d} T={bt:5d}: {med:8.2f} ms/layer "
            f"({med * 1e9 / pairs:6.2f} ps/pair)  min {min(ts):.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
