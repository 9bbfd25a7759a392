#!/usr/bin/env python
"""Winner-dense merge probe for the banded kNN kernel (VERDICT r3 #5).

BASELINE.md's round-3 banded floor (~62-68 ps/pair vs the exact kernel's
~28) was closed with reasoning borrowed from the round-2 exact-kernel
merge study — but that study's premise was winner-SPARSE tiles (most of
an exact sweep's N/T tiles contribute nothing, so the single full-tile
do-while amortizes to ~1 pass). The banded path scans ONLY the ~W/T
tiles of each query's window: every tile is winner-DENSE and pays
multi-pass extraction, each pass re-scanning the whole (QB, T) tile.

This probe measures the chunked-extraction variant
(`kernels.knn_banded merge_chunk`): split each DMA'd tile into
`mc`-column chunks, each with its own adaptive do-while, so re-scans
are `mc` wide — total extraction touches drop from
(max winners/row/TILE + 1) * T to sum_chunks (max winners/row/CHUNK
+ 1) * mc. Outputs are bitwise identical for any mc (asserted here and
in tests/test_knn_banded.py).

Interleaved A/B within one process (CLAUDE.md: +-8% chip variance), on
the 6-build back-to-back shape the model actually runs (the in-step
regime where consecutive builds share compiled code + warm HBM).

Usage (real TPU):
  python benchmarks/probe_banded_merge.py
  PROBE_REGIMES=131072:4096,1048576:4096 python benchmarks/probe_banded_merge.py
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
from dgcnn_tpu.ops.sfc import morton_order

K = int(os.environ.get("PROBE_K", 20))
C = int(os.environ.get("PROBE_C", 64))
BUILDS = int(os.environ.get("PROBE_BUILDS", 6))
REPS = int(os.environ.get("PROBE_REPS", 5))
_default = "131072:4096,131072:8192,524288:8192,1048576:4096"
REGIMES = [
    tuple(int(v) for v in s.split(":"))
    for s in os.environ.get("PROBE_REGIMES", _default).split(",")
]
CHUNKS = [
    int(v)
    for v in os.environ.get("PROBE_CHUNKS", "1024,512,256,128").split(",")
]
# tile visit order A/B (kernels.knn_banded tile_order): "asc" vs
# "diag_first" (seed the running top-k from the diagonal tile so the
# entry bar is high before the winner-sparse off-diagonal tiles merge).
ORDERS = os.environ.get("PROBE_ORDERS", "asc").split(",")


def six_builds(mc, order):
    """The in-step shape: BUILDS sequential banded graph builds.

    Each build's input carries a zero derived from the previous build's
    output — identical VALUES (so selection work is identical) but a
    real data dependence, so XLA cannot CSE the six calls into one
    kernel launch (without it the six identical pure calls dedupe and
    the probe times a single build)."""

    @jax.jit
    def f(x):
        xin = x
        idx = None
        for _ in range(BUILDS):
            idx, _ = knn_pallas_banded(
                xin, K, None, window=W, merge_chunk=mc, tile_order=order,
                precision=jax.lax.Precision.HIGHEST,
            )
            xin = x + (idx[0, 0, 0] * 0).astype(x.dtype)
        return idx, idx[0, 0, 0]

    return f


def timeit(f, x):
    r = f(x)
    float(np.asarray(r[1]))  # host-transfer sync (CLAUDE.md)
    t0 = time.perf_counter()
    r = f(x)
    float(np.asarray(r[1]))
    return (time.perf_counter() - t0) * 1e3


DATA = os.environ.get("PROBE_DATA", "real")  # real|synthetic
# which build's input to probe: 0 = the raw 4-D coords (layer 1 — the
# tie-dense case: within a window D_ij spreads far less than |x|^2, so
# extraction passes multiply), 1 = the ReLU'd C=64 features (layers 2-6)
LAYER = int(os.environ.get("PROBE_LAYER", 1))


def real_features(n, w):
    """Capture a real kNN input (LAYER 0 = sorted coords, 1 = sorted
    ReLU'd C=64 features) from a banded model apply — merge pass counts
    are strongly data-dependent (ties/near-dups in feature space), and
    random clouds measured ~3-5x too EASY vs in-step 6xkNN times."""
    from dgcnn_tpu.io.synthetic import make_event
    from dgcnn_tpu.models.dgcnn import ModelSpec, make_model

    ev = make_event(np.random.RandomState(0), n, num_class=2)
    pts = jnp.asarray(ev.points[None])
    records = []

    def rec_knn(x, k, mask):
        records.append(x)
        return knn_pallas_banded(x, k, mask, window=w)

    spec = ModelSpec(
        residual=True, k=K, edge_filters=(64,) * 6, knn_window=w,
        head_stream="on",
    )
    model = make_model(spec, knn_fn=rec_knn)
    params, state = model.init(jax.random.PRNGKey(0), 4)
    model.apply(params, state, pts, None, train=False)
    return records[LAYER]


for n, w in REGIMES:
    W = w
    if DATA == "real":
        xs = real_features(n, w)
    else:
        rng = np.random.RandomState(0)
        # track-like structure (clustered line segments)
        segs = rng.randn(8, 2, C).astype(np.float32)
        t = rng.rand(n, 1).astype(np.float32)
        which = rng.randint(0, 8, n)
        x = segs[which, 0] * t + segs[which, 1] * (1 - t)
        x += 0.01 * rng.randn(n, C).astype(np.float32)
        xj = jnp.asarray(x[None])
        order, _ = morton_order(xj, None)
        xs = jnp.take_along_axis(xj, order[..., None], axis=-2)

    arms = [(mc, od) for mc in CHUNKS for od in ORDERS]
    fns = {a: six_builds(*a) for a in arms}
    # exactness: all variants bitwise-equal indices
    base_idx = None
    for a, f in fns.items():
        idx = np.asarray(f(xs)[0])
        if base_idx is None:
            base_idx = idx
        else:
            assert (idx == base_idx).all(), f"arm={a} diverged at N={n}"
    times = {a: [] for a in arms}
    for _ in range(REPS):
        for a, f in fns.items():  # interleave configs within the rep
            times[a].append(timeit(f, xs))
    base = np.median(times[arms[0]])
    for mc, od in arms:
        med = float(np.median(times[(mc, od)]))
        tag = "BASE" if (mc, od) == arms[0] else f"{base / med:5.2f}x"
        print(
            f"N={n:8d} W={w:5d} mc={mc:5d} {od:>10s}: {med:9.1f} ms "
            f"/{BUILDS} builds ({med / BUILDS:7.1f} ms/build, "
            f"{1e9 * med / BUILDS / (n * w):6.1f} ps/pair) {tag}",
            flush=True,
        )
