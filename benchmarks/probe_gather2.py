#!/usr/bin/env python
"""In-kernel (Pallas) gather probes, query-tiled to fit VMEM.

XLA's take-along-axis gather at 4x4096 costs ~2.6 ms per gather+max
(serialized ~7.5 ns/row). These probes test whether Mosaic can lower a
VMEM-resident vector gather at all, and at what speed, with the q table
fully resident (N*C*4 = 1 MB) and queries tiled.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(os.environ.get("BENCH_N", 4096))
B = int(os.environ.get("BENCH_B", 4))
C = int(os.environ.get("BENCH_C", 64))
K = int(os.environ.get("BENCH_K", 20))
QB = int(os.environ.get("BENCH_QB", 512))


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def slope_time(name, make_chain, *args, reps=(1, 5), iters=10):
    times = {}
    for r in reps:
        f = make_chain(r)
        out = f(*args)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        _sync(out)
        times[r] = (time.perf_counter() - t0) / iters * 1e3
    per = (times[reps[1]] - times[reps[0]]) / (reps[1] - reps[0])
    print(
        f"{name:40s} {per:8.3f} ms/app   "
        f"(c{reps[0]}={times[reps[0]]:.3f} c{reps[1]}={times[reps[1]]:.3f})",
        flush=True,
    )
    return per


def try_variant(name, pallas_fn, q, idx, ref):
    try:
        out = jax.jit(pallas_fn)(q, idx)
        ok = np.allclose(np.asarray(out), np.asarray(ref))
        print(f"{name}: compiles, exact={ok}", flush=True)
        if not ok:
            return
        def make(r):
            @jax.jit
            def f(q, idx):
                for _ in range(r):
                    q = q + 1e-9 * pallas_fn(q, idx)
                return q
            return f
        slope_time("  " + name, make, q, idx)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:200]
        print(f"{name}: FAILED ({type(e).__name__}: {msg})", flush=True)


def main():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, size=(B, N, K)).astype(np.int32))
    ref = jnp.max(
        jnp.take_along_axis(
            q, idx.reshape(B, N * K)[..., None], axis=-2
        ).reshape(B, N, K, C),
        axis=-2,
    )

    grid = (B, N // QB)
    common = dict(
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QB, K), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, QB, C), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, C), jnp.float32),
    )

    # A: one flat take_along_axis over the whole tile
    def kernel_a(q_ref, idx_ref, out_ref):
        qv = q_ref[0]                       # (N, C)
        iv = idx_ref[0].reshape(QB * K, 1)  # (QB*K, 1)
        g = jnp.take_along_axis(qv, jnp.broadcast_to(iv, (QB * K, C)), axis=0)
        out_ref[0] = jnp.max(g.reshape(QB, K, C), axis=1)

    try_variant(
        "A take_along_axis flat", lambda q, i: pl.pallas_call(kernel_a, **common)(q, i), q, idx, ref
    )

    # B: per-neighbor-slot loop of row gathers
    def kernel_b(q_ref, idx_ref, out_ref):
        qv = q_ref[0]
        acc = jnp.full((QB, C), -np.inf, jnp.float32)
        for s in range(K):
            ivs = jnp.broadcast_to(idx_ref[0][:, s].reshape(QB, 1), (QB, C))
            acc = jnp.maximum(acc, jnp.take_along_axis(qv, ivs, axis=0))
        out_ref[0] = acc

    try_variant(
        "B per-slot take loop", lambda q, i: pl.pallas_call(kernel_b, **common)(q, i), q, idx, ref
    )

    # C: jnp.take with flat indices
    def kernel_c(q_ref, idx_ref, out_ref):
        qv = q_ref[0]
        g = jnp.take(qv, idx_ref[0].reshape(QB * K), axis=0)
        out_ref[0] = jnp.max(g.reshape(QB, K, C), axis=1)

    try_variant(
        "C jnp.take flat", lambda q, i: pl.pallas_call(kernel_c, **common)(q, i), q, idx, ref
    )

    # D: all four reductions in one kernel pass
    def kernel_d(q_ref, idx_ref, mx_ref, mn_ref, sq_ref, s2_ref):
        qv = q_ref[0]
        iv = idx_ref[0].reshape(QB * K, 1)
        g = jnp.take_along_axis(qv, jnp.broadcast_to(iv, (QB * K, C)), axis=0)
        g = g.reshape(QB, K, C)
        mx_ref[0] = jnp.max(g, axis=1)
        mn_ref[0] = jnp.min(g, axis=1)
        sq_ref[0] = jnp.sum(g, axis=1)
        s2_ref[0] = jnp.sum(g * g, axis=1)

    def pallas_d(q, i):
        outs = pl.pallas_call(
            kernel_d,
            grid=grid,
            in_specs=common["in_specs"],
            out_specs=[common["out_specs"]] * 4,
            out_shape=[jax.ShapeDtypeStruct((B, N, C), jnp.float32)] * 4,
        )(q, i)
        return outs[0]

    try_variant("D 4-reduction kernel", pallas_d, q, idx, ref)


if __name__ == "__main__":
    main()
