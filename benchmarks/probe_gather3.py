#!/usr/bin/env python
"""Probe Mosaic's tpu.dynamic_gather via per-slot take_along_axis.

Mosaic lowers lax.gather ONLY when indices.shape == table.shape (2D,
slice (1,1)): a per-lane sublane gather. Per neighbor slot s we can
broadcast idx[:, s] over channels and gather the full (N, C) table —
k such gathers per (batch, block) give the whole EdgeConv reduction
forward in one kernel, VMEM-resident. This measures whether that beats
XLA's serialized row-gather loop (~2.6-5 ms per traversal at 4x4096).
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


def kernel(q_ref, idx_ref, mx_ref, mn_ref, sq_ref, s2_ref):
    qv = q_ref[0]          # (N, C)
    iv = idx_ref[0]        # (N, K)
    mx = jnp.full((N, C), -np.inf, jnp.float32)
    mn = jnp.full((N, C), np.inf, jnp.float32)
    sq = jnp.zeros((N, C), jnp.float32)
    s2 = jnp.zeros((N, C), jnp.float32)
    for s in range(K):
        ivb = jnp.broadcast_to(iv[:, s : s + 1], (N, C))
        g = jnp.take_along_axis(qv, ivb, axis=0)  # tpu.dynamic_gather
        mx = jnp.maximum(mx, g)
        mn = jnp.minimum(mn, g)
        sq = sq + g
        s2 = s2 + g * g
    mx_ref[0] = mx
    mn_ref[0] = mn
    sq_ref[0] = sq
    s2_ref[0] = s2


def pallas_4red(q, idx):
    spec = pl.BlockSpec((1, N, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            spec,
            pl.BlockSpec((1, N, K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((B, N, C), jnp.float32)] * 4,
    )(q, idx)


def main():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, size=(B, N, K)).astype(np.int32))

    try:
        mx, mn, sq, sq2 = jax.jit(pallas_4red)(q, idx)
    except Exception as e:
        print(f"FAILED to lower: {type(e).__name__}: {str(e)[:400]}")
        return
    g = jnp.take_along_axis(
        q, idx.reshape(B, N * K)[..., None], axis=-2
    ).reshape(B, N, K, C)
    ok = (
        bool(jnp.all(mx == jnp.max(g, -2)))
        and bool(jnp.all(mn == jnp.min(g, -2)))
        and bool(jnp.allclose(sq, jnp.sum(g, -2), atol=1e-4))
        and bool(jnp.allclose(sq2, jnp.sum(g * g, -2), atol=1e-3))
    )
    print(f"compiles, exact={ok}", flush=True)

    def make(r):
        @jax.jit
        def f(q, idx):
            for _ in range(r):
                mx, mn, sq, sq2 = pallas_4red(q, idx)
                q = q + 1e-9 * (mx + mn)
            return q

        return f

    slope_time("pallas per-slot dynamic_gather 4red", make, q, idx)

    def make_xla(r):
        @jax.jit
        def f(q, idx):
            for _ in range(r):
                flat = idx.reshape(B, N * K)
                g = jnp.take_along_axis(q, flat[..., None], axis=-2)
                g = g.reshape(B, N, K, C)
                q = q + 1e-9 * (jnp.max(g, -2) + jnp.min(g, -2))
            return q

        return f

    slope_time("XLA gather 4red (reference)", make_xla, q, idx)


if __name__ == "__main__":
    main()
