#!/usr/bin/env python
"""Micro-probes for the neighbor gather at the production operating point.

The 4x4096 block path is gather-bound (profile_block.py): XLA's
take-along-axis gather moves the 84 MB edge tensor at ~65 GB/s effective.
This probe measures alternative formulations ON the TPU with
dispatch-overhead-corrected timing (slope between chained repetition
counts inside one jit), so sub-ms candidates are comparable:

  base      max_k(gather(q, idx))          (B,N,C) layout, axis -2 gather
  transp    max_k(gatherT(qT, idx))        (B,C,N) layout, lane-dim gather
  onehot    max via masked one-hot         MXU formulation (reference)
  pallas    in-kernel VMEM gather          if Mosaic supports it at all

Env: BENCH_N, BENCH_B, BENCH_C, BENCH_K.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("BENCH_N", 4096))
B = int(os.environ.get("BENCH_B", 4))
C = int(os.environ.get("BENCH_C", 64))
K = int(os.environ.get("BENCH_K", 20))


def _sync(out):
    # host transfer — block_until_ready can return early through the
    # axon PJRT tunnel (see CLAUDE.md)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def slope_time(name, make_chain, *args, reps=(1, 5), iters=10):
    """Per-application ms via the slope between chained rep counts."""
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
        f"{name:34s} {per:8.3f} ms/app   "
        f"(chain{reps[0]}={times[reps[0]]:.3f} chain{reps[1]}={times[reps[1]]:.3f})",
        flush=True,
    )
    return per


def main():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, size=(B, N, K)).astype(np.int32))

    # dispatch overhead reference: trivial op
    tiny = jnp.zeros((8, 128), jnp.float32)

    def make_tiny(r):
        @jax.jit
        def f(x):
            for _ in range(r):
                x = x + 1.0
            return x

        return f

    slope_time("tiny add (overhead ref)", make_tiny, tiny, reps=(1, 101))

    def make_base(r):
        @jax.jit
        def f(q, idx):
            y = None
            for _ in range(r):
                flat = idx.reshape(B, N * K)
                g = jnp.take_along_axis(q, flat[..., None], axis=-2)
                y = jnp.max(g.reshape(B, N, K, C), axis=-2)
                q = q + 1e-9 * y
            return q

        return f

    slope_time("gather+max  (B,N,C) axis -2", make_base, q, idx)

    qT = jnp.swapaxes(q, -1, -2).copy()  # (B, C, N)

    def make_transp(r):
        @jax.jit
        def f(qT, idx):
            for _ in range(r):
                flat = idx.reshape(B, 1, N * K)
                g = jnp.take_along_axis(
                    qT, jnp.broadcast_to(flat, (B, C, N * K)), axis=-1
                )
                y = jnp.max(g.reshape(B, C, N, K), axis=-1)  # (B, C, N)
                qT = qT + 1e-9 * y
            return qT

        return f

    slope_time("gather+max  (B,C,N) lane dim", make_transp, qT, idx)

    def make_4red(r):
        @jax.jit
        def f(q, idx):
            for _ in range(r):
                flat = idx.reshape(B, N * K)
                g = jnp.take_along_axis(q, flat[..., None], axis=-2)
                g = g.reshape(B, N, K, C)
                mx = jnp.max(g, axis=-2)
                mn = jnp.min(g, axis=-2)
                sq = jnp.sum(g, axis=-2)
                s2 = jnp.sum(jnp.square(g), axis=-2)
                q = q + 1e-9 * (mx + mn + sq + s2)
            return q

        return f

    slope_time("4 reductions (B,N,C)", make_4red, q, idx)

    def make_4red_t(r):
        @jax.jit
        def f(qT, idx):
            for _ in range(r):
                flat = idx.reshape(B, 1, N * K)
                g = jnp.take_along_axis(
                    qT, jnp.broadcast_to(flat, (B, C, N * K)), axis=-1
                )
                g = g.reshape(B, C, N, K)
                mx = jnp.max(g, axis=-1)
                mn = jnp.min(g, axis=-1)
                sq = jnp.sum(g, axis=-1)
                s2 = jnp.sum(jnp.square(g), axis=-1)
                qT = qT + 1e-9 * (mx + mn + sq + s2)
            return qT

        return f

    slope_time("4 reductions (B,C,N)", make_4red_t, qT, idx)

    # scatter-add VJP, both layouts
    g0 = jnp.asarray(rng.randn(B, N, K, C).astype(np.float32))

    def make_scatter(r):
        @jax.jit
        def f(q, idx, g0):
            for _ in range(r):
                flat = idx.reshape(B, N * K)

                def gf(q):
                    return jnp.take_along_axis(q, flat[..., None], axis=-2)

                _, vjp = jax.vjp(gf, q)
                dq = vjp(g0.reshape(B, N * K, C))[0]
                q = q + 1e-9 * dq
            return q

        return f

    slope_time("scatter VJP (B,N,C)", make_scatter, q, idx, g0)

    g0T = jnp.moveaxis(g0, -1, 1).reshape(B, C, N * K).copy()

    def make_scatter_t(r):
        @jax.jit
        def f(qT, idx, g0T):
            for _ in range(r):
                flat = jnp.broadcast_to(idx.reshape(B, 1, N * K), (B, C, N * K))

                def gf(qT):
                    return jnp.take_along_axis(qT, flat, axis=-1)

                _, vjp = jax.vjp(gf, qT)
                dq = vjp(g0T)[0]
                qT = qT + 1e-9 * dq
            return qT

        return f

    slope_time("scatter VJP (B,C,N)", make_scatter_t, qT, idx, g0T)

    # Pallas in-kernel gather probe: does Mosaic lower a VMEM vector
    # gather at all, and at what speed?
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(q_ref, idx_ref, out_ref):
        qv = q_ref[0]          # (N, C)
        iv = idx_ref[0]        # (N, K)
        ivb = jnp.broadcast_to(iv.reshape(N * K, 1), (N * K, C))
        g = jnp.take_along_axis(qv, ivb, axis=0)  # (N*K, C)
        out_ref[0] = jnp.max(g.reshape(N, K, C), axis=1)

    def pallas_gmax(q, idx):
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, N, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, N, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, N, C), jnp.float32),
        )(q, idx)

    try:
        def make_pallas(r):
            @jax.jit
            def f(q, idx):
                for _ in range(r):
                    q = q + 1e-9 * pallas_gmax(q, idx)
                return q

            return f

        slope_time("pallas in-kernel take+max", make_pallas, q, idx)
    except Exception as e:
        print(f"pallas in-kernel take: FAILED ({type(e).__name__}: {str(e)[:300]})")


if __name__ == "__main__":
    main()
