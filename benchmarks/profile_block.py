#!/usr/bin/env python
"""Per-component roofline of the EdgeConv block in the production regime.

VERDICT r2 #1: at 4x4096 (the regime typical LArTPC events occupy) the
gather+edge+BN+relu+max blocks are ~56% of the 89 ms step, and the
round-2 closure of the gather path was measured only at 16k/131k. This
script measures each sub-component AT the production operating point and
compares the classic materializing block ("edge") against the
algebraically fused one ("reduced", ops.edge.edgeconv_block_reduced).

Components, per single block (B=BENCH_B, N=BENCH_N, C=D=64, k=20):
  hbm roundtrip of the (B,N,k,D) tensor   -- bandwidth reference
  gather (materialized)                   -- the raw neighbor gather
  gather+add+relu+max fwd                 -- round-2 micro path
  BN stats reduce over materialized h     -- the extra training pass
  scatter-add VJP of the gather           -- the backward suspect
  4 gathered reductions (max/min/sum/sq)  -- the reduced path's core
  block fwd / fwd+bwd, edge vs reduced    -- end difference
Then the full 6-block train step both ways (the BASELINE.md row).

Env: BENCH_N (4096), BENCH_B (4), BENCH_ITERS (20).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.ops.edge import (
    edgeconv_block_reduced,
    gather_neighbors,
)
from dgcnn_tpu.ops.norm import batch_norm_apply

N = int(os.environ.get("BENCH_N", 4096))
B = int(os.environ.get("BENCH_B", 4))
C = int(os.environ.get("BENCH_C", 64))
K = int(os.environ.get("BENCH_K", 20))
ITERS = int(os.environ.get("BENCH_ITERS", 20))
REMAT = os.environ.get("BENCH_REMAT", "0") == "1"
MICRO = os.environ.get("BENCH_MICRO", "1") == "1"  # per-component probes
IMPLS = os.environ.get("BENCH_IMPLS", "edge,reduced,fused").split(",")


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[0])


def timeit(name, f, *args, iters=ITERS):
    r = f(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    sync(r)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:42s} {dt:9.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    p = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    q = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    gamma = jnp.asarray(rng.randn(C).astype(np.float32))
    beta = jnp.asarray(rng.randn(C).astype(np.float32))
    bn_state = {
        "mean": jnp.zeros((C,), jnp.float32),
        "var": jnp.ones((C,), jnp.float32),
    }
    mask = jnp.ones((B, N), bool)

    mb = B * N * K * C * 4 / 1e6
    print(
        f"regime: B={B} N={N} C={C} k={K}; edge tensor {mb:.0f} MB f32",
        flush=True,
    )
    if not MICRO:
        _train_steps(None)
        return

    from dgcnn_tpu.kernels.knn_pallas import knn_pallas

    idx = jax.jit(lambda x: knn_pallas(x, K)[0])(feats)
    sync(idx)
    h_mat = jax.jit(lambda q, idx: gather_neighbors(q, idx))(q, idx)
    sync(h_mat)

    timeit("hbm copy h (read+write)", jax.jit(lambda h: h + 1.0), h_mat)
    timeit("gather (materialized out)", jax.jit(gather_neighbors), q, idx)

    @jax.jit
    def gather_add_relu_max(p, q, idx):
        h = p[..., :, None, :] + gather_neighbors(q, idx)
        return jnp.max(jax.nn.relu(h), axis=-2)

    timeit("gather+add+relu+max fwd", gather_add_relu_max, p, q, idx)

    @jax.jit
    def bn_stats(h):
        s1 = jnp.sum(h, axis=(0, 1, 2))
        s2 = jnp.sum(jnp.square(h), axis=(0, 1, 2))
        return s1, s2

    timeit("BN stats reduce (materialized h)", bn_stats, h_mat)

    @jax.jit
    def scatter_vjp(q, idx, g):
        _, vjp = jax.vjp(lambda q: gather_neighbors(q, idx), q)
        return vjp(g)[0]

    timeit("gather VJP (scatter-add)", scatter_vjp, q, idx, h_mat)

    @jax.jit
    def four_reductions(q, idx):
        g = gather_neighbors(q, idx)
        return (
            jnp.max(g, axis=-2),
            jnp.min(g, axis=-2),
            jnp.sum(g, axis=-2),
            jnp.sum(jnp.square(g), axis=-2),
        )

    timeit("4 gathered reductions fwd", four_reductions, q, idx)

    bnp = {"scale": gamma, "bias": beta}

    @jax.jit
    def block_edge(p, q, gamma, beta, idx):
        h = p[..., :, None, :] + gather_neighbors(q, idx)
        hn, st = batch_norm_apply(
            {"scale": gamma, "bias": beta},
            bn_state,
            h,
            mask[..., None],
            train=True,
            out_dtype=jnp.float32,
        )
        return jnp.max(jax.nn.relu(hn), axis=-2), st

    @jax.jit
    def block_reduced(p, q, gamma, beta, idx):
        return edgeconv_block_reduced(
            p, q, {"scale": gamma, "bias": beta}, bn_state, idx, mask,
            train=True,
        )

    from dgcnn_tpu.ops.edge import edgeconv_block_fused

    @jax.jit
    def block_fused(p, q, gamma, beta, idx):
        return edgeconv_block_fused(
            p, q, {"scale": gamma, "bias": beta}, bn_state, idx, mask,
            train=True,
        )

    timeit("block fwd  [edge]", block_edge, p, q, gamma, beta, idx)
    timeit("block fwd  [reduced]", block_reduced, p, q, gamma, beta, idx)
    timeit("block fwd  [fused]", block_fused, p, q, gamma, beta, idx)

    def make_fwd_bwd(block):
        @jax.jit
        def fwd_bwd(p, q, gamma, beta, idx):
            def loss(p, q, gamma, beta):
                y, _ = block(p, q, gamma, beta, idx)
                return jnp.mean(jnp.square(y))

            return jax.grad(loss, argnums=(0, 1, 2, 3))(p, q, gamma, beta)

        return fwd_bwd

    timeit("block fwd+bwd  [edge]", make_fwd_bwd(block_edge), p, q, gamma, beta, idx)
    timeit(
        "block fwd+bwd  [reduced]",
        make_fwd_bwd(block_reduced),
        p, q, gamma, beta, idx,
    )
    timeit(
        "block fwd+bwd  [fused]",
        make_fwd_bwd(block_fused),
        p, q, gamma, beta, idx,
    )

    _train_steps(None)


def _train_steps(_):
    # the full flagship train step, per block implementation
    from dgcnn_tpu.config import Config
    from dgcnn_tpu.io import BucketBatcher, SyntheticIO
    from dgcnn_tpu.parallel.mesh import make_mesh
    from dgcnn_tpu.train import Trainval

    io = SyntheticIO(
        num_events=B, num_point=N, seed=0, variable_length=False
    ).initialize()
    batch = next(BucketBatcher(io, B, num_point=N, shuffle=False).epoch())
    for impl in IMPLS:
        cfg = Config(
            model_name="residual-dgcnn",
            num_class=2,
            kvalue=K,
            edge_filters=(64,) * 6,
            minibatch_size=B,
            num_point=N,
            use_pallas=True,
            remat=REMAT,
            block_impl=impl,
        )
        tv = Trainval(cfg, mesh=make_mesh(1))
        state = tv.initialize(4)
        state, m = tv.train_step(state, batch)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, m = tv.train_step(state, batch)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        pps = B * N / (dt / 1e3)
        print(
            f"{'train step 6x64 [' + impl + ']':42s} {dt:9.3f} ms"
            f"   ({pps:,.0f} points/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
