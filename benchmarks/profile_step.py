#!/usr/bin/env python
"""Decompose the flagship train-step time into stages.

Times, at the bench config (6x64 residual DGCNN, k=20, N from BENCH_N):
  1. kNN only (6 dynamic-graph builds)
  2. full forward
  3. full forward+backward+optimizer (the bench.py number)
and prints a stage table — the data that decides which kernel to build
next (e.g. whether the gather/aggregate path warrants a fused kernel).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("BENCH_MEMFIT"):
    jax.config.update(
        "jax_memory_fitting_effort", float(os.environ["BENCH_MEMFIT"])
    )

import jax.numpy as jnp
import numpy as np

import dgcnn_tpu.models.head as _head_mod

if os.environ.get("BENCH_HEAD_CHUNK"):
    _head_mod.HEAD_CHUNK_TARGET_ELEMS = int(os.environ["BENCH_HEAD_CHUNK"])

from dgcnn_tpu.config import Config
from dgcnn_tpu.io import BucketBatcher, SyntheticIO
from dgcnn_tpu.parallel.mesh import make_mesh
from dgcnn_tpu.train import Trainval

N = int(os.environ.get("BENCH_N", 16384))
B = int(os.environ.get("BENCH_B", 1))
USE_PALLAS = os.environ.get("BENCH_PALLAS", "1") == "1"
REMAT = os.environ.get("BENCH_REMAT", "0") == "1"
KNN_EVERY = int(os.environ.get("BENCH_KNN_EVERY", 1))
KNN_WINDOW = int(os.environ.get("BENCH_KNN_WINDOW", 0))
PRECISION = os.environ.get("BENCH_PRECISION", "highest")  # or bfloat16
BLOCK_IMPL = os.environ.get("BENCH_BLOCK_IMPL", "auto")  # edge|reduced|fused
HEAD_FACTORIZED = os.environ.get("BENCH_HEAD_FACTORIZED", "0") == "1"
HEAD_STREAM = os.environ.get("BENCH_HEAD_STREAM", "auto")  # auto|on|off
ITERS = int(os.environ.get("BENCH_ITERS", 5))


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
    print(f"{name:34s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    cfg = Config(
        model_name="residual-dgcnn",
        num_class=2,
        kvalue=20,
        edge_filters=(64,) * 6,
        minibatch_size=B,
        num_point=N,
        use_pallas=USE_PALLAS,
        remat=REMAT,
        knn_every=KNN_EVERY,
        knn_window=KNN_WINDOW,
        precision=PRECISION,
        block_impl=BLOCK_IMPL,
        head_factorized=HEAD_FACTORIZED,
        head_stream=HEAD_STREAM,
    )
    tv = Trainval(cfg, mesh=make_mesh(1))
    state = tv.initialize(4)
    io = SyntheticIO(num_events=B, num_point=N, seed=0, variable_length=False).initialize()
    batch = next(BucketBatcher(io, B, num_point=N, shuffle=False).epoch())
    points, labels, weights, mask = tv._put_batch(batch)
    model = tv.model
    k = cfg.kvalue

    if KNN_WINDOW and USE_PALLAS:
        # banded path: sort once (as the model does), time banded builds
        from dgcnn_tpu.kernels.knn_banded import knn_pallas_banded
        from dgcnn_tpu.ops.sfc import morton_order

        order, _ = jax.jit(morton_order)(points, mask)
        points = jnp.take_along_axis(points, order[..., None], axis=-2)
        mask = jnp.take_along_axis(mask, order, axis=-1)
        knn = lambda x, m: knn_pallas_banded(x, k, m, window=KNN_WINDOW)
    elif USE_PALLAS:
        from dgcnn_tpu.kernels.knn_pallas import knn_pallas

        knn = lambda x, m: knn_pallas(x, k, m)
    else:
        from dgcnn_tpu.ops.knn import knn_indices

        knn = lambda x, m: knn_indices(x, k, m)

    @jax.jit
    def six_knn(x, m):
        # six graph builds on the same features — isolates kNN cost
        out = []
        for i in range(6):
            out.append(knn(x + float(i), m)[0])
        return out

    @jax.jit
    def fwd(params, mstate, x, m):
        logits, _ = model.apply(params, mstate, x, m, train=True)
        return logits

    # isolate the gather+edge+max micro-path (fwd and grad) — the VJP of
    # the neighbor gather is a scatter-add, the 100k+-regime suspect
    c = 64
    rngn = np.random.RandomState(1)
    feats = jnp.asarray(rngn.randn(B, points.shape[1], c).astype(np.float32))
    idx0 = jax.jit(lambda x, m: knn(x, m)[0])(feats, mask)

    @jax.jit
    def gather_edge_max(q, idx):
        from dgcnn_tpu.ops.edge import gather_neighbors

        h = q[..., :, None, :] + gather_neighbors(q, idx)
        return jnp.max(jax.nn.relu(h), axis=-2)

    @jax.jit
    def gather_edge_max_grad(q, idx):
        return jax.grad(lambda q: gather_edge_max(q, idx).sum())(q)

    # the standalone micro-path is un-remat'd: its fwd+bwd keeps the full
    # (B, N, k, C) edge tensor, which OOMs HBM above ~256k points (the
    # MODEL path remats it away) — skippable for huge-N step profiling
    if os.environ.get("BENCH_SKIP_BLOCK", "0") != "1":
        timeit("gather+edge+max fwd (1 block)", gather_edge_max, feats, idx0)
        timeit("gather+edge+max fwd+bwd (1 blk)", gather_edge_max_grad, feats, idx0)

    # the 6-build micro-bench holds six (B, N, k) idx outputs at once —
    # at 8M+ points that alone is ~4 G and OOMs before the model (which
    # builds one graph at a time) gets its chance; skippable
    if os.environ.get("BENCH_SKIP_KNN", "0") != "1":
        timeit("6x kNN (graph builds only)", six_knn, points, mask)

    if os.environ.get("BENCH_FWD_ONLY", "0") == "1":
        # huge-N capability probe, eval mode only: train-mode BN needs
        # the per-block edge statistics (bigger temps), and the
        # backward's edge-tensor temps OOM long before the forward does
        # (see BASELINE.md)
        @jax.jit
        def fwd_eval(params, mstate, x, m):
            logits, _ = model.apply(params, mstate, x, m, train=False)
            return logits

        timeit("full forward (eval mode)", fwd_eval,
               state.params, state.model_state, points, mask)
        return

    timeit("full forward (train mode)", fwd, state.params, state.model_state, points, mask)

    @jax.jit
    def fwd_bwd(params, mstate, x, m):
        def loss_fn(p):
            logits, _ = model.apply(p, mstate, x, m, train=True)
            return jnp.mean(logits * logits)

        return jax.grad(loss_fn)(params)

    timeit("forward+backward (no optimizer)", fwd_bwd, state.params, state.model_state, points, mask)

    def step(state):
        s, metrics = tv.train_step(state, batch)
        return s, metrics

    # train_step manages its own jit; measure through the public API
    s, m = step(state)
    float(m["loss"])
    t0 = time.perf_counter()
    iters = ITERS  # same knob as every other stage (BENCH_ITERS)
    for _ in range(iters):
        s, m = step(s)
    float(m["loss"])
    print(f"{'train step (fwd+bwd+opt)':34s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
