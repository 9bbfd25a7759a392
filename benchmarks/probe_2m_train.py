#!/usr/bin/env python
"""2M-point single-chip TRAIN allocator attack (VERDICT r3 #6).

Round 3 closed 2M f32 training "at the allocator": 9.51 G live vs the
15.75 G budget with 43.8 % buffer-assignment fragmentation — but without
measuring the standard levers for that failure mode. This probe runs
them, one knob per invocation (fresh process per arm: XLA scheduler
config is process-global through the axon remote compiler):

  P2M_MEMFIT=<f>      jax_memory_fitting_effort (XLA tries harder to fit
                      HBM at the cost of exec-time scheduling; [-1, 1])
  P2M_HEAD_CHUNK=<n>  models.head.HEAD_CHUNK_TARGET_ELEMS override —
                      shrinks the largest single allocations the
                      streamed head asks for (2**27 f32 = 512 MB is the
                      round-3 "max single alloc")
  P2M_HEAD_STREAM / P2M_HEAD_FACTORIZED / P2M_KNN_EVERY / P2M_N /
  P2M_WINDOW / P2M_ITERS
  P2M_PRECISION=<p>    model precision (default config default; bfloat16
                      halves activation bytes — the honest "does 2M fit
                      at all on one chip" arm)
  P2M_FULL_ERR=1      print the allocator's ENTIRE message (largest
                      program allocations table) instead of the filtered
                      tail — needed to attribute the fragmentation

Prints one RESULT line: ok + step_ms, or OOM + the allocator's own
summary tail (peak, largest allocs) so closures quote measured numbers.

Usage (real TPU):
  python benchmarks/probe_2m_train.py                      # control
  P2M_MEMFIT=1.0 python benchmarks/probe_2m_train.py
  P2M_MEMFIT=1.0 P2M_HEAD_CHUNK=33554432 python benchmarks/probe_2m_train.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

N = int(os.environ.get("P2M_N", 2097152))
WINDOW = int(os.environ.get("P2M_WINDOW", 4096))
ITERS = int(os.environ.get("P2M_ITERS", 3))
MEMFIT = float(os.environ.get("P2M_MEMFIT", 0.0))
HEAD_CHUNK = int(os.environ.get("P2M_HEAD_CHUNK", 0))
HEAD_STREAM = os.environ.get("P2M_HEAD_STREAM", "on")
BLOCK_SCAN = os.environ.get("P2M_BLOCK_SCAN", "auto")
# 1 = drop the saved-knn_idx remat policy (re-run the kNN kernels in
# backward, round-1 style): trades ~2x kNN time for the stacked saved
# (L,B,N,k) int32 residuals — a memory arm for the allocator attack
NO_SAVE_IDX = os.environ.get("P2M_NO_SAVE_IDX", "0") == "1"
HEAD_FACTORIZED = os.environ.get("P2M_HEAD_FACTORIZED", "0") == "1"
KNN_EVERY = int(os.environ.get("P2M_KNN_EVERY", 1))
PRECISION = os.environ.get("P2M_PRECISION", "default")
FULL_ERR = os.environ.get("P2M_FULL_ERR", "0") == "1"
# 1 = lane-pack the fused backward's scatter-loop residents (dm/aw/base)
# as (bl, N*C/128, 128) — the models/head.py trick applied at the
# boundary the 2M closure blames for two ~0.9 G relayout copies
SCATTER_PACK = os.environ.get("P2M_SCATTER_PACK", "0") == "1"
# 0 = keep the default; else force ops.edge.SCATTER_CHUNK_ROWS
SCATTER_CHUNK = int(os.environ.get("P2M_SCATTER_CHUNK", 0))

if MEMFIT:
    jax.config.update("jax_memory_fitting_effort", MEMFIT)

import numpy as np  # noqa: E402

import dgcnn_tpu.models.head as head_mod  # noqa: E402

import dgcnn_tpu.ops.edge as edge_mod  # noqa: E402

if HEAD_CHUNK:
    head_mod.HEAD_CHUNK_TARGET_ELEMS = HEAD_CHUNK
if SCATTER_PACK:
    edge_mod.SCATTER_PACK_OPERANDS = True
if SCATTER_CHUNK:
    edge_mod.SCATTER_CHUNK_ROWS = SCATTER_CHUNK
if NO_SAVE_IDX:
    # neutralize the checkpoint_name tag: save_only_these_names("knn_idx")
    # then matches nothing and the remat policy recomputes the graph
    # builds in backward instead of saving the stacked indices
    import jax.ad_checkpoint

    jax.ad_checkpoint.checkpoint_name = lambda x, name: x

from dgcnn_tpu.config import Config  # noqa: E402
from dgcnn_tpu.io import BucketBatcher, SyntheticIO  # noqa: E402
from dgcnn_tpu.parallel.mesh import make_mesh  # noqa: E402
from dgcnn_tpu.train import Trainval  # noqa: E402


def main():
    tag = (
        f"N={N} W={WINDOW} memfit={MEMFIT} head_chunk={HEAD_CHUNK or 'def'} "
        f"hs={HEAD_STREAM} hf={int(HEAD_FACTORIZED)} ke={KNN_EVERY} "
        f"prec={PRECISION} bscan={BLOCK_SCAN} nsi={int(NO_SAVE_IDX)} "
        f"spack={int(SCATTER_PACK)} schunk={SCATTER_CHUNK or 'def'}"
    )
    cfg = Config(
        model_name="residual-dgcnn", num_class=2, kvalue=20,
        edge_filters=(64,) * 6, minibatch_size=1, num_point=N,
        use_pallas=True, remat=True, knn_window=WINDOW,
        knn_every=KNN_EVERY, head_stream=HEAD_STREAM,
        head_factorized=HEAD_FACTORIZED, precision=PRECISION,
        block_scan=BLOCK_SCAN,
    )
    tv = Trainval(cfg, mesh=make_mesh(1))
    state = tv.initialize(4)
    io = SyntheticIO(
        num_events=1, num_point=N, seed=0, variable_length=False
    ).initialize()
    batch = next(BucketBatcher(io, 1, num_point=N, shuffle=False).epoch())
    try:
        t_c0 = time.perf_counter()
        state, metrics = tv.train_step(state, batch)
        loss = float(metrics["loss"])
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, metrics = tv.train_step(state, batch)
        loss = float(metrics["loss"])
        dt = (time.perf_counter() - t0) / ITERS
        print(
            f"RESULT ok {tag}: step={dt * 1e3:.0f} ms "
            f"({N / dt:.0f} pts/s) loss={loss:.4f} "
            f"(compile+1st {compile_s:.0f}s)",
            flush=True,
        )
    except Exception as e:
        msg = str(e)
        if FULL_ERR:
            print(f"RESULT OOM {tag}:\n{msg[:20000]}", flush=True)
            sys.exit(1)
        # keep the allocator's own numbers (peak / largest allocations)
        tail = "\n".join(
            ln for ln in msg.splitlines()
            if any(w in ln for w in (
                "Out of memory", "bytes", "peak", "Largest", "fragmentation",
                "Error", "RESOURCE",
            ))
        )[:2000]
        print(f"RESULT OOM {tag}:\n{tail}", flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
