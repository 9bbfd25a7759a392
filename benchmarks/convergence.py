#!/usr/bin/env python
"""Convergence benchmark: the accuracy north star, made recordable.

BASELINE.json's accuracy target ("bit-comparable mIoU") is operationalized
locally (SURVEY.md §4): the frozen-oracle fixture pins model *semantics*;
this benchmark pins training *quality* — fixed synthetic dataset + seed,
fixed flagship config, N steps → loss/acc/mIoU recorded in BASELINE.md so
later rounds cannot trade accuracy for speed invisibly. A scaled-down
pinned version runs in CI (tests/test_convergence.py).

Usage (real TPU): python benchmarks/convergence.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STEPS = int(os.environ.get("CONV_STEPS", 300))
N = int(os.environ.get("CONV_N", 4096))
KNN_EVERY = int(os.environ.get("CONV_KNN_EVERY", 1))
KNN_WINDOW = int(os.environ.get("CONV_KNN_WINDOW", 0))
HEAD_FACTORIZED = os.environ.get("CONV_HEAD_FACTORIZED", "0") == "1"
SEED = int(os.environ.get("CONV_SEED", 7))
# large-N knobs (the 131k-convergence comparison and the block_scan /
# head_stream forced-on accuracy pins — VERDICT r4 #1b/#4): batch size,
# train-set size, remat, and the non-model-defining execution knobs
MINIBATCH = int(os.environ.get("CONV_MB", 4))
NUM_EVENTS = int(os.environ.get("CONV_EVENTS", 32))
REMAT = os.environ.get("CONV_REMAT", "0") == "1"
BLOCK_SCAN = os.environ.get("CONV_BLOCK_SCAN", "auto")
HEAD_STREAM = os.environ.get("CONV_HEAD_STREAM", "auto")
# Force the N-chunked fused-backward scatter at pin scale (VERDICT r4 #4:
# the convergence pin for block_scan should also exercise the chunked
# scatter, whose default threshold only engages >1.5M rows). Value =
# SCATTER_CHUNK_ROWS override; at the pinned 4x4096 config, 4096 yields
# 4 chunks per _resolve_scatter_chunks.
SCATTER_CHUNK = int(os.environ.get("CONV_SCATTER_CHUNK", 0))


def run(steps=STEPS, n_point=N, edge_filters=(64,) * 6, head=(1024, (512, 256)),
        minibatch=MINIBATCH, num_events=NUM_EVENTS, kvalue=20, seed=SEED,
        use_pallas=True, num_devices=0, knn_every=KNN_EVERY,
        knn_window=KNN_WINDOW, head_factorized=HEAD_FACTORIZED,
        remat=REMAT, block_scan=BLOCK_SCAN, head_stream=HEAD_STREAM,
        scatter_chunk=SCATTER_CHUNK):
    import jax

    if scatter_chunk:
        from dgcnn_tpu.ops import edge as _edge_mod

        _saved_chunk = _edge_mod.SCATTER_CHUNK_ROWS
        _edge_mod.SCATTER_CHUNK_ROWS = scatter_chunk
        try:
            return _run_body(
                steps, n_point, edge_filters, head, minibatch, num_events,
                kvalue, seed, use_pallas, num_devices, knn_every, knn_window,
                head_factorized, remat, block_scan, head_stream)
        finally:
            _edge_mod.SCATTER_CHUNK_ROWS = _saved_chunk
    return _run_body(
        steps, n_point, edge_filters, head, minibatch, num_events, kvalue,
        seed, use_pallas, num_devices, knn_every, knn_window,
        head_factorized, remat, block_scan, head_stream)


def _run_body(steps, n_point, edge_filters, head, minibatch, num_events,
              kvalue, seed, use_pallas, num_devices, knn_every, knn_window,
              head_factorized, remat, block_scan, head_stream):
    from dgcnn_tpu.config import Config
    from dgcnn_tpu.io import BucketBatcher, SyntheticIO
    from dgcnn_tpu.ops.loss import mean_iou
    from dgcnn_tpu.train import Trainval

    cfg = Config(
        model_name="residual-dgcnn",
        num_class=2,
        kvalue=kvalue,
        edge_filters=edge_filters,
        head_feat_dim=head[0],
        head_mlp=head[1],
        minibatch_size=minibatch,
        num_point=n_point,
        use_pallas=use_pallas,
        iteration=steps,
        seed=seed,
        num_devices=num_devices,
        knn_every=knn_every,
        knn_window=knn_window,
        head_factorized=head_factorized,
        remat=remat,
        block_scan=block_scan,
        head_stream=head_stream,
    )
    tv = Trainval(cfg)
    state = tv.initialize(4)
    io = SyntheticIO(num_events=num_events, num_point=n_point, seed=seed).initialize()
    batcher = BucketBatcher(io, minibatch, num_point=n_point, shuffle=True, seed=seed)
    losses = []
    for i, batch in enumerate(batcher.forever()):
        if i >= steps:
            break
        state, metrics = tv.train_step(state, batch)
        if (i + 1) % max(steps // 10, 1) == 0:
            losses.append(float(metrics["loss"]))
            print(f"step {i+1}: loss={losses[-1]:.4f}", flush=True)

    # held-out eval (fresh events, eval-mode BN)
    val_io = SyntheticIO(num_events=16, num_point=n_point, seed=seed + 1).initialize()
    cm = np.zeros((2, 2), np.float64)
    for batch in BucketBatcher(val_io, minibatch, num_point=n_point, shuffle=False).epoch():
        m = tv.evaluate(state, batch)
        cm += np.asarray(m["confusion"], np.float64)
    acc = float(np.trace(cm) / cm.sum())
    miou = float(mean_iou(cm))
    return {"final_loss": losses[-1], "val_acc": acc, "val_miou": miou, "steps": steps}


if __name__ == "__main__":
    out = run()
    print(json.dumps(out), flush=True)
