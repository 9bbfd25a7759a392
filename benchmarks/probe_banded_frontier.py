#!/usr/bin/env python
"""Frontier-size banded-kNN recall probe (VERDICT r4 next-step #1a).

The headline frontier rows (131k-1.5M train, 2M-6M serve) run
``--knn_window`` at W/N ratios of 0.4-6.2%, but all prior recall
evidence was at N in {16k, 32k} (probe_banded.py) and all accuracy
evidence at N=4096 (W/N 12.5-25%, BASELINE.md). This probe measures
what the window actually captures WHERE THE FRONTIER RUNS: for each
dynamic-graph build of the banded flagship, the fraction of that
layer's EXACT kNN graph (k=20, computed on the layer's real feature
input) that lies inside the Morton band — which equals the banded
selection's recall exactly (an exact neighbor inside the window is
always among the window's top-k, since restricting the candidate set
can only remove competitors; ties break identically via the shared
score expression).

Method, per (N, W) regime:
  1. synthesize a LArTPC-style event (io.synthetic.make_event — the
     same generator every accuracy benchmark uses),
  2. optionally run PROBE_TRAIN_STEPS real banded training steps at
     that N (so deep-layer features are not random-init artifacts),
  3. run the banded flagship eval ONCE with a recording knn_fn,
     capturing each build's sorted input features,
  4. for each captured layer input, compute the EXACT kNN on the TPU
     (the O(N^2) Pallas kernel, HIGHEST precision — ~30 s/layer at 1M)
     and score band membership with ops.knn.band_lo (the one
     window-defining expression).

Layer 0's input is the Morton-sorted raw coords (the synthetic-track
case); layers 1+ are the model's own C=64 features. Self-slots are
included in the recall, matching probe_banded.py's convention.

Usage (real TPU):
  python benchmarks/probe_banded_frontier.py
  PROBE_REGIMES=1048576:4096 PROBE_TRAIN_STEPS=20 \
      python benchmarks/probe_banded_frontier.py
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
from dgcnn_tpu.kernels.knn_pallas import knn_pallas
from dgcnn_tpu.ops.knn import band_lo

K = int(os.environ.get("PROBE_K", 20))
TRAIN_STEPS = int(os.environ.get("PROBE_TRAIN_STEPS", 0))
_default = "131072:8192,524288:8192,1048576:4096"
REGIMES = [
    tuple(int(v) for v in s.split(":"))
    for s in os.environ.get("PROBE_REGIMES", _default).split(",")
]


def _flagship_cfg(n, w):
    from dgcnn_tpu.config import Config

    return Config(
        model_name="residual-dgcnn",
        num_class=2,
        kvalue=K,
        edge_filters=(64,) * 6,
        minibatch_size=1,
        num_point=n,
        use_pallas=True,
        knn_window=w,
        remat=True,
        iteration=max(TRAIN_STEPS, 1),
    )


def capture_layer_inputs(n, w):
    """Sorted per-build kNN inputs of the banded flagship at (n, w).

    Returns a list of (1, n, C) float32 device arrays: entry 0 is the
    Morton-sorted raw 4-feature coords, entries 1..5 the C=64 block
    features the 6-build flagship actually feeds its graph builds.
    """
    from dgcnn_tpu.io import BucketBatcher, SyntheticIO
    from dgcnn_tpu.models.dgcnn import make_model
    from dgcnn_tpu.train import Trainval

    cfg = _flagship_cfg(n, w)
    spec = cfg.model_spec()
    # fixed-length events: the probe passes mask=None to apply and to the
    # exact kernel, so every row must be a real point (padded zero rows
    # would join the graph and corrupt the recall)
    io = SyntheticIO(
        num_events=max(2, min(4, TRAIN_STEPS or 2)), num_point=n, seed=0,
        variable_length=False,
    ).initialize()
    batcher = BucketBatcher(io, 1, num_point=n, shuffle=True, seed=0)

    if TRAIN_STEPS:
        tv = Trainval(cfg)
        state = tv.initialize(4)
        t0 = time.perf_counter()
        for i, batch in enumerate(batcher.forever()):
            if i >= TRAIN_STEPS:
                break
            state, metrics = tv.train_step(state, batch)
        print(
            f"  trained {TRAIN_STEPS} steps in "
            f"{time.perf_counter() - t0:.0f}s (last loss "
            f"{float(metrics['loss']):.3f})",
            flush=True,
        )
        params = jax.device_get(state.params)
        mstate = jax.device_get(state.model_state)
    else:
        params = mstate = None

    records = []

    def rec_knn(x, k, mask):
        records.append(jnp.asarray(x, jnp.float32))
        return knn_pallas_banded(x, k, mask, window=w)

    # eval: remat off (no backward), streaming knobs inherit auto
    import dataclasses

    model = make_model(dataclasses.replace(spec, remat=False), knn_fn=rec_knn)
    if params is None:
        params, mstate = model.init(jax.random.PRNGKey(0), 4)
    batch = next(BucketBatcher(io, 1, num_point=n, shuffle=False).epoch())
    pts = jnp.asarray(np.asarray(batch.points))
    model.apply(params, mstate, pts, None, train=False)
    assert len(records) == len(spec.edge_filters), (
        f"expected one build per block, got {len(records)}"
    )
    return records


def _band_recall(idx_exact, lo, window):
    inside = (idx_exact >= lo[None, :, None]) & (
        idx_exact < (lo + window)[None, :, None]
    )
    return inside.mean()


for n, w in REGIMES:
    print(f"N={n} W={w} ({w / n:.2%} of N), train_steps={TRAIN_STEPS}",
          flush=True)
    records = capture_layer_inputs(n, w)
    # the exact graph per layer is the expensive part (O(N^2) kernel);
    # band membership is free — score several windows from one graph.
    # Features were captured from the W-banded model, so rows at other
    # windows are "what would this layer's graph recall be if only the
    # window changed" (exact for layer 0, whose input is W-independent).
    windows = sorted(
        {min(w * m, n) for m in (1, 2, 4, 8)} | {w // 2}
    )
    recalls = {wx: [] for wx in windows}
    for layer, x in enumerate(records):
        t0 = time.perf_counter()
        idx_exact, _ = knn_pallas(
            x, K, None, precision=jax.lax.Precision.HIGHEST
        )
        row = []
        for wx in windows:
            lo = band_lo(jnp.arange(n, dtype=jnp.int32), jnp.int32(n), wx)
            r = float(_band_recall(idx_exact, lo, wx))  # host sync
            recalls[wx].append(r)
            row.append(f"W={wx} {r:7.2%}")
        dt = time.perf_counter() - t0
        c = x.shape[-1]
        print(
            f"  layer {layer} (C={c:3d}): " + "  ".join(row)
            + f"   [exact kNN {dt:6.1f}s]",
            flush=True,
        )
    for wx in windows:
        print(
            f"  => W={wx:6d} ({wx / n:6.2%} of N): mean over builds "
            f"{np.mean(recalls[wx]):7.2%}  min {np.min(recalls[wx]):7.2%}",
            flush=True,
        )
