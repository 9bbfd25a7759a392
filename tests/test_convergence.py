"""Training-quality pin (VERDICT round 1 next-step #5).

The frozen-oracle fixture pins model *semantics*; this pins training
*quality*: a fixed synthetic dataset + seed + config must keep reaching
the recorded held-out accuracy, so a future round cannot trade accuracy
for speed invisibly. Reference values recorded 2026-08-16 on CPU
(num_devices=1, 240 steps, 3x24 residual DGCNN, N=512, 64 events):
final_loss 0.492, val_acc 0.624, val_miou 0.448. The flagship-scale
numbers live in BASELINE.md (benchmarks/convergence.py on the TPU).

Tolerances are floors with headroom for cross-platform float drift —
a real training-quality regression (e.g. a broken gradient) lands far
below them, while run-to-run noise of this pinned seed is zero
(same-seed determinism is itself a tested invariant).
"""

import sys
import os

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks")
)


def test_pinned_convergence():
    from convergence import run

    out = run(
        steps=240,
        n_point=512,
        edge_filters=(24, 24, 24),
        head=(64, (32,)),
        minibatch=4,
        num_events=64,
        kvalue=8,
        seed=7,
        use_pallas=False,
        num_devices=1,
    )
    assert np.isfinite(out["final_loss"])
    assert out["final_loss"] <= 0.62, out   # recorded 0.492
    assert out["val_acc"] >= 0.575, out     # recorded 0.624
    assert out["val_miou"] >= 0.40, out     # recorded 0.448


def test_pinned_convergence_block_scan_chunked_scatter():
    """VERDICT r4 #4: block_scan's train side is the f32 reassociation
    class (BN batch stats fuse differently in the scan body) — give it
    the same quality floor as the plain pin, with the N-chunked
    fused-backward scatter forced engaged (SCATTER_CHUNK_ROWS=128 →
    4 chunks at N=512) so the full 2M-train feature stack trains to the
    pinned quality, not just to 30-step loss-drop. Same floors as
    test_pinned_convergence; the scan covers blocks 1-2 of the 3x24
    stack (block 0 differs structurally: in_dim != 24). Flagship-scale
    TPU numbers: BASELINE.md block_scan convergence row."""
    from convergence import run

    out = run(
        steps=240,
        n_point=512,
        edge_filters=(24, 24, 24),
        head=(64, (32,)),
        minibatch=4,
        num_events=64,
        kvalue=8,
        seed=7,
        use_pallas=False,
        num_devices=1,
        block_scan="on",
        scatter_chunk=128,
    )
    assert np.isfinite(out["final_loss"])
    assert out["final_loss"] <= 0.62, out
    assert out["val_acc"] >= 0.575, out
    assert out["val_miou"] >= 0.40, out
