"""Feasibility probe: recall of Morton-banded kNN candidate sets.

Question: if points are sorted along a Z-order (Morton) curve on their
spatial coordinates and each query may only select neighbors from a
window of W consecutive sorted positions, what fraction of the EXACT
kNN graph survives?  This bounds the quality of a sub-quadratic
O(N*W) banded kNN (the only lever left at 131k points, where the exact
kernel sits at its O(N^2) roofline — BASELINE.md).

Run on CPU (numpy exact kNN, blocked): `python benchmarks/probe_banded.py`.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")
from dgcnn_tpu.io.synthetic import make_event  # noqa: E402


def _quantize(x: np.ndarray, bits: int) -> np.ndarray:
    lo = x.min(axis=0)
    hi = x.max(axis=0)
    return ((x - lo) / np.maximum(hi - lo, 1e-12) * (2**bits - 1)).astype(
        np.uint64
    )


def morton_order(x: np.ndarray, bits: int = 16) -> np.ndarray:
    """Sorted order along the Z-order curve (any dimension)."""
    q = _quantize(x, bits)
    ndim = x.shape[1]
    code_hi = np.zeros(len(x), np.uint64)
    code_lo = np.zeros(len(x), np.uint64)
    for b in range(bits):
        for d in range(ndim):
            pos = ndim * b + d
            bit = (q[:, d] >> np.uint64(b)) & np.uint64(1)
            if pos < 64:
                code_lo |= bit << np.uint64(pos)
            else:
                code_hi |= bit << np.uint64(pos - 64)
    return np.lexsort((code_lo, code_hi))


def hilbert_order(x: np.ndarray, bits: int = 10) -> np.ndarray:
    """Sorted order along the Hilbert curve (Skilling's transform)."""
    X = _quantize(x, bits).T.copy()  # (ndim, n)
    n_dims = X.shape[0]
    M = np.uint64(1) << np.uint64(bits - 1)
    # Skilling: Gray-decode axes into the transposed Hilbert integer
    Q = M
    while Q > np.uint64(1):
        P = Q - np.uint64(1)
        for i in range(n_dims):
            hi_mask = (X[i] & Q).astype(bool)
            X[0] = np.where(hi_mask, X[0] ^ P, X[0])
            t = (X[0] ^ X[i]) & P
            X[0] ^= np.where(hi_mask, np.uint64(0), t)
            X[i] ^= np.where(hi_mask, np.uint64(0), t)
        Q >>= np.uint64(1)
    # Gray encode
    for i in range(1, n_dims):
        X[i] ^= X[i - 1]
    t = np.zeros_like(X[0])
    Q = M
    while Q > np.uint64(1):
        t = np.where((X[n_dims - 1] & Q).astype(bool), t ^ (Q - np.uint64(1)), t)
        Q >>= np.uint64(1)
    for i in range(n_dims):
        X[i] ^= t
    # interleave transposed coordinates into one key (bit b of X[i] ->
    # position (bits-1-b)*ndim + (ndim-1-i) counted from the MSB side)
    code_hi = np.zeros(X.shape[1], np.uint64)
    code_lo = np.zeros(X.shape[1], np.uint64)
    total = bits * n_dims
    for b in range(bits):
        for i in range(n_dims):
            pos = total - 1 - ((bits - 1 - b) * n_dims + i)
            bit = (X[i] >> np.uint64(b)) & np.uint64(1)
            if pos < 64:
                code_lo |= bit << np.uint64(pos)
            else:
                code_hi |= bit << np.uint64(pos - 64)
    return np.lexsort((code_lo, code_hi))


def exact_knn(x: np.ndarray, k: int, block: int = 2048) -> np.ndarray:
    """Exact kNN indices (self included), blocked to bound memory."""
    n = len(x)
    sq = (x * x).sum(axis=1)
    out = np.empty((n, k), np.int64)
    for s in range(0, n, block):
        e = min(s + block, n)
        d = sq[s:e, None] + sq[None, :] - 2.0 * (x[s:e] @ x.T)
        out[s:e] = np.argpartition(d, k, axis=1)[:, :k]
    return out


def band_recall(order: np.ndarray, idx: np.ndarray, w: int) -> float:
    """Fraction of exact neighbor slots inside the centered sorted window."""
    n = len(order)
    pos = np.empty(n, np.int64)
    pos[order] = np.arange(n)
    lo = np.clip(pos - w // 2, 0, max(n - w, 0))
    pi = pos[idx]  # (n, k) sorted positions of the exact neighbors
    inside = (pi >= lo[:, None]) & (pi < (lo + w)[:, None])
    return float(inside.mean())


def main():
    k = 20
    rng = np.random.RandomState(0)
    for n in (16384, 32768):
        ev = make_event(rng, n, num_class=2)
        pts = ev.points  # (n, 4): xyz + value
        # layer-0 kNN is on the FULL input features (xyz + value); the sort
        # key can only use xyz — recall is measured against the full-feature
        # exact graph, so the value channel's effect is priced in
        idx_full = exact_knn(pts, k)
        orders = {
            "morton3(xyz)": morton_order(pts[:, :3]),
            "morton4(xyzv)": morton_order(pts),
            "hilbert3(xyz)": hilbert_order(pts[:, :3]),
            "hilbert4(xyzv)": hilbert_order(pts),
        }
        print(f"N={n}  (recall of the full-feature exact kNN, k={k})")
        for w in (1024, 2048, 4096, 8192, 16384):
            if w > n:
                continue
            row = " | ".join(
                f"{name} {band_recall(o, idx_full, w):6.2%}"
                for name, o in orders.items()
            )
            print(f"  W={w:6d} ({w/n:5.1%} of N): {row}")


if __name__ == "__main__":
    main()
