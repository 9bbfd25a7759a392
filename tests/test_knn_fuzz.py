"""Seeded fuzz: fused kNN vs oracle across random shapes/masks/k."""

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.kernels.knn_pallas import knn_pallas
from dgcnn_tpu.ops.knn import knn_indices

HI = jax.lax.Precision.HIGHEST


def test_knn_pallas_fuzz():
    rng = np.random.RandomState(1234)
    for trial in range(10):
        b = int(rng.randint(1, 3))
        n = int(rng.choice([130, 200, 256, 300, 400, 512]))
        c = int(rng.choice([2, 3, 7, 16, 33]))
        k = int(rng.randint(1, min(17, n)))
        x = jnp.asarray(rng.randn(b, n, c).astype(np.float32) * rng.uniform(0.1, 10))
        if rng.rand() < 0.5:
            valid = rng.randint(max(k, 1), n + 1, size=b)
            mask = jnp.asarray(np.arange(n)[None, :] < valid[:, None])
        else:
            mask = None
        idx_k, val_k = knn_pallas(x, k, mask, interpret=True)
        idx_o, val_o = knn_indices(x, k, mask, precision=HI)
        tag = f"trial={trial} b={b} n={n} c={c} k={k}"
        np.testing.assert_array_equal(
            np.asarray(val_k), np.asarray(val_o), err_msg=tag
        )
        mm = np.asarray(idx_k) != np.asarray(idx_o)
        if mm.any():
            # allow only reassociation ties
            from dgcnn_tpu.ops.knn import pairwise_sq_dists

            d = np.asarray(pairwise_sq_dists(x, precision=HI))
            ik, io_ = np.asarray(idx_k), np.asarray(idx_o)
            for bb, ii, jj in zip(*np.nonzero(mm)):
                dk = d[bb, ii, ik[bb, ii, jj]]
                do = d[bb, ii, io_[bb, ii, jj]]
                assert abs(dk - do) < 1e-4 * max(1.0, abs(do)), (tag, bb, ii, jj)


def test_knn_pallas_duplicate_points_ties():
    """Exactly duplicated points (quantized detector data) — tie order
    must match lax.top_k's index-ascending rule."""
    rng = np.random.RandomState(5)
    base = rng.randn(40, 3).astype(np.float32)
    x = jnp.asarray(np.concatenate([base, base, base])[None])  # each point x3
    idx_k, _ = knn_pallas(x, 10, interpret=True)
    idx_o, _ = knn_indices(x, 10, precision=HI)
    np.testing.assert_array_equal(np.asarray(idx_k), np.asarray(idx_o))
