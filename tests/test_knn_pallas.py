"""Fused Pallas kNN vs. the jnp oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.kernels.knn_pallas import knn_pallas
from dgcnn_tpu.ops.knn import knn_indices, pairwise_sq_dists


def _assert_knn_equivalent(x, idx_k, idx_o, atol=1e-5):
    """Exact index match, except positions where the two candidates are
    equidistant to float tolerance (reassociation ties)."""
    mismatch = np.asarray(idx_k) != np.asarray(idx_o)
    if not mismatch.any():
        return
    d = np.asarray(pairwise_sq_dists(jnp.asarray(x), precision=jax.lax.Precision.HIGHEST))
    bb, ii, jj = np.nonzero(mismatch)
    for b, i, j in zip(bb, ii, jj):
        d_k = d[b, i, int(np.asarray(idx_k)[b, i, j])]
        d_o = d[b, i, int(np.asarray(idx_o)[b, i, j])]
        assert abs(d_k - d_o) < atol, (
            f"non-tie mismatch at {(b, i, j)}: kernel d={d_k}, oracle d={d_o}"
        )


@pytest.mark.parametrize("n,c,k", [(256, 3, 8), (512, 64, 20), (384, 16, 20)])
def test_knn_pallas_matches_oracle(n, c, k):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, n, c).astype(np.float32))
    idx_k, valid_k = knn_pallas(x, k, interpret=True)
    idx_o, valid_o = knn_indices(x, k, precision=jax.lax.Precision.HIGHEST)
    assert idx_k.shape == idx_o.shape == (2, n, k)
    _assert_knn_equivalent(x, idx_k, idx_o)
    np.testing.assert_array_equal(np.asarray(valid_k), np.asarray(valid_o))


def test_knn_pallas_masked():
    rng = np.random.RandomState(1)
    n = 256
    x = jnp.asarray(rng.randn(1, n, 8).astype(np.float32))
    mask = jnp.asarray((np.arange(n) < 100)[None])
    idx_k, valid_k = knn_pallas(x, 12, mask, interpret=True)
    idx_o, valid_o = knn_indices(x, 12, mask, precision=jax.lax.Precision.HIGHEST)
    # valid queries: no padded neighbor
    assert np.asarray(idx_k)[0, :100].max() < 100
    _assert_knn_equivalent(x, idx_k, idx_o)
    np.testing.assert_array_equal(np.asarray(valid_k), np.asarray(valid_o))


def test_knn_pallas_fewer_than_k():
    rng = np.random.RandomState(2)
    n = 128
    x = jnp.asarray(rng.randn(1, n, 4).astype(np.float32))
    mask = jnp.asarray((np.arange(n) < 5)[None])
    idx_k, valid_k = knn_pallas(x, 8, mask, interpret=True)
    idx_o, valid_o = knn_indices(x, 8, mask, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_array_equal(np.asarray(valid_k), np.asarray(valid_o))
    # degraded slots are self-edges, like the oracle
    np.testing.assert_array_equal(
        np.asarray(idx_k)[0, :5, 5:], np.asarray(idx_o)[0, :5, 5:]
    )
    _assert_knn_equivalent(x, idx_k, idx_o)


def test_knn_pallas_nonaligned_n():
    """N not a multiple of the block sizes exercises the padding path."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 200, 6).astype(np.float32))
    idx_k, valid_k = knn_pallas(x, 10, interpret=True)
    idx_o, _ = knn_indices(x, 10, precision=jax.lax.Precision.HIGHEST)
    assert np.asarray(idx_k).max() < 200  # padded keys never selected
    _assert_knn_equivalent(x, idx_k, idx_o)


def test_knn_pallas_in_model_forward():
    """knn_fn drop-in: model forward with Pallas kNN ≈ oracle forward."""
    from dgcnn_tpu.models import ModelSpec, get_model

    spec = ModelSpec(num_class=3, k=8, edge_filters=(16,), head_feat_dim=32, head_mlp=(32,))
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 256, 4))
    mask = jnp.ones((1, 256), bool)

    m_oracle = get_model("dgcnn", spec, precision=jax.lax.Precision.HIGHEST)
    m_pallas = get_model(
        "dgcnn", spec,
        knn_fn=lambda x, k, mask: knn_pallas(x, k, mask, interpret=True),
        precision=jax.lax.Precision.HIGHEST,
    )
    params, state = m_oracle.init(rng, 4)
    lo, _ = m_oracle.apply(params, state, x, mask, train=True)
    lp, _ = m_pallas.apply(params, state, x, mask, train=True)
    np.testing.assert_allclose(np.asarray(lo), np.asarray(lp), atol=2e-4)
