"""Edge features and factorized EdgeConv pre-activation vs. naive path."""

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.ops import (
    edge_features,
    edge_preact_factorized,
    gather_neighbors,
    knn_indices,
)


def test_gather_neighbors_matches_loop():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 30, 6).astype(np.float32)
    idx = rng.randint(0, 30, size=(2, 30, 5))
    out = np.asarray(gather_neighbors(jnp.asarray(x), jnp.asarray(idx)))
    for b in range(2):
        for i in range(30):
            for j in range(5):
                np.testing.assert_array_equal(out[b, i, j], x[b, idx[b, i, j]])


def test_edge_features_concat_semantics():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 20, 3).astype(np.float32)
    idx, _ = knn_indices(jnp.asarray(x), 4)
    e = np.asarray(edge_features(jnp.asarray(x), idx))
    assert e.shape == (1, 20, 4, 6)
    # slot 0 is the self-edge: x_j - x_i == 0, x_i part == x_i
    np.testing.assert_allclose(e[0, :, 0, :3], x[0], rtol=1e-6)
    np.testing.assert_allclose(e[0, :, 0, 3:], 0.0, atol=1e-6)


def test_factorized_preact_equals_naive_conv():
    rng = np.random.RandomState(2)
    b, n, c, k, d = 2, 40, 8, 6, 16
    x = rng.randn(b, n, c).astype(np.float32)
    w = (rng.randn(2 * c, d) * 0.1).astype(np.float32)
    bias = rng.randn(d).astype(np.float32)
    idx, _ = knn_indices(jnp.asarray(x), k)

    naive = jnp.einsum(
        "bnke,ed->bnkd",
        edge_features(jnp.asarray(x), idx),
        jnp.asarray(w),
        precision=jax.lax.Precision.HIGHEST,
    ) + bias
    fact = edge_preact_factorized(
        jnp.asarray(x), idx, jnp.asarray(w), jnp.asarray(bias),
        precision=jax.lax.Precision.HIGHEST,
    )
    np.testing.assert_allclose(np.asarray(fact), np.asarray(naive), atol=2e-5)
