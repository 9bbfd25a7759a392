"""kNN oracle vs. brute-force numpy; mask semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.ops import knn_indices, pairwise_sq_dists


def brute_force_knn(x: np.ndarray, k: int, mask=None):
    """O(N^2) numpy reference using the same matmul identity + stable order."""
    sq = np.sum(x * x, axis=-1)
    d = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    if mask is not None:
        d = np.where(mask[None, :], d, np.inf)
    # top_k on -d: sort by (distance, index) — matches lax.top_k tie-breaks.
    order = np.lexsort((np.arange(d.shape[1])[None, :].repeat(d.shape[0], 0), d), axis=1)
    return order[:, :k]


@pytest.mark.parametrize("n,c,k", [(64, 3, 8), (200, 16, 20)])
def test_knn_matches_bruteforce(n, c, k):
    rng = np.random.RandomState(0)
    x = rng.randn(n, c).astype(np.float32)
    idx, valid = knn_indices(jnp.asarray(x)[None], k)
    expect = brute_force_knn(x, k)
    np.testing.assert_array_equal(np.asarray(idx)[0], expect)
    assert bool(jnp.all(valid))


def test_knn_self_is_first():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 50, 4).astype(np.float32)
    idx, _ = knn_indices(jnp.asarray(x), 5)
    np.testing.assert_array_equal(
        np.asarray(idx)[..., 0], np.broadcast_to(np.arange(50), (2, 50))
    )


def test_knn_mask_excludes_padding():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 40, 3).astype(np.float32)
    mask = np.zeros((1, 40), bool)
    mask[:, :25] = True
    idx, valid = knn_indices(jnp.asarray(x), 10, jnp.asarray(mask))
    # no valid query may select a padded neighbor
    assert np.all(np.asarray(idx)[0, :25] < 25)
    assert bool(jnp.all(valid[0, :25]))


def test_knn_fewer_than_k_valid_degrades_to_self():
    rng = np.random.RandomState(3)
    x = rng.randn(1, 32, 3).astype(np.float32)
    mask = np.zeros((1, 32), bool)
    mask[:, :4] = True  # only 4 valid points, ask for k=6
    idx, valid = knn_indices(jnp.asarray(x), 6, jnp.asarray(mask))
    idx, valid = np.asarray(idx), np.asarray(valid)
    for i in range(4):
        assert valid[0, i, :4].all()
        assert not valid[0, i, 4:].any()
        np.testing.assert_array_equal(idx[0, i, 4:], [i, i])  # self-edges


def test_pairwise_dists_symmetry_and_zero_diag():
    rng = np.random.RandomState(4)
    x = rng.randn(1, 30, 5).astype(np.float32)
    d = np.asarray(pairwise_sq_dists(jnp.asarray(x)))
    np.testing.assert_allclose(d, np.swapaxes(d, -1, -2), atol=1e-4)
    assert np.abs(np.diagonal(d, axis1=-2, axis2=-1)).max() < 1e-4


def test_blocked_oracle_matches_one_shot():
    """The memory-bounded (lax.map strip) oracle path returns exactly the
    one-shot matrix path's indices, incl. masks and self-edge degradation."""
    import jax

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 4096, 8).astype(np.float32))
    mask = jnp.asarray(rng.rand(2, 4096) > 0.1)
    for m in (None, mask):
        idx_a, val_a = knn_indices(x, 12, m, precision=jax.lax.Precision.HIGHEST, block_q=0)
        idx_b, val_b = knn_indices(x, 12, m, precision=jax.lax.Precision.HIGHEST, block_q=1024)
        np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_b))
        np.testing.assert_array_equal(np.asarray(val_a), np.asarray(val_b))
    # auto mode (N >= 4096 blocks) agrees too
    idx_c, _ = knn_indices(x, 12, mask, precision=jax.lax.Precision.HIGHEST)
    idx_a, _ = knn_indices(x, 12, mask, precision=jax.lax.Precision.HIGHEST, block_q=0)
    np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_c))
