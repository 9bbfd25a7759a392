"""Numerical gradient checks (SURVEY.md §4 unit strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.test_util import check_grads

from dgcnn_tpu.ops import edge_preact_factorized, knn_indices, softmax_cross_entropy
from dgcnn_tpu.ops.norm import batch_norm_apply, batch_norm_init


def test_edgeconv_block_grads():
    rng = np.random.RandomState(0)
    b, n, c, k, d = 1, 32, 4, 6, 8
    x = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    w = jnp.asarray((rng.randn(2 * c, d) * 0.3).astype(np.float32))
    idx, _ = knn_indices(x, k)  # graph fixed (non-differentiable), like top_k

    def f(x, w):
        h = edge_preact_factorized(x, idx, w)
        return jnp.sum(jnp.max(jax.nn.relu(h), axis=-2))

    check_grads(f, (x, w), order=1, modes=("rev",), atol=1e-2, rtol=1e-2)


def test_masked_bn_grads():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 8).astype(np.float32))
    mask = jnp.asarray((rng.rand(2, 16) > 0.3))
    params, state = batch_norm_init(8)

    def f(x, scale, bias):
        y, _ = batch_norm_apply(
            {"scale": scale, "bias": bias}, state, x, mask, train=True
        )
        return jnp.sum(y * mask[..., None])

    check_grads(
        f, (x, params["scale"], params["bias"]), order=1, modes=("rev",),
        atol=2e-2, rtol=2e-2,
    )


def test_masked_xent_grads():
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(2, 10, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 3, (2, 10)))
    mask = jnp.asarray(rng.rand(2, 10) > 0.3)
    w = jnp.asarray(rng.rand(2, 10).astype(np.float32))

    def f(logits):
        return softmax_cross_entropy(logits, labels, weights=w, mask=mask)

    check_grads(f, (logits,), order=2, modes=("rev",), atol=1e-2, rtol=1e-2)
