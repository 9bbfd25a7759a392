"""Edge-feature construction and the factorized EdgeConv pre-activation.

Reference behavior: `dgcnn/ops.py (edge_feature)` [M per SURVEY.md §2 #7]:
gather neighbors ``x_j = x[idx]`` and form
``e_ij = concat(x_i, x_j - x_i)`` of shape ``(..., N, k, 2C)`` [H].

TPU-first redesign — the *factorized* EdgeConv pre-activation:

The reference applies a 1x1 conv with weight ``W = [Wa; Wb]`` to
``concat(x_i, x_j - x_i)``, i.e. per edge::

    h_ij = x_i @ Wa + (x_j - x_i) @ Wb + b
         = x_i @ (Wa - Wb) + x_j @ Wb + b
         = P_i + Q_j + b            with  P = x @ (Wa - Wb),  Q = x @ Wb

so the MXU matmul runs once per *point* (``2 * N * C * D`` MACs) instead of
once per *edge* (``N * k * 2C * D`` MACs) — a ~k× FLOP reduction at
identical math (same floating-point contraction per channel pair, verified
bit-tight against the naive path in tests). The broadcast-add, gather,
activation and max-aggregation are cheap elementwise/VPU work that XLA
fuses without materializing the ``(..., N, k, D)`` tensor in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_neighbors(x: jax.Array, idx: jax.Array) -> jax.Array:
    """``out[..., i, j, :] = x[..., idx[..., i, j], :]``.

    Args:
      x: ``(..., N, C)``.
      idx: ``(..., N, k)`` int indices into the N axis.

    Returns:
      ``(..., N, k, C)`` gathered neighbor features.
    """
    n, k = idx.shape[-2], idx.shape[-1]
    flat = idx.reshape(idx.shape[:-2] + (n * k,))
    out = jnp.take_along_axis(x, flat[..., None], axis=-2)
    return out.reshape(idx.shape + (x.shape[-1],))


def edge_features(x: jax.Array, idx: jax.Array) -> jax.Array:
    """The reference's edge feature: ``concat(x_i, x_j - x_i)``.

    Returns ``(..., N, k, 2C)``. This is the oracle path; the production
    path never materializes this tensor (see `edge_preact_factorized`).
    """
    xj = gather_neighbors(x, idx)
    xi = jnp.broadcast_to(x[..., :, None, :], xj.shape)
    return jnp.concatenate([xi, xj - xi], axis=-1)


def edge_preact_factorized(
    x: jax.Array,
    idx: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    precision=None,
) -> jax.Array:
    """Factorized edge pre-activation ``h_ij = P_i + Q_j (+ b)``.

    Args:
      x: ``(..., N, C)`` point features.
      idx: ``(..., N, k)`` neighbor indices.
      w: ``(2C, D)`` shared-MLP weight, laid out as the reference's conv2d
        weight over ``concat(x_i, x_j - x_i)``: rows ``[:C]`` act on x_i,
        rows ``[C:]`` on ``(x_j - x_i)``.
      b: optional ``(D,)`` bias.

    Returns:
      ``(..., N, k, D)`` pre-activation, mathematically equal to
      ``edge_features(x, idx) @ w + b``.
    """
    c = x.shape[-1]
    wa, wb = w[:c], w[c:]
    p = jnp.einsum("...nc,cd->...nd", x, wa - wb, precision=precision)
    q = jnp.einsum("...nc,cd->...nd", x, wb, precision=precision)
    h = p[..., :, None, :] + gather_neighbors(q, idx)
    if b is not None:
        h = h + b
    return h
