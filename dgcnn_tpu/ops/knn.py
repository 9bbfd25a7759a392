"""Dynamic kNN graph construction (pure jnp oracle).

Reference behavior: `dgcnn/ops.py (knn)` [M per SURVEY.md §2 #7]: pairwise
squared distances via the matmul identity
``D_ij = |x_i|^2 + |x_j|^2 - 2 x_i . x_j`` followed by ``top_k(-D, k)``.
The graph is recomputed per EdgeConv layer from *learned features* — the
"dynamic" in DGCNN. Self-inclusion is preserved (D_ii = 0 makes each point
its own nearest neighbor), matching the reference semantics [H].

TPU-first extensions over the reference:
  * an explicit validity ``mask`` so padded points in variable-length
    batches are never selected as neighbors (their distance is +inf);
  * when an event has fewer than ``k`` valid points, the missing neighbor
    slots degrade to self-edges (``x_j - x_i = 0``) instead of reading
    padded garbage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_sq_dists(x: jax.Array, *, precision=None) -> jax.Array:
    """Squared Euclidean distances for every point pair.

    Args:
      x: ``(..., N, C)`` point features.
      precision: optional ``jax.lax.Precision`` for the inner-product matmul
        (tests use HIGHEST for bit-comparability with the Pallas kernel).

    Returns:
      ``(..., N, N)`` with ``d[..., i, j] = ||x_i - x_j||^2`` (up to the
      usual catastrophic-cancellation floor of the matmul identity).
    """
    sq = jnp.sum(jnp.square(x), axis=-1)
    inner = jnp.einsum("...ic,...jc->...ij", x, x, precision=precision)
    return sq[..., :, None] + sq[..., None, :] - 2.0 * inner


def knn_indices(
    x: jax.Array,
    k: int,
    mask: jax.Array | None = None,
    *,
    precision=None,
    block_q: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Indices of the ``k`` nearest neighbors of every point (self included).

    Args:
      x: ``(..., N, C)`` point features.
      k: neighbor count (reference default 20).
      mask: optional ``(..., N)`` bool; False marks padded points that must
        never be selected as neighbors.
      block_q: query-block size for the memory-bounded path: distances are
        computed (block, N) at a time under ``lax.map`` instead of
        materializing the full (N, N) matrix. ``None`` (default) picks
        automatically (block at N ≥ 4096); ``0`` forces the one-shot
        matrix. Results are identical either way (each query row's
        distance expression and top_k are row-independent).

    Returns:
      ``idx``: ``(..., N, k)`` int32 neighbor indices, sorted by increasing
        distance (ties broken by lowest index — `jax.lax.top_k` semantics,
        which the Pallas kernel reproduces exactly).
      ``neighbor_valid``: ``(..., N, k)`` bool; False where fewer than ``k``
        valid points existed and the slot degraded to a self-edge.
    """
    n = x.shape[-2]
    if block_q is None:
        block_q = 2048 if n >= 4096 else 0
    if block_q and n > block_q and n % block_q == 0:
        return _knn_indices_blocked(
            x, k, mask, precision=precision, block_q=block_q
        )
    d = pairwise_sq_dists(x, precision=precision)
    neg = -d
    if mask is not None:
        neg = jnp.where(mask[..., None, :], neg, -jnp.inf)
    vals, idx = jax.lax.top_k(neg, k)
    self_idx = jnp.arange(n, dtype=idx.dtype).reshape((1,) * (idx.ndim - 2) + (n, 1))
    neighbor_valid = jnp.isfinite(vals)
    idx = jnp.where(neighbor_valid, idx, self_idx)
    return idx.astype(jnp.int32), neighbor_valid


def _knn_indices_blocked(x, k, mask, *, precision, block_q):
    """Memory-bounded oracle: (block_q, N) distance strips under lax.map.

    Same per-row math as the one-shot path (the distance expression and
    top_k act row-independently), so results match it exactly; peak
    intermediate memory drops from O(N²) to O(block_q·N) — what the
    serving artifact and the no-Pallas fallback need at 16k+ points."""
    n, c = x.shape[-2], x.shape[-1]
    batch_shape = x.shape[:-2]
    nb = n // block_q
    sq = jnp.sum(jnp.square(x), axis=-1)  # (..., N)
    key_mask = None if mask is None else mask[..., None, :]  # (..., 1, N)

    # blocks lead so lax.map sequences them: (nb, ..., block_q, C)
    xb = jnp.moveaxis(
        x.reshape(batch_shape + (nb, block_q, c)), -3, 0
    )
    sqb = jnp.moveaxis(sq.reshape(batch_shape + (nb, block_q)), -2, 0)

    def chunk(args):
        xq, sq_q = args
        inner = jnp.einsum("...ic,...jc->...ij", xq, x, precision=precision)
        d = sq_q[..., :, None] + sq[..., None, :] - 2.0 * inner
        neg = -d
        if key_mask is not None:
            neg = jnp.where(key_mask, neg, -jnp.inf)
        return jax.lax.top_k(neg, k)

    vals, idx = jax.lax.map(chunk, (xb, sqb))  # (nb, ..., block_q, k)
    vals = jnp.moveaxis(vals, 0, -3).reshape(batch_shape + (n, k))
    idx = jnp.moveaxis(idx, 0, -3).reshape(batch_shape + (n, k))
    self_idx = jnp.arange(n, dtype=idx.dtype).reshape(
        (1,) * len(batch_shape) + (n, 1)
    )
    neighbor_valid = jnp.isfinite(vals)
    idx = jnp.where(neighbor_valid, idx, self_idx)
    return idx.astype(jnp.int32), neighbor_valid
