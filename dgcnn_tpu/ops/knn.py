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


def band_lo(pos, nvalid, window: int):
    """First candidate position of each query's banded window.

    THE window-defining expression, in exactly one place — shared by the
    jnp oracle (`banded_knn_indices`) and the Pallas banded kernel
    (`kernels.knn_banded`) so the two can never drift: a query at sorted
    position ``pos`` sees the ``window`` consecutive sorted positions
    centered on it, clipped so the window stays inside the valid region
    ``[0, nvalid)`` whenever ``nvalid >= window`` (every valid query then
    scores exactly ``window`` real candidates).

    Args:
      pos: int32 sorted position(s) of the query (any shape).
      nvalid: scalar (or broadcastable) int32 count of valid points.
      window: static candidate-window size.

    Returns:
      int32 ``lo`` of the same shape as ``pos``; the window is
      ``[lo, lo + window)``.
    """
    hi = jnp.maximum(nvalid - window, 0)
    return jnp.clip(pos - window // 2, 0, hi).astype(jnp.int32)


def _banded_select_core(
    xq_all,
    sq_all,
    keys_ext,
    ksq_ext,
    km_ext,
    *,
    key_base,
    q_base,
    nvalid,
    k: int,
    w: int,
    qb: int,
    precision,
):
    """Shared banded top-k selection over one event (or one event's shard).

    THE selection expression of the banded path, in exactly one place —
    called by the single-device oracle (`banded_knn_indices`, with
    ``q_base = key_base = 0``) and by the context-parallel halo path
    (`kernels.halo_knn`, with per-shard offsets), so the two are bitwise
    identical wherever both have the candidate rows: per-element scores,
    band masks and `top_k` tie order all come from this function.

    Args:
      xq_all: ``(NQ, C)`` query rows; query ``r`` sits at global sorted
        position ``q_base + r``.
      sq_all: ``(NQ,)`` precomputed ``|x|^2`` of the query rows.
      keys_ext: ``(M, C)`` candidate rows; row ``j`` sits at global sorted
        position ``key_base + j``. Must cover every chunk's span slice
        ``[band_lo(chunk) - key_base, ... + w + qb)`` for chunks whose
        first query is valid (callers guarantee this — the oracle pads by
        ``qb``, the halo path carries a ``w``-row halo per side); chunks
        of all-invalid queries may slice clamped garbage, which callers
        must discard (the halo path forces those rows to self-edges).
      ksq_ext / km_ext: ``(M,)`` ``|x|^2`` and validity of the candidate
        rows.
      nvalid: scalar int32 count of valid points in the WHOLE event.
      k / w / qb: neighbor count, window size, query-chunk size
        (``NQ % qb == 0``).
      precision: scoring matmul precision.

    Returns:
      ``vals``: ``(NQ, k)`` selected scores (−inf where fewer than ``k``
        in-band valid candidates existed).
      ``idx``: ``(NQ, k)`` GLOBAL sorted positions of the selections
        (meaningless where ``vals`` is −inf — callers substitute self).
    """
    nq, c = xq_all.shape
    span = w + qb

    def chunk(s):
        rows = q_base + s * qb + jnp.arange(qb, dtype=jnp.int32)
        lo = band_lo(rows, nvalid, w)  # (qb,)
        ulo = lo[0]  # lo is monotone non-decreasing in position
        start = ulo - key_base
        keys = jax.lax.dynamic_slice(keys_ext, (start, 0), (span, c))
        ksq = jax.lax.dynamic_slice(ksq_ext, (start,), (span,))
        km = jax.lax.dynamic_slice(km_ext, (start,), (span,))
        xq = jax.lax.dynamic_slice(xq_all, (s * qb, 0), (qb, c))
        inner = jnp.einsum("ic,jc->ij", xq, keys, precision=precision)
        neg = -(
            jax.lax.dynamic_slice(sq_all, (s * qb,), (qb,))[:, None]
            + ksq[None, :]
            - 2.0 * inner
        )
        gcol = ulo + jnp.arange(span, dtype=jnp.int32)[None, :]
        band = (gcol >= lo[:, None]) & (gcol < (lo + w)[:, None])
        neg = jnp.where(band & km[None, :], neg, -jnp.inf)
        vals, cols = jax.lax.top_k(neg, k)
        return vals, ulo + cols

    vals, idx = jax.lax.map(
        chunk, jnp.arange(nq // qb, dtype=jnp.int32)
    )  # (nb, qb, k)
    return vals.reshape(nq, k), idx.reshape(nq, k).astype(jnp.int32)


def banded_knn_indices(
    x: jax.Array,
    k: int,
    mask: jax.Array | None = None,
    *,
    window: int,
    precision=None,
    block_q: int = 1024,
) -> tuple[jax.Array, jax.Array]:
    """Banded kNN over SFC-SORTED points: O(N·window) instead of O(N²).

    ``x`` must already be in space-filling-curve order with padded points
    sorted last (`ops.sfc.morton_order` — the model permutes once at
    entry when ``--knn_window > 0``). Each query at sorted position ``i``
    selects its top-k only among the ``window`` consecutive sorted
    positions ``[band_lo(i), band_lo(i) + window)`` — sorted-position
    proximity proxies feature proximity, so this recovers most of the
    exact graph at a fraction of its cost (recall measured in
    `benchmarks/probe_banded.py`; accuracy in the convergence bench).

    Same return contract as `knn_indices` (self-inclusion, tie order =
    lowest index, <k-candidate slots degrade to self-edges with
    ``neighbor_valid`` False). With ``window >= N`` the candidate set is
    every valid point and the selected neighbor SETS equal the exact
    oracle's. No reference analog: the reference is exact-only [H per
    SURVEY.md §0.6]; this is the TPU-native sub-quadratic opt-in
    (`--knn_window`).
    """
    n = x.shape[-2]
    w = min(window, n)
    if w >= n and n <= block_q:
        # degenerate: the band covers everything — use the exact path
        return knn_indices(x, k, mask, precision=precision)
    qb = min(block_q, n)
    while n % qb:
        qb //= 2

    def one_event(xe, maske):
        nvalid = (
            jnp.int32(n) if maske is None else jnp.sum(maske).astype(jnp.int32)
        )
        sq = jnp.sum(jnp.square(xe), axis=-1)  # (N,)
        # pad keys by qb rows so the span slice never clips; padded rows
        # are masked out
        xp = jnp.pad(xe, ((0, qb), (0, 0)))
        sqp = jnp.pad(sq, (0, qb))
        mp = jnp.pad(
            jnp.ones((n,), bool) if maske is None else maske, (0, qb)
        )
        vals, idx = _banded_select_core(
            xe, sq, xp, sqp, mp,
            key_base=0, q_base=0, nvalid=nvalid,
            k=k, w=w, qb=qb, precision=precision,
        )
        self_idx = jnp.arange(n, dtype=jnp.int32)[:, None]
        valid = jnp.isfinite(vals)
        return jnp.where(valid, idx, self_idx), valid

    batch_shape = x.shape[:-2]
    if not batch_shape:
        return one_event(x, mask)
    xf = x.reshape((-1,) + x.shape[-2:])
    mf = None if mask is None else mask.reshape((-1, n))
    if mf is None:
        idx, valid = jax.vmap(lambda xe: one_event(xe, None))(xf)
    else:
        idx, valid = jax.vmap(one_event)(xf, mf)
    return (
        idx.reshape(batch_shape + (n, k)),
        valid.reshape(batch_shape + (n, k)),
    )


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
