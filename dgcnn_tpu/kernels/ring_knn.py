"""Ring kNN + ring gather: context parallelism over the point axis.

The reference caps event size at a fixed NUM_POINT because its kNN is
O(N²) on one device [H per SURVEY.md §5 long-context row]. For 100k+
point events (BASELINE config 5) the rebuild shards the *point* dimension
across the ``points`` mesh axis and passes point blocks around the ICI
ring with `ppermute` — the ring-attention-shaped pattern from SURVEY.md
§2.2 — while every device maintains a running top-k for its resident
queries. Peak memory per device is O(N_local² ) per step instead of
O(N²), and the blockwise Pallas kernel (knn_pallas) can be used for the
local tile scoring on TPU.

`ring_gather` is the companion halo exchange: after the graph is built,
EdgeConv needs neighbor features that live on other shards; each ring
step contributes the rows whose global indices fall in the block
currently held.

All functions here run inside `shard_map` over the ``points`` axis (works
on a multi-device CPU mesh for tests; `ppermute` rides ICI on real TPU
slices).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dgcnn_tpu.parallel.collectives import ppermute_ring
from dgcnn_tpu.parallel.mesh import POINT_AXIS


def _ring_pass(x, axis_name):
    """Send our block to the next device in the ring (and receive)."""
    return ppermute_ring(x, 1, axis_name)


def _block_scores(q, blk, blk_mask, precision):
    """Masked negative squared distances of local queries vs a block.

    q: (B, Nq, C); blk: (B, Nb, C); blk_mask: (B, Nb) → (B, Nq, Nb).
    """
    q2 = jnp.sum(jnp.square(q), axis=-1)
    b2 = jnp.sum(jnp.square(blk), axis=-1)
    inner = jnp.einsum("...ic,...jc->...ij", q, blk, precision=precision)
    # exactly the oracle's expression order (ops.knn.pairwise_sq_dists) so
    # per-element scores are bitwise identical and tie order transfers
    d = q2[..., :, None] + b2[..., None, :] - 2.0 * inner
    return jnp.where(blk_mask[..., None, :], -d, -jnp.inf)


def _tie_sort(vals, idx):
    """Sort each row's candidates by (value desc, index asc) — the global
    `lax.top_k` tie order, restored after out-of-order ring arrival."""
    order1 = jnp.argsort(idx, axis=-1, stable=True)
    v1 = jnp.take_along_axis(vals, order1, axis=-1)
    i1 = jnp.take_along_axis(idx, order1, axis=-1)
    order2 = jnp.argsort(-v1, axis=-1, stable=True)
    return (
        jnp.take_along_axis(v1, order2, axis=-1),
        jnp.take_along_axis(i1, order2, axis=-1),
    )


def ring_knn(
    x_shard,
    k: int,
    mask_shard=None,
    *,
    axis_name: str = POINT_AXIS,
    precision=None,
    use_pallas: bool = False,
):
    """kNN over points sharded along ``axis_name``.

    Args:
      x_shard: (B, N_local, C) — this device's contiguous point shard
        (global point g lives on shard g // N_local at row g % N_local).
      k: neighbor count; must be ≤ N_local.
      mask_shard: optional (B, N_local) validity.

    Returns:
      idx: (B, N_local, k) **global** neighbor indices, ordered exactly as
        a single-device `lax.top_k` over all N points would order them.
      valid: (B, N_local, k) False where fewer than k valid points exist
        globally (slots degrade to global self-index).
    """
    n_shards = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    nl = x_shard.shape[-2]
    if k > nl:
        raise ValueError(f"k={k} > local shard size {nl}")

    if mask_shard is None:
        mask_shard = jnp.ones(x_shard.shape[:-1], bool)

    if use_pallas:
        # in-block scoring via the fused kernel: per-block top-k never
        # materializes the (Nq, Nb) score matrix, and the kernel's scores
        # (‖q‖² − D, per-query offset) are directly comparable across
        # ring steps. TPU path for real multi-chip slices; the jnp path
        # below stays bitwise-identical to the global oracle.
        from dgcnn_tpu.kernels.knn_pallas import knn_pallas_cross

        def block_topk(blk, blk_mask):
            bi, bvalid, bv = knn_pallas_cross(
                x_shard, blk, k, blk_mask, precision=precision
            )
            return jnp.where(bvalid, bv, -jnp.inf), bi
    else:

        def block_topk(blk, blk_mask):
            scores = _block_scores(x_shard, blk, blk_mask, precision)
            return jax.lax.top_k(scores, k)

    def step(carry, s):
        topv, topi, blk, blk_mask = carry
        owner = (me - s) % n_shards  # ring shifted s times → owner's block
        bv, bi = block_topk(blk, blk_mask)
        cand_v = jnp.concatenate([topv, bv], axis=-1)
        cand_i = jnp.concatenate([topi, bi + owner * nl], axis=-1)
        cand_v, cand_i = _tie_sort(cand_v, cand_i)
        topv = cand_v[..., :k]
        topi = cand_i[..., :k]
        blk = _ring_pass(blk, axis_name)
        blk_mask = _ring_pass(blk_mask, axis_name)
        return (topv, topi, blk, blk_mask), None

    topv0 = jnp.full(x_shard.shape[:-1] + (k,), -jnp.inf, x_shard.dtype)
    topi0 = jnp.zeros(x_shard.shape[:-1] + (k,), jnp.int32)
    carry = (topv0, topi0, x_shard, mask_shard)
    # unrolled python loop: n_shards is static; each step's ppermute
    # overlaps the next block's arrival with this block's matmul under XLA
    for s in range(n_shards):
        carry, _ = step(carry, s)
    topv, topi, _, _ = carry

    valid = jnp.isfinite(topv)
    self_global = (
        jnp.arange(nl, dtype=jnp.int32)[None, :, None] + me.astype(jnp.int32) * nl
    )
    idx = jnp.where(valid, topi, self_global)
    return idx.astype(jnp.int32), valid


def ring_gather(
    values_shard,
    idx_global,
    *,
    axis_name: str = POINT_AXIS,
):
    """Gather rows of a point-sharded array by global indices.

    Args:
      values_shard: (B, N_local, C) — this device's shard of a (B, N, C)
        global array.
      idx_global: (B, N_local, k) global row indices (any shard).

    Returns:
      (B, N_local, k, C) gathered rows — the EdgeConv halo exchange.
    """
    n_shards = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    nl = values_shard.shape[-2]

    out = jnp.zeros(idx_global.shape + values_shard.shape[-1:], values_shard.dtype)
    blk = values_shard
    for s in range(n_shards):
        owner = (me - s) % n_shards
        mine = (idx_global // nl) == owner
        local = jnp.clip(idx_global - owner * nl, 0, nl - 1)
        b, n_loc, k = local.shape
        flat = local.reshape(b, n_loc * k)
        got = jnp.take_along_axis(blk, flat[..., None], axis=-2)
        got = got.reshape(b, n_loc, k, -1)
        out = jnp.where(mine[..., None], got, out)
        blk = _ring_pass(blk, axis_name)
    return out
