"""Halo-exchange banded kNN + gather: banded graphs over sharded points.

The exact ring CP (`kernels.ring_knn`) passes EVERY point block around the
ICI ring — O(N) traffic per device per graph build — because an exact kNN
query can match any point. The banded path (`--knn_window`, SURVEY.md has
no reference analog — the reference is exact-only [H per §0.6]) already
restricts each query at sorted position ``p`` to the window
``[band_lo(p), band_lo(p) + W)`` ⊆ ``[p − W + 1, p + W)``: once the batch
is GLOBALLY Morton-sorted (Trainval sorts it before `shard_map` when
``point_shards > 1`` and ``knn_window > 0``), every device owns a
contiguous band of sorted positions and a query's whole candidate window
lives in its own shard plus at most ``W`` rows of each ring neighbor. So
the graph build and the per-block neighbor gather need only a **halo
exchange** — two `ppermute` sends of ``(B, W, C)`` per device — instead of
the full ring: O(W) ICI traffic instead of O(N_local · (D−1)).

Contract vs the single-device banded oracle (`ops.knn.banded_knn_indices`):

  * VALID query rows are BITWISE identical — scoring, band masks and tie
    order come from the shared `ops.knn._banded_select_core`, and a valid
    query's window always fits in the halo-extended candidate array
    (``band_lo(p) ≥ p − W + 1 ≥ off − W + 1`` and
    ``band_lo(p) + W ≤ p + W ≤ off + N_local − 1 + W``).
  * PADDED query rows are deterministic self-edges with ``valid`` False.
    (The single-device oracle lets padded queries select real in-window
    neighbors — harmless garbage that downstream masks discard — but a
    padded query far past the valid boundary can have its clipped window
    on a DISTANT shard, which no bounded halo covers. Forcing self keeps
    the halo O(W); downstream consumption is identical because every
    consumer masks padded rows.)

Requires ``window ≤ N_local`` (halo from the immediate ring neighbor
only) — Trainval validates this at build time. Wraparound halos at the
global edges (shard 0's left, shard D−1's right) carry rows whose claimed
positions fall outside ``[0, N)``; the position-based band mask can never
select them, so the plain ring `ppermute` is safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dgcnn_tpu.ops.knn import _banded_select_core
from dgcnn_tpu.parallel.collectives import ppermute_ring
from dgcnn_tpu.parallel.mesh import POINT_AXIS


def _halo_extend(x_shard, w: int, axis_name: str):
    """(B, NL, ...) → (B, NL + 2w, ...): left/right neighbor halos attached.

    Row ``j`` of the result claims global sorted position
    ``me·NL − w + j``; the two edge shards' outer halos wrap around the
    ring and claim positions outside ``[0, N)`` (callers exclude them by
    position, never by value).
    """
    # perm (i → i+1): each device receives its LEFT neighbor's last w rows
    left = ppermute_ring(x_shard[..., -w:, :], 1, axis_name)
    # perm (i → i−1): each device receives its RIGHT neighbor's first w rows
    right = ppermute_ring(x_shard[..., :w, :], -1, axis_name)
    return jnp.concatenate([left, x_shard, right], axis=-2)


def halo_knn(
    x_shard,
    k: int,
    mask_shard=None,
    *,
    window: int,
    axis_name: str = POINT_AXIS,
    precision=None,
    block_q: int = 1024,
    use_pallas: bool = False,
):
    """Banded kNN over GLOBALLY SORTED points sharded along ``axis_name``.

    Args:
      x_shard: (B, N_local, C) — this device's contiguous band of the
        Morton-sorted event (global sorted position ``p`` lives on shard
        ``p // N_local`` at row ``p % N_local``; padded points sort last).
      k: neighbor count; must be ≤ window.
      mask_shard: optional (B, N_local) validity of this shard's rows.
      window: the banded candidate-window size W (static; ≤ N_local).

    Returns:
      idx: (B, N_local, k) **global sorted positions** of the neighbors —
        bitwise the single-device banded oracle's selections on valid
        rows; self-position on padded rows and <k-candidate slots.
      valid: (B, N_local, k) False on padded rows and degraded slots.
    """
    nl = x_shard.shape[-2]
    w = int(window)
    if w > nl:
        raise ValueError(
            f"knn_window={w} > local shard size {nl}: the halo-exchange "
            f"banded CP needs window <= num_point/point_shards (use fewer "
            f"point shards, a smaller window, or the exact ring path)"
        )
    if k > w:
        raise ValueError(f"k={k} > knn_window={w}")
    me = jax.lax.axis_index(axis_name)
    off = (me * nl).astype(jnp.int32)

    if mask_shard is None:
        # derive from x_shard so the constant carries its varying mesh
        # axes under shard_map (a fresh jnp.ones is unvarying and fails
        # the default check_vma of the train/eval shard_maps)
        mask_shard = jnp.ones_like(x_shard[..., 0], dtype=bool)
    nvalid = jax.lax.psum(
        jnp.sum(mask_shard, axis=-1).astype(jnp.int32), axis_name
    )  # (B,) global valid count per event

    ext = _halo_extend(x_shard, w, axis_name)  # (B, NL + 2w, C)
    ext_mask = _halo_extend(mask_shard[..., None], w, axis_name)[..., 0]

    if use_pallas:
        # fused banded kernel with offset query/key positions — the TPU
        # fast path for real multi-chip slices (the jnp core below stays
        # the CPU-mesh-testable reference, bitwise the banded oracle).
        # Same near-tie caveat as every single-contraction kernel score.
        from dgcnn_tpu.kernels.knn_banded import knn_pallas_banded_cross

        idx, valid = knn_pallas_banded_cross(
            x_shard, ext, k, ext_mask,
            window=w, q_base=off, key_base=off - w, nvalid=nvalid,
            precision=precision,
        )
        # padded query rows: deterministic self-edges (module docstring)
        valid = valid & mask_shard[..., None]
        self_global = off + jnp.arange(nl, dtype=jnp.int32)[None, :, None]
        idx = jnp.where(valid, idx, self_global)
        return idx.astype(jnp.int32), valid

    # |x|^2 is row-local, so computing it on the extended array is bitwise
    # the same as extending the precomputed values
    ext_sq = jnp.sum(jnp.square(ext), axis=-1)
    sq = jnp.sum(jnp.square(x_shard), axis=-1)

    qb = min(block_q, nl)
    while nl % qb:
        qb //= 2

    def one_event(xq, sqq, keys, ksq, km, nv):
        return _banded_select_core(
            xq, sqq, keys, ksq, km,
            key_base=off - w, q_base=off, nvalid=nv,
            k=k, w=w, qb=qb, precision=precision,
        )

    bshape = x_shard.shape[:-2]
    flat = lambda a: a.reshape((-1,) + a.shape[len(bshape):])  # noqa: E731
    vals, idx = jax.vmap(one_event)(
        flat(x_shard), flat(sq), flat(ext), flat(ext_sq),
        flat(ext_mask), nvalid.reshape(-1),
    )
    vals = vals.reshape(bshape + (nl, k))
    idx = idx.reshape(bshape + (nl, k))

    # self-edges on degraded slots AND on padded query rows (see module
    # docstring: padded queries' clipped windows can live outside the halo)
    valid = jnp.isfinite(vals) & mask_shard[..., None]
    self_global = off + jnp.arange(nl, dtype=jnp.int32)[None, :, None]
    idx = jnp.where(valid, idx, self_global)
    return idx.astype(jnp.int32), valid


def halo_extend_values(values_shard, *, window: int, axis_name: str = POINT_AXIS):
    """Public halo exchange: (B, N_local, C) → (B, N_local + 2W, C).

    Differentiable (plain `ppermute`s + concatenate — AD transposes the
    permutes, so gradients scattered into halo rows flow back to their
    owning shards automatically). Together with `halo_localize_idx` this
    decomposes `halo_gather` into *exchange once, then gather locally* —
    the decomposition the fused EdgeConv block's local-gather custom VJP
    needs to run under banded context parallelism.
    """
    return _halo_extend(values_shard, int(window), axis_name)


def halo_localize_idx(idx_global, *, window: int, axis_name: str = POINT_AXIS):
    """Global sorted positions → rows of the halo-extended local array.

    ``idx_global`` is (B, N_local, k) from `halo_knn`; every position it
    can produce lies in ``[off − W, off + N_local + W)`` (clipping is a
    belt-and-braces guard, same as `halo_gather` always applied).
    """
    nl = idx_global.shape[-2]
    w = int(window)
    me = jax.lax.axis_index(axis_name)
    off = (me * nl).astype(jnp.int32)
    return jnp.clip(idx_global - (off - w), 0, nl + 2 * w - 1)


def halo_gather(
    values_shard,
    idx_global,
    *,
    window: int,
    axis_name: str = POINT_AXIS,
):
    """Gather rows of a point-sharded array by global SORTED positions.

    The banded EdgeConv halo exchange: all neighbor positions produced by
    `halo_knn` lie in ``[off − W, off + N_local + W)``, so one halo
    exchange (2 × ``(B, W, C)`` over ICI) replaces `ring_knn.ring_gather`'s
    D−1 full-shard ring steps.

    Args:
      values_shard: (B, N_local, C) — this device's band of a sorted
        (B, N, C) global array.
      idx_global: (B, N_local, k) global sorted positions from `halo_knn`.

    Returns:
      (B, N_local, k, C) gathered rows.
    """
    nl = values_shard.shape[-2]
    w = int(window)
    ext = _halo_extend(values_shard, w, axis_name)  # (B, NL + 2w, C)
    local = halo_localize_idx(idx_global, window=w, axis_name=axis_name)
    b, n_loc, k = local.shape
    got = jnp.take_along_axis(
        ext, local.reshape(b, n_loc * k)[..., None], axis=-2
    )
    return got.reshape(b, n_loc, k, -1)
