"""Fused Pallas TPU banded kNN: O(N·window) selection over SFC-sorted points.

The sub-quadratic sibling of `kernels.knn_pallas`: points arrive sorted
along a space-filling curve (`ops.sfc.morton_order`, padded points last)
and each query block only sweeps the key tiles intersecting its rows'
candidate windows ``[band_lo(pos), band_lo(pos) + window)`` — the window
expression is imported from `ops.knn.band_lo` so the kernel can never
drift from the jnp oracle (`ops.knn.banded_knn_indices`) that defines
the `--knn_window` semantics.

Everything else — augmented operands, narrow-transposed streamed key
tiles, manual double-buffered DMA, the (k, QB) lane-transposed running
top-k with `lax.top_k` tie order — is the proven structure of the exact
kernel; the only kernel-side additions are (1) dynamic tile-loop bounds
derived from the block's first/last window and (2) a per-row in-band
mask applied to each score tile. At 131k points the exact kernel is at
its O(N²) roofline (BASELINE.md) — this kernel's work scales with
``N·window`` instead.

No reference analog: the reference computes exact O(N²) kNN only
[H per SURVEY.md §0.6].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgcnn_tpu.ops.knn import band_lo
from dgcnn_tpu.kernels.knn_pallas import (
    _round_up,
    _vma,
    build_augmented_operands,
)

NEG_INF = float(np.finfo(np.float32).min)

# column width of the per-tile extraction do-whiles. Measured (probe_
# banded_merge, hardware, synthetic tracks + real model features + raw
# coords): chunking LOSES everywhere (0.41-1.00x) — the per-pass cost is
# the (QB, mc) max/argmin reductions + insert, which chunking multiplies
# (total passes ~= k + n_chunks) while shrinking only the scan width.
# Full tile stays the default.
MERGE_CHUNK_DEFAULT = None

# tile visit order inside each query block's window sweep.
# "diag_first": visit the DIAGONAL tile (the one containing the query
# rows themselves) first — on SFC-sorted points the true neighbors
# concentrate there, so the running top-k's entry bar is raised before
# the remaining winner-sparse tiles are merged (they then cost ~1
# extraction pass instead of multi-pass). Selection output is bitwise
# identical to "asc": the insert breaks value ties by ascending global
# index, so arrival order cannot change the result. Measured
# (probe_banded_merge, hardware, interleaved, real model features AND
# raw coords): 1.17-1.43x over asc across 131k-1M, W=4096-8192 —
# the winner-dense merge win the chunked extraction couldn't deliver.
TILE_ORDER_DEFAULT = "diag_first"


def _resolve_merge_chunk(merge_chunk, block_t: int) -> int:
    """Clamp the extraction-chunk width to [128, block_t], multiple of
    128 lanes; None picks the measured default."""
    if block_t % 128:
        # the kernel's tile DMAs, band masks and extraction loop all
        # assume lane-aligned tiles; a misaligned block_t would also send
        # the clamp loop below to zero (block_t % 0)
        raise ValueError(
            f"block_t must be a multiple of 128 lanes, got {block_t}"
        )
    mc = merge_chunk if merge_chunk is not None else MERGE_CHUNK_DEFAULT
    if mc is None:
        mc = block_t
    mc = max(128, min((int(mc) // 128) * 128, block_t))
    # the chunk loop must cover the whole tile: mc must divide block_t
    # (always terminates — block_t is 128-aligned and 128 divides it)
    while block_t % mc:
        mc -= 128
    return mc


def _banded_kernel(
    nvalid_ref,  # (B,) SMEM — valid-point count per event
    bases_ref,   # (2,) SMEM — [q_base, key_base] global sorted position of
    #              query row 0 / key row 0 (both 0 on the single-device
    #              path; per-shard offsets on the halo-CP cross path)
    qa_ref,   # (1, QB, Cp) VMEM — query block
    ka_ref,   # (B, c2p, Nkp) HBM — ALL keys, transposed narrow layout
    idx_ref,  # (1, k, QB) VMEM out
    val_ref,  # (1, k, QB) VMEM out
    tile,     # (2, c2p, T) VMEM scratch — key-tile double buffer
    copy_sem,
    *,
    k,
    block_t,
    window,
    precision,
    merge_chunk,
    tile_order,
):
    b = pl.program_id(0)
    q = pl.program_id(1)
    c2p = ka_ref.shape[1]
    n_tiles = ka_ref.shape[2] // block_t
    qa = qa_ref[0][:, :c2p]  # (QB, c2p)
    qb = qa.shape[0]
    nv = nvalid_ref[b]
    q_base = bases_ref[0]
    key_base = bases_ref[1]

    # per-row candidate windows in GLOBAL sorted positions; lo is monotone
    # in position, so the block's key-local tile range is [first row's
    # window start, last row's window end), shifted by key_base and
    # clamped — a chunk of all-padded queries can claim a window left of
    # the key array (halo path), which clamps to an empty/garbage range
    # that the caller discards via the self-edge fallback
    rows = q_base + q * qb + jax.lax.broadcasted_iota(jnp.int32, (qb, 1), 0)
    lo = band_lo(rows, nv, window)               # (QB, 1)
    first_ext = band_lo(q_base + q * qb, nv, window) - key_base
    t0 = jnp.clip(first_ext, 0, (n_tiles - 1) * block_t) // block_t
    t_end = band_lo(q_base + q * qb + qb - 1, nv, window) + window - key_base
    # floor t1 at t0 + 1, NOT t0: the first tile's DMA is started
    # unconditionally below, so a zero-trip merge loop would leave it
    # unawaited and its semaphore signal pending — corrupting the NEXT
    # grid step's double-buffer waits on hardware. A garbage chunk (all
    # queries padded, window left of the key array — halo path only)
    # instead merges one fully-banded-out tile: every score is NEG_INF,
    # the progress flag stays false after one pass, and the caller's
    # self-edge fallback discards the rows.
    t1 = jnp.clip((t_end + block_t - 1) // block_t, t0 + 1, n_tiles)

    if tile_order == "diag_first":
        # visit the tile holding the query rows first (see
        # TILE_ORDER_DEFAULT). The loop variable j still sweeps
        # [t0, t1); tile_at maps it to the visit order: diagonal tile,
        # then the rest ascending (skipping the diagonal).
        diag = (q_base + q * qb + qb // 2 - key_base) // block_t
        tc = jnp.clip(diag, t0, t1 - 1)

        def tile_at(j):
            jj = j - t0
            return jnp.where(
                jj == 0, tc, jnp.where(jj <= tc - t0, t0 + jj - 1, t0 + jj)
            )
    else:

        def tile_at(j):
            return j

    mc = merge_chunk if merge_chunk else block_t
    n_chunks = block_t // mc
    cols_c = jax.lax.broadcasted_iota(jnp.int32, (qb, mc), 1)
    kio = jax.lax.broadcasted_iota(jnp.int32, (k, qb), 0)

    def tile_copy(t, tslot):
        return pltpu.make_async_copy(
            ka_ref.at[b, :, pl.ds(t * block_t, block_t)],
            tile.at[tslot],
            copy_sem.at[tslot],
        )

    tile_copy(tile_at(t0), 0).start()

    def merge_tile(j, carry):
        topv, topi = carry
        t = tile_at(j)
        tslot = jax.lax.rem(j - t0, 2)

        @pl.when(j + 1 < t1)
        def _():
            tile_copy(tile_at(j + 1), jax.lax.rem(j + 1 - t0, 2)).start()

        tile_copy(t, tslot).wait()
        scores = jax.lax.dot_general(
            qa,
            tile[tslot],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (QB, T)
        tile_base = t * block_t

        # merge, CHUNKED for the winner-dense regime (VERDICT r3 #5): the
        # banded path has no winner-sparse tiles to amortize the exact
        # kernel's full-tile extraction (BASELINE.md banded floor note) —
        # nearly every tile pays multi-pass extraction, and each pass
        # re-scans the WHOLE (QB, T) tile. Splitting the tile into
        # `merge_chunk`-wide column chunks, each with its own do-while,
        # makes every re-scan `mc` wide instead of `block_t`: total
        # touches drop from (max-winners-per-row-in-TILE + 1) * T to
        # sum over chunks of (max-winners-per-row-in-CHUNK + 1) * mc —
        # adaptive per chunk, and earlier chunks raise the entry
        # threshold for later ones. Selection semantics are unchanged
        # (chunks ascend in column order, each chunk extracts value-desc
        # / index-asc, so equal values still ARRIVE in ascending index
        # order — the insert's `>=` tie rule keeps matching lax.top_k
        # and outputs stay bitwise identical for any merge_chunk).
        def merge_chunk_cols(carry, ci):
            topv, topi, scores_c = carry

            def pass_cond(c):
                s, _, _, _, progressed = c
                return jnp.logical_and(s < k, progressed)

            def pass_body(c):
                s, topv, topi, sc, _ = c
                m_col = jnp.max(sc, axis=1, keepdims=True)
                arg_col = jnp.min(
                    jnp.where(sc == m_col, cols_c, jnp.int32(2**30)),
                    axis=1,
                    keepdims=True,
                )
                sc = jnp.where(cols_c == arg_col, NEG_INF, sc)
                m = m_col.T
                gidx = arg_col.T + tile_base + ci * mc
                # value ties break by ascending global index (lax.top_k
                # order) — makes the result independent of tile visit
                # order, which diag_first requires. NEG_INF candidates
                # still never enter: the init slots carry topi=0 and
                # gidx >= 0.
                above = jnp.logical_or(
                    topv > m, jnp.logical_and(topv == m, topi < gidx)
                )
                pos = jnp.sum(above.astype(jnp.int32), axis=0, keepdims=True)
                rolled_v = pltpu.roll(topv, 1, axis=0)
                rolled_i = pltpu.roll(topi, 1, axis=0)
                new_v = jnp.where(
                    kio < pos, topv, jnp.where(kio == pos, m, rolled_v)
                )
                new_i = jnp.where(
                    kio < pos, topi, jnp.where(kio == pos, gidx, rolled_i)
                )
                enter = jnp.logical_or(
                    m > topv[k - 1 : k],
                    jnp.logical_and(
                        m == topv[k - 1 : k], gidx < topi[k - 1 : k]
                    ),
                )
                new_v = jnp.where(enter, new_v, topv)
                new_i = jnp.where(enter, new_i, topi)
                return s + 1, new_v, new_i, sc, jnp.any(enter)

            _, topv, topi, _, _ = jax.lax.while_loop(
                pass_cond,
                pass_body,
                (jnp.int32(0), topv, topi, scores_c, jnp.bool_(True)),
            )
            return topv, topi

        for ci in range(n_chunks):
            sc = scores[:, ci * mc : (ci + 1) * mc]
            # band test in GLOBAL sorted positions (indices stay
            # key-local; the wrapper adds key_base back)
            gcol = key_base + tile_base + ci * mc + cols_c
            in_band = jnp.logical_and(gcol >= lo, gcol < lo + window)
            sc = jnp.where(in_band, sc, NEG_INF)
            topv, topi = merge_chunk_cols((topv, topi, sc), ci)
        return topv, topi

    topv0 = jnp.full((k, qb), NEG_INF, jnp.float32)
    topi0 = jnp.zeros((k, qb), jnp.int32)
    topv, topi = jax.lax.fori_loop(t0, t1, merge_tile, (topv0, topi0))
    idx_ref[0] = topi
    val_ref[0] = topv


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "window", "block_q", "block_t", "interpret", "precision",
        "merge_chunk", "tile_order",
    ),
)
def _banded_pallas_call(
    xq, xk, mask_k, nvalid, bases,
    *, k, window, block_q, block_t, interpret, precision, merge_chunk,
    tile_order,
):
    b, n, c = xq.shape
    qa, ka, cp, nq_pad, nk_pad = build_augmented_operands(
        xq, xk, mask_k, block_q=block_q, block_t=block_t, key_layout="narrow_t"
    )
    c2p = ka.shape[1]

    grid = (b, nq_pad // block_q)
    idx_t, val_t = pl.pallas_call(
        functools.partial(
            _banded_kernel,
            k=k,
            block_t=block_t,
            window=window,
            precision=precision,
            merge_chunk=merge_chunk,
            tile_order=tile_order,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # nvalid (B,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # bases (2,)
            pl.BlockSpec(
                (1, block_q, cp), lambda b_, q: (b_, q, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),  # keys stream via DMA
        ],
        out_specs=[
            pl.BlockSpec(
                (1, k, block_q), lambda b_, q: (b_, 0, q),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, k, block_q), lambda b_, q: (b_, 0, q),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k, nq_pad), jnp.int32, vma=_vma(qa)),
            jax.ShapeDtypeStruct((b, k, nq_pad), jnp.float32, vma=_vma(qa)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, c2p, block_t), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(nvalid, bases, qa, ka)
    idx = jnp.swapaxes(idx_t, -1, -2)[:, :n]  # (B, N, k) key-local
    vals = jnp.swapaxes(val_t, -1, -2)[:, :n]
    valid = vals > -1e29
    # global positions: key-local indices shift by key_base; the self
    # fallback is the query's own global position
    self_idx = bases[0] + jnp.arange(n, dtype=jnp.int32)[None, :, None]
    idx = jnp.where(valid, bases[1] + idx, self_idx)
    return idx, valid


def knn_pallas_banded(
    x,
    k: int,
    mask=None,
    *,
    window: int,
    block_q: int = 256,
    block_t: int = 1024,
    interpret: bool | None = None,
    precision=jax.lax.Precision.HIGHEST,
    merge_chunk: int | None = None,
    tile_order: str | None = None,
):
    """Drop-in banded `knn_fn`: same contract as `ops.knn.banded_knn_indices`.

    ``x`` must be SFC-sorted with padded points last (the model handles
    the permutation when ``--knn_window > 0``). Selection matches the jnp
    banded oracle the way the exact kernel matches `lax.top_k` of the f32
    oracle: bit-exact indices, with the documented 1-ulp near-tie caveat
    of the single-contraction score form.

    ``merge_chunk``: column width of the per-tile extraction do-whiles
    (see `_banded_kernel`); outputs are bitwise identical for any value.
    None = the measured winner-dense default (`benchmarks/
    probe_banded_merge.py`).
    """
    b, n, c = x.shape
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    window = min(window, n)
    block_q = min(block_q, _round_up(n, 128))
    block_t = min(block_t, _round_up(n, 128))
    if mask is None:
        nvalid = jnp.full((b,), n, jnp.int32)
    else:
        nvalid = jnp.sum(mask, axis=-1).astype(jnp.int32)
    return _banded_pallas_call(
        x,
        x,
        mask,
        nvalid,
        jnp.zeros((2,), jnp.int32),
        k=k,
        window=window,
        block_q=block_q,
        block_t=block_t,
        interpret=interpret,
        precision=precision,
        merge_chunk=_resolve_merge_chunk(merge_chunk, block_t),
        tile_order=tile_order or TILE_ORDER_DEFAULT,
    )


def knn_pallas_banded_cross(
    xq,
    xk_ext,
    k: int,
    mask_ext=None,
    *,
    window: int,
    q_base,
    key_base,
    nvalid,
    block_q: int = 256,
    block_t: int = 1024,
    interpret: bool | None = None,
    precision=jax.lax.Precision.HIGHEST,
    merge_chunk: int | None = None,
    tile_order: str | None = None,
):
    """Banded selection with offset query/key positions (the halo-CP form).

    The local scorer of the halo-exchange banded CP (`kernels.halo_knn`
    with ``use_pallas=True``): queries are this device's shard (query row
    ``r`` at global sorted position ``q_base + r``), keys are the
    halo-extended candidate array (key row ``j`` at ``key_base + j``).
    Same selection contract as `knn_pallas_banded` on the full event for
    every VALID query row (single-contraction scores — the documented
    near-tie caveat applies on TPU); rows whose clipped windows fall
    outside the extended array return garbage the caller must overwrite
    (halo_knn forces padded query rows to self-edges).

    Returns (idx, valid) with idx in GLOBAL sorted positions.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    block_q = min(block_q, _round_up(xq.shape[1], 128))
    block_t = min(block_t, _round_up(xk_ext.shape[1], 128))
    bases = jnp.stack(
        [jnp.asarray(q_base, jnp.int32), jnp.asarray(key_base, jnp.int32)]
    )
    return _banded_pallas_call(
        xq,
        xk_ext,
        mask_ext,
        nvalid.astype(jnp.int32),
        bases,
        k=k,
        window=window,
        block_q=block_q,
        block_t=block_t,
        interpret=interpret,
        precision=precision,
        merge_chunk=_resolve_merge_chunk(merge_chunk, block_t),
        tile_order=tile_order or TILE_ORDER_DEFAULT,
    )
