"""Fused Pallas TPU kNN: blockwise distance matmul + running top-k.

The BASELINE.json north-star kernel: "per-layer dynamic graph construction
(pairwise-distance matmul + top-k kNN) becomes a fused Pallas kernel".
The reference materializes the full B×N×N distance matrix and runs
`tf.nn.top_k` over it [H per SURVEY.md §0.6]; at N=16k that is 1 GB of
HBM traffic per EdgeConv layer plus an XLA sort. This kernel streams
(QB×T) score tiles straight out of the MXU into an on-chip running top-k
— the N×N matrix never exists in HBM.

Grid layout: ``(batch, query_block, key_tile)`` with the key tile
innermost, so Pallas double-buffers the key-tile DMA behind the MXU work
and the kernel scales to any N (keys are never VMEM-resident in full).
The running top-k lives in VMEM scratch, persisting across the key-tile
grid steps of one query block.

Algorithm, per (query block, key tile) program:
  1. score tile  S = qa @ ka^T  on the MXU, where the *augmented* operands
     fold the whole distance computation and key masking into one matmul:
        qa_i = [2·x_i, −1, −1]                 (queries)
        ka_j = [x_j, ‖x_j‖², BIG·(1−mask_j)]   (keys)
     so S_ij = 2⟨x_i,x_j⟩ − ‖x_j‖² − BIG·(1−mask_j) = ‖x_i‖² − D_ij (− BIG
     if masked). The per-row constant ‖x_i‖² does not change any row's
     top-k *order*, so distances need never be completed.
  2. merge the tile into a sorted (descending-score) running top-k of
     (value, index) pairs via iterative extraction: per pass, take the
     tile's row max (ties → lowest index, matching `jax.lax.top_k`),
     insert it into the sorted list with a compare-roll, and knock it out
     of the tile. A `while_loop` exits as soon as no row's tile max can
     still enter its top-k — in expectation ~k·T/N + 1 passes instead of k.

Outputs are laid out (k, N) so the lane dimension stays wide; the wrapper
transposes and converts to the oracle's (idx, neighbor_valid) contract
(invalid slots → self-edges), making this a drop-in `knn_fn` for
`models.dgcnn.make_model`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_BIG = 1e30  # masked-key score offset; anything below -1e29 is invalid
NEG_INF = float(np.finfo(np.float32).min)


def _knn_kernel(
    qa_ref,   # (1, QB, Cp) VMEM — query block (auto-fetched per program)
    ka_ref,   # (B, c2p, Nkp) HBM — ALL keys, transposed narrow layout
    idx_ref,  # (1, k, QB) VMEM out
    val_ref,  # (1, k, QB) VMEM out
    tile,     # (2, c2p, T) VMEM scratch — key-tile double buffer
    copy_sem,
    *,
    k,
    block_t,
    precision,
):
    """One (batch, query-block) program owning the whole key sweep.

    The running top-k lives transposed as (k, QB): queries on the lane
    dimension keep every list operation lane-full (a (QB, k=20) layout
    would waste 108 of 128 lanes per op), and the final store needs no
    transpose (outputs are (k, N)).

    Key tiles stream HBM→VMEM through a manual double buffer inside a
    `fori_loop` rather than an extra grid dimension: measured ~2 ms/layer
    faster at 16k than the (b, q, t) grid form (64 programs with an
    internal 16-tile loop beat 1024 programs of per-program overhead),
    and it is the same structure the RDMA ring kernel uses — one proven
    shape for both. Keys arrive TRANSPOSED at the 8-sublane-padded
    natural channel width ((c2p, T) tiles): contracting over c2p instead
    of the 128-padded lane count also trims the HIGHEST-precision score
    matmul. The dropped lanes of the padded query operand are exact
    zeros, so scores are bit-identical to the padded form.
    """
    b = pl.program_id(0)
    c2p = ka_ref.shape[1]
    n_tiles = ka_ref.shape[2] // block_t
    qa = qa_ref[0][:, :c2p]  # (QB, c2p) value-level slice
    qb = qa.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (qb, block_t), 1)
    kio = jax.lax.broadcasted_iota(jnp.int32, (k, qb), 0)

    def tile_copy(t, tslot):
        return pltpu.make_async_copy(
            ka_ref.at[b, :, pl.ds(t * block_t, block_t)],
            tile.at[tslot],
            copy_sem.at[tslot],
        )

    tile_copy(0, 0).start()

    def merge_tile(t, carry):
        topv, topi = carry
        tslot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < n_tiles)
        def _():
            tile_copy(t + 1, jax.lax.rem(t + 1, 2)).start()

        tile_copy(t, tslot).wait()
        scores = jax.lax.dot_general(
            qa,
            tile[tslot],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (QB, c2p) x (c2p, T) -> (QB, T)
        tile_base = t * block_t

        # progress-flag do-while: extract first, loop while the previous
        # pass inserted anything. The cond-checks-potential-first form
        # costs a SECOND full-tile max scan per pass (its can_enter test
        # duplicates the body's max) — measured ~2.5 ms/layer at 16k.
        # Results are identical: the one trailing pass where nothing
        # enters leaves the lists untouched.
        def pass_cond(c):
            s, _, _, _, progressed = c
            return jnp.logical_and(s < k, progressed)

        def pass_body(c):
            s, topv, topi, scores, _ = c
            m_col = jnp.max(scores, axis=1, keepdims=True)  # (QB, 1)
            # lowest column index among the maxima — lax.top_k tie order
            arg_col = jnp.min(
                jnp.where(scores == m_col, cols, jnp.int32(2**30)),
                axis=1,
                keepdims=True,
            )
            # knock the extracted element out of the tile
            scores = jnp.where(cols == arg_col, NEG_INF, scores)
            # lists are (k, QB): broadcast the candidate over k sublanes
            m = m_col.T  # (1, QB)
            gidx = arg_col.T + tile_base
            # sorted insert (descending values; `>=` places a new entry
            # after its equals, preserving index-ascending tie order —
            # tiles are processed in ascending index order, so arrival
            # order IS index order and no lexicographic compare is needed)
            pos = jnp.sum((topv >= m).astype(jnp.int32), axis=0, keepdims=True)
            rolled_v = pltpu.roll(topv, 1, axis=0)
            rolled_i = pltpu.roll(topi, 1, axis=0)
            new_v = jnp.where(kio < pos, topv, jnp.where(kio == pos, m, rolled_v))
            new_i = jnp.where(kio < pos, topi, jnp.where(kio == pos, gidx, rolled_i))
            # rows whose max can no longer enter keep their list unchanged
            enter = m > topv[k - 1 : k]  # (1, QB)
            new_v = jnp.where(enter, new_v, topv)
            new_i = jnp.where(enter, new_i, topi)
            return s + 1, new_v, new_i, scores, jnp.any(enter)

        _, topv, topi, _, _ = jax.lax.while_loop(
            pass_cond,
            pass_body,
            (jnp.int32(0), topv, topi, scores, jnp.bool_(True)),
        )
        return topv, topi

    topv0 = jnp.full((k, qb), NEG_INF, jnp.float32)
    topi0 = jnp.zeros((k, qb), jnp.int32)
    topv, topi = jax.lax.fori_loop(0, n_tiles, merge_tile, (topv0, topi0))
    idx_ref[0] = topi
    val_ref[0] = topv


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _vma(x):
    """Varying-mesh-axes of ``x`` — outputs inherit them (needed when the
    kernel runs inside shard_map with replication checking on)."""
    try:
        return jax.typeof(x).vma
    except Exception:
        return frozenset()


def build_augmented_operands(xq, xk, mask, *, block_q, block_t,
                             key_layout: str = "padded"):
    """The score-defining operand construction, in exactly ONE place.

    Shared by the single-device kernel and the RDMA ring kernel
    (`kernels.ring_knn_rdma`) so the two can never drift: the documented
    guarantee that switching ring implementations does not change the
    neighbor graph rests on their per-element score expressions being
    bitwise identical. Returns ``(qa, ka, cp, nq_pad, nk_pad)``.

    ``key_layout="narrow_t"`` returns ``ka`` TRANSPOSED at its natural
    c+2 channel width — shape (B, c+2, nk_pad), minor dim the 128-aligned
    point axis (Mosaic's DMA slicing demands 128-aligned minor windows,
    which rules out a (rows, c+2) layout). The ring kernel circulates
    this form chip-to-chip, cutting ICI traffic 128/roundup(c+2, 8)
    (= 16× at LArTPC widths, where c+2 ≤ 8) vs shipping the lane-padded
    operand. ``qa`` stays lane-padded (it is local); the kernel
    contracts over the first roundup(c+2, 8) lanes only, and the lanes
    beyond the raw c+2 are exact zeros in both operands, so scores are
    bit-identical.
    """
    b, nq, c = xq.shape
    nk = xk.shape[1]
    # graph construction is non-differentiable (integer neighbor indices,
    # same as top_k in the oracle) — make that explicit so AD never asks
    # the pallas_call for a VJP
    # f32 operands regardless of the model's compute dtype: the graph
    # build is stop-gradient and merge-bound (the matmul is nearly free),
    # and bf16 inputs would otherwise hand Mosaic a mixed-dtype dot
    xq = jax.lax.stop_gradient(xq).astype(jnp.float32)
    xk = jax.lax.stop_gradient(xk).astype(jnp.float32)
    nq_pad = _round_up(nq, block_q)
    nk_pad = _round_up(nk, block_t)
    # augmented operands (fold distances + masking into one matmul)
    k2 = jnp.sum(jnp.square(xk), axis=-1, keepdims=True)
    if mask is None:
        mask = jnp.ones((b, nk), bool)
    maskf = mask.astype(jnp.float32)[..., None]
    # derive from xq so the constant carries xq's varying-mesh-axes under
    # shard_map (a fresh jnp.ones would be unvarying and fail check_vma)
    ones = jnp.ones_like(xq[..., :1])
    qa = jnp.concatenate([2.0 * xq, -ones, -ones], axis=-1)
    ka = jnp.concatenate([xk, k2, MASK_BIG * (1.0 - maskf)], axis=-1)
    cp = _round_up(qa.shape[-1], 128)
    pad_c = cp - qa.shape[-1]
    qa = jnp.pad(qa, ((0, 0), (0, nq_pad - nq), (0, pad_c)))
    ka = jnp.pad(
        jnp.pad(
            ka,
            ((0, 0), (0, 0), (0, pad_c if key_layout == "padded" else 0)),
        ),
        ((0, 0), (0, nk_pad - nk), (0, 0)),
    )
    if nk_pad - nk:
        # padded key rows must never be selected: flag via the BIG channel
        ka = ka.at[:, nk:, c + 1].set(MASK_BIG)
    if key_layout == "narrow_t":
        # sublane tiling: DMA windows must be 8-aligned in the
        # second-minor dim, so the channel width pads to the next
        # multiple of 8 (exact zeros — still ~16× less ICI traffic than
        # the 128-lane layout at LArTPC widths)
        c2p = _round_up(ka.shape[-1], 8)
        ka = jnp.pad(ka, ((0, 0), (0, 0), (0, c2p - ka.shape[-1])))
        ka = jnp.swapaxes(ka, -1, -2)  # (B, c2p, nk_pad)
    return qa, ka, cp, nq_pad, nk_pad


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_q", "block_t", "interpret", "precision"),
)
def _knn_pallas_call(xq, xk, mask, *, k, block_q, block_t, interpret, precision):
    b, nq, c = xq.shape
    nk = xk.shape[1]
    qa, ka, cp, nq_pad, nk_pad = build_augmented_operands(
        xq, xk, mask, block_q=block_q, block_t=block_t,
        key_layout="narrow_t",
    )
    c2p = ka.shape[1]

    grid = (b, nq_pad // block_q)
    idx_t, val_t = pl.pallas_call(
        functools.partial(
            _knn_kernel, k=k, block_t=block_t, precision=precision
        ),
        grid=grid,
        in_specs=[
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
    )(qa, ka)
    idx = jnp.swapaxes(idx_t, -1, -2)[:, :nq]  # (B, Nq, k)
    vals = jnp.swapaxes(val_t, -1, -2)[:, :nq]
    valid = vals > -1e29
    self_idx = jnp.minimum(
        jnp.arange(nq, dtype=jnp.int32), nk - 1
    )[None, :, None]
    idx = jnp.where(valid, idx, self_idx)
    return idx, valid, vals


def knn_pallas(
    x,
    k: int,
    mask=None,
    *,
    block_q: int = 256,
    block_t: int = 1024,
    interpret: bool | None = None,
    precision=jax.lax.Precision.HIGHEST,
    return_scores: bool = False,
):
    """Drop-in replacement for `ops.knn.knn_indices` (same contract).

    Falls back to smaller blocks for small N. ``interpret`` defaults to
    True off-TPU (CPU tests) and False on TPU. ``precision`` controls the
    MXU score matmul: HIGHEST (default) is f32-faithful so neighbor sets
    match the f32 oracle; DEFAULT uses single-pass bf16 (faster, may swap
    near-equidistant neighbors — harmless for training quality).

    With ``return_scores`` the kernel's raw neighbor scores come back as a
    third output. Scores are ``‖x_i‖² − D_ij`` — offset per *query*, so
    they are directly comparable across different key sets of the same
    query (what the ring-CP merge needs), just not actual distances.
    """
    b, n, c = x.shape
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    block_q = min(block_q, _round_up(n, 128))
    block_t = min(block_t, _round_up(n, 128))
    out = _knn_pallas_call(
        x, x, mask, k=k, block_q=block_q, block_t=block_t,
        interpret=interpret, precision=precision,
    )
    if return_scores:
        return out
    return out[0], out[1]


def knn_pallas_cross(
    xq,
    xk,
    k: int,
    mask_k=None,
    *,
    block_q: int = 256,
    block_t: int = 1024,
    interpret: bool | None = None,
    precision=jax.lax.Precision.HIGHEST,
):
    """Top-k keys of ``xk`` for every query in ``xq`` (cross form).

    Returns (idx into xk, valid, scores); scores are ``‖q‖² − D`` —
    per-query offset, comparable across different key sets of the same
    queries. This is the local scorer of the ring-CP kNN: each ring step
    ranks the resident queries against the block currently held.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    block_q = min(block_q, _round_up(xq.shape[1], 128))
    block_t = min(block_t, _round_up(xk.shape[1], 128))
    return _knn_pallas_call(
        xq, xk, mask_k, k=k, block_q=block_q, block_t=block_t,
        interpret=interpret, precision=precision,
    )
