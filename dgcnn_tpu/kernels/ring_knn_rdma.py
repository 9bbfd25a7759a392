"""Single-kernel ring kNN over the ``points`` mesh axis via Pallas RDMA.

`kernels.ring_knn.ring_knn` implements context-parallel kNN as an
unrolled shard_map loop: score the resident block, `ppermute` it to the
next device, repeat. Each step is a separate XLA computation, so the
inter-chip transfer and the on-chip merge are only overlapped if XLA's
async-collective scheduling chooses to. This module closes the gap the
design doc left open ("Ring-kNN as a Pallas kernel with RDMA"): ONE
Pallas kernel per device owns the whole ring —

  * the circulating key block lives in an HBM double buffer and moves
    chip-to-chip with `pltpu.make_async_remote_copy` over ICI, started
    *before* the local merge so the transfer hides behind compute. The
    block travels TRANSPOSED at its 8-sublane-padded natural channel
    width ((B, c2p, N_local) — Mosaic DMA windows must be 128-aligned in
    the minor and 8-aligned in the second-minor dim), so the transfer
    really is O(N_local·C) bytes (128/8 = 16× less ICI traffic at LArTPC
    widths, where c+2 ≤ 8, than shipping the 128-lane-padded operand) vs
    O(N_local²·C/D) merge FLOPs;
  * key tiles stream HBM→VMEM through a second, local double buffer
    (`pltpu.make_async_copy`), the same pipeline shape as the
    single-device `knn_pallas` kernel;
  * the running global top-k lives in VMEM scratch for the whole ring.

Flow control without remote semaphore signals: device d writes into
device d+1's buffer slot, so d+1 grants *credit tokens* — a 1-element
RDMA from d+1 back to d — after it has (a) finished merging a slot and
(b) finished its own send's DMA read of that slot. d waits for the
token before starting the next block send. Tokens are themselves RDMAs,
so the whole protocol is testable in Pallas interpret mode on a
multi-device CPU mesh (remote `semaphore_signal` is not interpretable in
this JAX version, which rules out the barrier-semaphore formulation for
the tested path). On real hardware a startup barrier additionally
separates back-to-back invocations that share `collective_id` (guide
pattern; interpret mode skips it).

Exactness: scores use the identical augmented-matmul expression as
`knn_pallas` (`2⟨x_i,x_j⟩ − ‖x_j‖² − BIG·(1−mask)`), and the merge is
*lexicographic* on (score desc, global index asc) — unlike the
single-device kernel, ring blocks arrive in owner order, not global
index order, so tie order cannot be left to arrival order. The result
is bit-identical to a single-device `lax.top_k` over the full point set
(tested on the CPU mesh, including duplicate-point ties and masks).

Reference parity: the upstream repo has no multi-device kNN at all — it
caps events at a fixed NUM_POINT [H per SURVEY.md §5 long-context row];
this kernel is part of the rebuild's beyond-reference context
parallelism (SURVEY.md §2.2 SP/CP row).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgcnn_tpu.kernels.knn_pallas import (
    NEG_INF,
    _round_up,
    _vma,
    build_augmented_operands,
)
from dgcnn_tpu.parallel.mesh import POINT_AXIS

_COLLECTIVE_ID = 0x1D  # shared by every invocation of this kernel


def _ring_kernel(
    me_ref,      # (1, 1) SMEM — this device's index on the ring axis
    qa_ref,      # (1, QB, Cp) VMEM — this (b, q) query block (auto-fetched)
    ka_ref,      # (B, C2, Nlp) HBM — this device's augmented key block,
                 #   TRANSPOSED at natural c+2 width: the minor dim is the
                 #   128-aligned point axis (Mosaic DMA windows must be
                 #   128-aligned in the minor dim, which a (rows, c+2)
                 #   layout cannot satisfy), and the narrow form is what
                 #   circulates over ICI (~21× less traffic at c=3)
    idx_ref,     # (1, k, QB) VMEM out
    val_ref,     # (1, k, QB) VMEM out
    comm,        # (2, B, C2, Nlp) HBM out (workspace) — circulating slots;
                 #   an output, not scratch: Mosaic only allows VMEM/SMEM/
                 #   semaphore scratch, so the HBM double buffer rides the
                 #   output list and the wrapper discards it
    tile,        # (2, C2, T) VMEM scratch — local key-tile double buffer
    topv_s,      # (B, k, Nqp) VMEM scratch — running top-k values
    topi_s,      # (B, k, Nqp) VMEM scratch — running top-k global indices
    tok_src,     # (1, 1) VMEM scratch — credit-token payload (content unused)
    tok_dst,     # (1, 1) VMEM scratch — credit-token landing pad
    send_sem, recv_sem, tok_send, tok_recv, copy_sem,
    *,
    k: int,
    block_t: int,
    n_local: int,
    axis_name: str,
    precision,
    interpret: bool,
):
    s = pl.program_id(0)
    b = pl.program_id(1)
    q = pl.program_id(2)
    n_steps = pl.num_programs(0)
    n_b = pl.num_programs(1)
    n_q = pl.num_programs(2)
    # the device index arrives as data (SMEM scalar) rather than via
    # lax.axis_index: inside the kernel trace, axis_index would produce a
    # varying value that cannot mix with the kernel's unvarying iotas
    # under shard_map's replication checking
    me = me_ref[0, 0]
    nxt = jax.lax.rem(me + 1, n_steps)
    prv = jax.lax.rem(me + n_steps - 1, n_steps)
    c2 = ka_ref.shape[1]  # 8-sublane-padded augmented width c2p (NOT the
    #                        raw c+2: lanes [c+2, c2p) are exact zeros in
    #                        BOTH operands — the contraction relies on it)
    nlp = ka_ref.shape[2]
    n_tiles = nlp // block_t
    qb = qa_ref.shape[1]

    # MESH device ids ({axis: index}) keep the ring on the ``points``
    # axis while inheriting this device's coordinates on every other mesh
    # axis — correct under a joint (data, points) training mesh, where a
    # LOGICAL (linearized) id would address the wrong chip. The Pallas
    # interpreter only emulates single-axis meshes and wants a bare
    # scalar there (its discharge rule all_gathers the id directly).
    def ring_id(i):
        return i if interpret else {axis_name: i}

    def block_rdma(src_ref, dst):
        # step 0 sends straight from ka_ref (no staging copy on the
        # critical path); later steps forward the resident comm slot.
        # ka_ref and each comm slot have identical (B, C2, Nlp) shapes,
        # so wait_send/wait_recv byte accounting matches either way.
        return pltpu.make_async_remote_copy(
            src_ref=src_ref,
            dst_ref=comm.at[dst],
            send_sem=send_sem,
            recv_sem=recv_sem,
            device_id=ring_id(nxt),
            device_id_type=pltpu.DeviceIdType.MESH,
        )

    def token_rdma():
        # credit grant: next-step permission for our *previous* neighbor
        return pltpu.make_async_remote_copy(
            src_ref=tok_src,
            dst_ref=tok_dst,
            send_sem=tok_send,
            recv_sem=tok_recv,
            device_id=ring_id(prv),
            device_id_type=pltpu.DeviceIdType.MESH,
        )

    first_prog = (s == 0) & (b == 0) & (q == 0)
    last_in_step = (b == n_b - 1) & (q == n_q - 1)
    slot = jax.lax.rem(s, 2)

    @pl.when(first_prog)
    def _():
        if not interpret:
            # hardware-only startup barrier: back-to-back invocations
            # share collective_id semaphores, so neighbors must not race
            # a previous invocation's teardown (interpret mode cannot
            # emulate remote semaphore_signal and skips this; the tested
            # token protocol provides all *within*-invocation ordering).
            bar = pltpu.get_barrier_semaphore()
            pltpu.semaphore_signal(
                bar, inc=1, device_id={axis_name: nxt},
                device_id_type=pltpu.DeviceIdType.MESH)
            pltpu.semaphore_signal(
                bar, inc=1, device_id={axis_name: prv},
                device_id_type=pltpu.DeviceIdType.MESH)
            pltpu.semaphore_wait(bar, 2)

    # --- kick off the block send for this ring step (overlaps the merge)
    @pl.when((s > 0) & (s < n_steps - 1) & (b == 0) & (q == 0))
    def _():
        # send 0 targets a slot the neighbor has never touched, so it
        # needs no token; send s (s>=1) consumes the token the neighbor
        # granted after finishing with the slot this send overwrites.
        token_rdma().wait_recv()

    @pl.when((s == 0) & (b == 0) & (q == 0) & (n_steps > 1))
    def _():
        block_rdma(ka_ref, 1).start()

    @pl.when((s > 0) & (s < n_steps - 1) & (b == 0) & (q == 0))
    def _():
        block_rdma(comm.at[slot], jax.lax.rem(s + 1, 2)).start()

    # --- merge the resident block into the running top-k ---------------
    @pl.when(first_prog)
    def _():
        topv_s[:] = jnp.full_like(topv_s, NEG_INF)
        topi_s[:] = jnp.zeros_like(topi_s)

    owner = jax.lax.rem(me - s + n_steps, n_steps)
    # contract over the first c2p lanes only: lanes beyond the raw c+2
    # are exact zeros in both operands and the dropped lanes of the
    # padded local operand are zeros too, so scores are bit-identical
    qa = qa_ref[0][:, :c2]  # (QB, c2p) value-level slice
    cols = jax.lax.broadcasted_iota(jnp.int32, (qb, block_t), 1)
    kio = jax.lax.broadcasted_iota(jnp.int32, (k, qb), 0)

    def tile_copy(kt, tslot, src):
        # (c2, T) window: the sliced minor dim is the point axis, offset
        # and length both multiples of 128 — Mosaic-aligned by design
        return pltpu.make_async_copy(
            src.at[b, :, pl.ds(kt * block_t, block_t)],
            tile.at[tslot],
            copy_sem.at[tslot],
        )

    def start_tile(kt, tslot):
        # the resident block is ka_ref on step 0 (never staged) and the
        # comm slot afterwards; ref choice must be branch-level (refs
        # cannot be selected by lax.cond)
        @pl.when(s == 0)
        def _():
            tile_copy(kt, tslot, ka_ref).start()

        @pl.when(s > 0)
        def _():
            tile_copy(kt, tslot, comm.at[slot]).start()

    start_tile(0, 0)

    def merge_tile(kt, carry):
        topv, topi = carry
        tslot = jax.lax.rem(kt, 2)

        @pl.when(kt + 1 < n_tiles)
        def _():
            start_tile(kt + 1, jax.lax.rem(kt + 1, 2))

        # both possible sources have identical slice shapes, so this
        # descriptor's byte count matches whichever copy was started
        tile_copy(kt, tslot, comm.at[slot]).wait()
        scores = jax.lax.dot_general(
            qa,
            tile[tslot],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (QB, c2) x (c2, T) -> (QB, T)
        base = owner * n_local + kt * block_t

        def pass_body(c):
            p, topv, topi, scores, _ = c
            m_col = jnp.max(scores, axis=1, keepdims=True)  # (QB, 1)
            arg_col = jnp.min(
                jnp.where(scores == m_col, cols, jnp.int32(2**30)),
                axis=1,
                keepdims=True,
            )
            scores = jnp.where(cols == arg_col, NEG_INF, scores)
            m = m_col.T                      # (1, QB)
            gidx = arg_col.T + base          # (1, QB) global key index
            # lexicographic (value desc, index asc) — ring blocks arrive
            # out of global-index order, so ties must compare indices
            pos = jnp.sum(
                jnp.logical_or(
                    topv > m, jnp.logical_and(topv == m, topi < gidx)
                ).astype(jnp.int32),
                axis=0,
                keepdims=True,
            )
            rolled_v = pltpu.roll(topv, 1, axis=0)
            rolled_i = pltpu.roll(topi, 1, axis=0)
            new_v = jnp.where(kio < pos, topv, jnp.where(kio == pos, m, rolled_v))
            new_i = jnp.where(kio < pos, topi, jnp.where(kio == pos, gidx, rolled_i))
            worst_v = topv[k - 1 : k]
            worst_i = topi[k - 1 : k]
            enter = jnp.logical_or(
                m > worst_v,
                jnp.logical_and(m == worst_v, gidx < worst_i),
            )
            new_v = jnp.where(enter, new_v, topv)
            new_i = jnp.where(enter, new_i, topi)
            return p + 1, new_v, new_i, scores, jnp.any(enter)

        def pass_cond(c):
            p, _, _, _, progressed = c
            return jnp.logical_and(p < k, progressed)

        _, topv, topi, _, _ = jax.lax.while_loop(
            pass_cond,
            pass_body,
            (jnp.int32(0), topv, topi, scores, jnp.bool_(True)),
        )
        return topv, topi

    qsl = (b, slice(None), pl.ds(q * qb, qb))
    topv, topi = jax.lax.fori_loop(
        0, n_tiles, merge_tile, (topv_s[qsl], topi_s[qsl])
    )
    topv_s[qsl] = topv
    topi_s[qsl] = topi

    # --- close the ring step: grant credit, await the next block -------
    @pl.when(last_in_step & (s < n_steps - 1) & (n_steps > 1))
    def _():
        rdma = block_rdma(comm.at[slot], jax.lax.rem(s + 1, 2))
        rdma.wait_send()  # our DMA read of the outgoing block is finished

        @pl.when(s < n_steps - 2)
        def _():
            # the next write into our comm[slot] is the neighbor's send
            # s+1 — grant it now that our merge + send-read are done.
            # (send D-2 is the last one, so the grant after step D-2's
            # merge would never be consumed: skip it, keeping every
            # semaphore drained at kernel exit.)
            tok = token_rdma()
            tok.start()
            tok.wait_send()

        rdma.wait_recv()  # the step-(s+1) resident block has landed

    @pl.when(s == n_steps - 1)
    def _():
        idx_ref[0] = topi
        val_ref[0] = topv


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "block_q", "block_t", "axis_name", "interpret", "precision",
        "n_shards",
    ),
)
def _ring_knn_call(
    x_shard, mask_shard, *, k, block_q, block_t, axis_name, interpret,
    precision, n_shards,
):
    b, nl, c = x_shard.shape
    # score-defining operand construction shared with knn_pallas — the
    # bit-identical expression is what makes the ring's global tie order
    # equal the single-device kernel's (and the oracle's)
    qa, ka, cp, nq_pad, nk_pad = build_augmented_operands(
        x_shard, x_shard, mask_shard, block_q=block_q, block_t=block_t,
        key_layout="narrow_t",  # (B, c+2, Nlp): what circulates over ICI
    )

    grid = (n_shards, b, nq_pad // block_q)
    kernel = functools.partial(
        _ring_kernel,
        k=k,
        block_t=block_t,
        n_local=nl,
        axis_name=axis_name,
        precision=precision,
        interpret=interpret,
    )
    me_arr = jnp.reshape(
        jax.lax.axis_index(axis_name).astype(jnp.int32), (1, 1)
    )
    idx_t, val_t, _comm_workspace = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, block_q, cp), lambda s, b_, q: (b_, q, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, k, block_q), lambda s, b_, q: (b_, 0, q),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, k, block_q), lambda s, b_, q: (b_, 0, q),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k, nq_pad), jnp.int32, vma=_vma(qa)),
            jax.ShapeDtypeStruct((b, k, nq_pad), jnp.float32, vma=_vma(qa)),
            jax.ShapeDtypeStruct(
                (2,) + ka.shape, jnp.float32, vma=_vma(qa)
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ka.shape[1], block_t), jnp.float32),
            pltpu.VMEM((b, k, nq_pad), jnp.float32),
            pltpu.VMEM((b, k, nq_pad), jnp.int32),
            pltpu.VMEM((1, 1), jnp.int32),
            pltpu.VMEM((1, 1), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=_COLLECTIVE_ID,
        ),
    )(me_arr, qa, ka)
    del _comm_workspace  # HBM double buffer; contents are dead after the ring
    idx = jnp.swapaxes(idx_t, -1, -2)[:, :nl]  # (B, Nl, k) global indices
    vals = jnp.swapaxes(val_t, -1, -2)[:, :nl]
    valid = vals > -1e29
    me = jax.lax.axis_index(axis_name)
    self_global = (
        jnp.arange(nl, dtype=jnp.int32)[None, :, None]
        + me.astype(jnp.int32) * nl
    )
    idx = jnp.where(valid, idx, self_global)
    return idx, valid


def ring_knn_rdma(
    x_shard,
    k: int,
    mask_shard=None,
    *,
    axis_name: str = POINT_AXIS,
    block_q: int = 256,
    block_t: int = 1024,
    interpret: bool | None = None,
    precision=jax.lax.Precision.HIGHEST,
):
    """Drop-in alternative to `ring_knn` (same contract, one fused kernel).

    Must run inside `shard_map` with ``x_shard`` the device's contiguous
    (B, N_local, C) point shard along ``axis_name``. Returns global
    neighbor indices + valid flags ordered exactly as a single-device
    `lax.top_k` over all N = D·N_local points (lexicographic tie order).

    VMEM bound: the running top-k holds B·k·N_local (value, index) pairs
    on chip — 8·B·k·N_local bytes (e.g. 2.6 MB at B=1, k=20, N_local=16k).
    """
    b, nl, c = x_shard.shape
    if k > nl:
        raise ValueError(f"k={k} > local shard size {nl}")
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n_shards = jax.lax.axis_size(axis_name)
    block_q = min(block_q, _round_up(nl, 128))
    block_t = min(block_t, _round_up(nl, 128))
    return _ring_knn_call(
        x_shard,
        mask_shard,
        k=k,
        block_q=block_q,
        block_t=block_t,
        axis_name=axis_name,
        interpret=interpret,
        precision=precision,
        n_shards=n_shards,
    )
