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
import numpy as np


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


def edgeconv_block_reduced(
    p: jax.Array,
    q: jax.Array,
    bn_params,
    bn_state,
    idx: jax.Array,
    mask: jax.Array | None = None,
    *,
    train: bool,
    momentum: float = 0.9,
    eps: float = 1e-3,
    axis_name: str | None = None,
    gather_fn=None,
):
    """EdgeConv block ``max_k(relu(bn(P_i + Q_j)))`` without the edge tensor.

    The classic formulation materializes ``h_ij = P_i + Q_j`` as an
    ``(..., N, k, D)`` tensor, batch-normalizes it (a full two-pass
    traversal in training: statistics, then normalize), applies relu and
    max-reduces over k. This function exploits two algebraic identities to
    never form ``h`` at all — the "fused into a single on-chip pass" of
    the north star, discharged by restructuring instead of by kernel:

    1. **Selection commutes with the monotone BN+relu chain.** Per channel
       c, ``t ↦ relu((t − μ_c)·γ_c/σ_c + β_c)`` is monotone nondecreasing
       when ``γ_c ≥ 0`` and nonincreasing when ``γ_c < 0`` (f32 rounding is
       monotone, so this holds bitwise, not just mathematically). Hence::

           max_j relu(bn(P_i + Q_j)) = relu(bn(P_i + M_i))
           M_i[c] = max_j Q_j[c]  if γ_c ≥ 0  else  min_j Q_j[c]

       and only the per-query neighbor max/min of Q — ``(..., N, D)``,
       k× smaller — is ever needed.

    2. **BN statistics factor over the edge sum.** With ``h_ij = P_i+Q_j``::

           Σ_ij h_ij  = k·Σ_i P_i + Σ_i SQ_i
           Σ_ij h_ij² = k·Σ_i P_i² + 2·Σ_i P_i·SQ_i + Σ_i SQ2_i

       where ``SQ_i = Σ_{j∈nbr(i)} Q_j`` and ``SQ2_i = Σ_{j∈nbr(i)} Q_j²``
       are per-query gathered sums. Statistics are exact (identical up to
       f32 summation order — the same class of reassociation XLA already
       applies between compilations).

    The four gathered reductions (max, min, sum, sum-of-squares) read the
    same ``(..., N, k, D)`` gather, which XLA fuses into the reductions —
    the edge tensor exists only inside one fused loop, never in HBM.
    Past `SLOT_STREAM_ELEMS` gather elements XLA stops fusing and
    materializes the gather, so huge-N EVAL (local gathers only) streams
    one neighbor slot at a time instead — bitwise the dense result (see
    `_maxmin_streamed`; this is what lets 2M-point events serve on one
    chip).
    Measured in the 4×4096 production regime this removes the dominant
    block cost (see BASELINE.md). In eval mode the result is **bitwise
    identical** to the materializing path (statistics come from state, and
    the normalize chain applies the same f32 ops to the same winning
    values), so this is an implementation knob, not a model change.

    Reference behavior covered: `dgcnn/ops.py (edge_feature + conv2d +
    batch_norm)` + max aggregation [M per SURVEY.md §0.6 steps 2–4].

    Args:
      p: ``(..., N, D)`` query-side pre-activation ``x @ (Wa − Wb)``.
      q: ``(..., N, D)`` neighbor-side pre-activation ``x @ Wb``.
      bn_params: ``{"scale": (D,), "bias": (D,)}``.
      bn_state: ``{"mean": (D,), "var": (D,)}`` running statistics.
      idx: ``(..., N, k)`` neighbor indices.
      mask: optional ``(..., N)`` bool query validity; invalid rows are
        excluded from batch statistics (their outputs are still produced).
      train: True → masked batch statistics + running-average update;
        False → running statistics (reference inference mode).
      axis_name: mesh axis for cross-replica statistic psums (sync BN /
        context parallelism), as in `ops.norm.batch_norm_apply`.
      gather_fn: neighbor gather override (`ring_gather` under CP).

    Returns:
      ``(y, new_bn_state)`` with ``y`` float32 ``(..., N, D)``.
    """
    gather = gather_fn or gather_neighbors
    gamma = bn_params["scale"].astype(jnp.float32)
    beta = bn_params["bias"].astype(jnp.float32)
    p = p.astype(jnp.float32)
    k = idx.shape[-1]
    qf = q.astype(jnp.float32)
    if (
        not train
        and gather_fn is None
        and idx.shape[-2] * k * qf.shape[-1] >= SLOT_STREAM_ELEMS
    ):
        # Huge-N eval: XLA fuses the gather into the reductions at
        # headline sizes, but past SLOT_STREAM_ELEMS it materializes the
        # (..., N, k, D) gather (measured: a 21.5 GB lane-padded OOM at
        # N=2M serving) — stream one neighbor slot at a time with two
        # O(N·C) carries instead. jnp.maximum/minimum fold in slot order,
        # the same monoid and order the dense jnp.max/min reduce lowers
        # to, so the result is bitwise the dense traversal's. Eval only
        # (no AD through the loop; train statistics stay on the dense /
        # gathered_stats paths) and local gathers only (a custom
        # gather_fn, e.g. the exact ring's, keeps the dense traversal).
        mx, mn = _maxmin_streamed(qf, idx)
    else:
        g = gather(qf, idx)  # (..., N, k, D), fused below
        mx = jnp.max(g, axis=-2)
        mn = jnp.min(g, axis=-2)
    if train:
        sq = jnp.sum(g, axis=-2)
        sq2 = jnp.sum(jnp.square(g), axis=-2)
        axes = tuple(range(p.ndim - 1))
        kf = jnp.float32(k)
        if mask is None:
            nvalid = float(np.prod(p.shape[:-1]))
            count = jnp.full((p.shape[-1],), k * nvalid, jnp.float32)
            s1 = kf * jnp.sum(p, axis=axes) + jnp.sum(sq, axis=axes)
            s2 = (
                kf * jnp.sum(jnp.square(p), axis=axes)
                + 2.0 * jnp.sum(p * sq, axis=axes)
                + jnp.sum(sq2, axis=axes)
            )
        else:
            w = mask[..., None].astype(jnp.float32)
            count = jnp.broadcast_to(kf * jnp.sum(w), (p.shape[-1],))
            s1 = kf * jnp.sum(p * w, axis=axes) + jnp.sum(sq * w, axis=axes)
            s2 = (
                kf * jnp.sum(jnp.square(p) * w, axis=axes)
                + 2.0 * jnp.sum(p * sq * w, axis=axes)
                + jnp.sum(sq2 * w, axis=axes)
            )
        from dgcnn_tpu.ops.norm import finalize_batch_stats

        mean, var, new_state = finalize_batch_stats(
            count, s1, s2, bn_state, momentum=momentum, axis_name=axis_name
        )
    else:
        mean, var = bn_state["mean"], bn_state["var"]
        new_state = bn_state
    m = jnp.where(gamma >= 0, mx, mn)
    # the exact normalize chain of ops.norm.batch_norm_apply, applied to
    # the winning h value — bitwise equal to normalize-then-max
    y = jax.nn.relu(
        (p + m - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
    )
    return y, new_state


@jax.custom_vjp
def gathered_stats(p: jax.Array, q: jax.Array, idx: jax.Array, w, gsign):
    """EdgeConv reduction core with a one-scatter custom VJP.

    One fused gather traversal of ``g = q[idx]`` producing everything the
    restructured EdgeConv block (`edgeconv_block_fused`) needs:

      m      : (..., N, C) per-query neighbor max of q where
               ``gsign`` (= γ ≥ 0) is True, neighbor MIN elsewhere — the
               winning pre-activation of the monotone BN+relu chain
               (identity 1 of `edgeconv_block_reduced`), selected INSIDE
               the primitive so only ONE winner tensor/cotangent exists
               (at 2M points the separate mx/mn pair cost ~2 G of
               backward cotangent + winner-index residual traffic)
      s1p    : (C,) Σ_i w_i·Σ_s q_js            (edge sum of q)
      s2a    : (C,) Σ_i w_i·Σ_s q_js²           (edge sum of q²)
      s2b    : (C,) Σ_i w_i·p_i·Σ_s q_js        (p-weighted edge sum)

    ``w`` is the (..., N) f32 query-validity weight (or None); ``gsign``
    is the (C,) bool per-channel selector (non-differentiable, like
    ``idx``). The BN batch statistics assemble from these OUTSIDE this
    function (including any cross-device psums — kept outside so
    shard_map's replication inference sees them), and the
    ``(..., N, k, C)`` edge tensor exists only inside the fused forward
    loop.

    Backward (the point of this primitive): AD of max-of-gather re-runs
    the gather to rebuild the winner mask, then scatter-adds a full
    edge-tensor cotangent per reduction. Here the winning slots are saved
    as uint8 indices in forward, the per-edge cotangent is built
    elementwise (winner one-hot + broadcast statistic terms — their
    cotangents are per-channel scalars), and everything collapses into
    k row-scatter-adds of C+1 channels, one per neighbor slot (the extra
    channel carries the masked in-degree, which routes the
    destination-side ``2·q·ds2a`` term). Zero gathers in backward, and —
    because the slots accumulate sequentially through a fori_loop carry —
    O(N·C) peak backward memory: no (..., N, k, C) tensor ever exists,
    in EITHER direction.

    Convention: max/min ties route the full cotangent to the first
    winning slot, where AD splits it evenly — totals agree whenever tied
    slots reference the same point (e.g. masked queries degraded to
    self-edges), and elsewhere both are valid subgradients. ``w`` is
    treated as a NON-differentiable validity weight (its cotangent is
    hard zero): callers pass a bool-mask cast, never learned weights.

    ``q`` may carry MORE rows than ``p``/``idx``: under banded context
    parallelism the caller passes the halo-extended neighbor operand
    (``N_local + 2W`` rows) with localized indices, and the backward
    scatters into the full extended row space — the halo rows' gradients
    then ride the transposed ppermutes of the (differentiable) halo
    exchange back to their owning shards.

    Reference behavior covered: the gather + max-aggregation core of
    SURVEY.md §0.6 steps 2-4, per §3.3's "fuse gather+edge-build+MLP+max
    into a second on-chip pass" (discharged by restructuring: this fused
    traversal + the BN-commutation algebra of `edgeconv_block_reduced`).
    """
    return _gathered_stats_fwd(p, q, idx, w, gsign)[0]


# edge tensors (elements of the would-be (..., N, k, C) gather) at or
# above this size stream the forward one neighbor slot at a time instead
# of one fused gather traversal: XLA fuses the small-N traversal into its
# six reductions, but under remat the recomputed gather feeding six
# consumers MATERIALIZES — measured 10 G (half of it lane padding, C=64
# of a 128 lane) at N=1M, the binding tensor of the million-point f32
# step once the head concat is factorized (BASELINE.md). 2^27 puts the
# 131k+ remat regimes on the streamed path and leaves the 16k/4×4096
# headline regimes on the fused traversal.
SLOT_STREAM_ELEMS = 2**27

# rows (bl*N) above which the fused backward's per-slot scatter updates
# are built and applied in N-chunks. The slot loop's `win`/`upd` temps
# are full-width (bl, N, C/C+1) buffers that XLA lays out C-minor for
# the scatter and lane-pads 2.0x (64/65 -> 128 lanes) — at 1.75M-point
# events they are four ~0.9 G allocations, and the whole scanned train
# step plateaued at 15.76 G vs the 15.75 G budget across FOUR different
# knob combinations (head chunk 32M/16M, memfit 1.0, W=2048 — all
# identical, BASELINE.md 2M closure). Chunking halves/quarters exactly
# those buffers. Threshold = the largest measured-working unchunked
# single-chip regime (1.5M rows trains at 13.6 s unchunked): chunking
# only engages where the unchunked form could not run anyway. Per-
# destination scatter-add order changes across chunk boundaries — the
# same unspecified-order class as the scatter itself (gradients are
# float-tolerance vs other impls either way; eval has no scatter).
SCATTER_CHUNK_ROWS = 1_572_864

# experimental: lane-pack the fused backward's loop residents (see the
# `pack` block in _gathered_stats_bwd). A probe knob for the 2M-train
# allocator attack, NOT a shipped default — flip only via
# benchmarks/probe_2m_train.py (P2M_SCATTER_PACK=1).
SCATTER_PACK_OPERANDS = False


def _resolve_scatter_chunks(bl, ni) -> int:
    """Number of N-chunks the fused backward's per-slot scatter updates
    split into (1 = unchunked). Trace-time static; symbolic ni stays
    unchunked. Factored out so the hardware gate can report the chunk
    count its forced-threshold leg actually engages
    (benchmarks/tpu_gate.py leg_scan_chunk_grad)."""
    n_chunks = 1
    if isinstance(ni, int):
        while (
            ni % (n_chunks * 2) == 0
            and bl * ni // n_chunks > SCATTER_CHUNK_ROWS
        ):
            n_chunks *= 2
    return n_chunks


def _fwd_reductions(q, idx):
    """max/argmax/min/argmin + per-query neighbor sums of ``g = q[idx]``.

    Dense form for small edge tensors (one gather traversal, fused by
    XLA); slot-streamed fori_loop with O(N·C) carries above
    `SLOT_STREAM_ELEMS`. max/min/argmax/argmin are BITWISE identical
    between the two (max is exact; strict-compare updates keep the first
    winning slot, `jnp.argmax`'s tie rule) — only the f32 addition order
    of the sums differs, the usual non-model-defining reassociation
    class. Caveat: a NaN appearing at slot > 0 does not propagate into
    the streamed max/min (strict compares are False), unlike the dense
    reduce — only reachable on already-diverged activations.

    NOTE: production streaming now lives in `_gathered_stats_fwd`'s own
    loop (leaner carries: sq2 folds to (C,), winners stored uint8 —
    measured 2M-train levers). This function's streamed branch stays as
    the pinned semantic reference for that loop's tie/order rules
    (tests/test_edge.py::test_slot_streamed_forward_matches_dense) and
    is only reached below the threshold in production (dense branch).
    """
    k = idx.shape[-1]
    c = q.shape[-1]
    ni = idx.shape[-2]
    if ni * k * c < SLOT_STREAM_ELEMS:
        g = gather_neighbors(q, idx)  # fused into the reductions below
        mx = jnp.max(g, axis=-2)
        ax = jnp.argmax(g, axis=-2).astype(jnp.int32)
        mn = jnp.min(g, axis=-2)
        an = jnp.argmin(g, axis=-2).astype(jnp.int32)
        sq = jnp.sum(g, axis=-2)
        sq2 = jnp.sum(jnp.square(g), axis=-2)
        return mx, ax, mn, an, sq, sq2

    def slot(s):
        rows = jax.lax.dynamic_index_in_dim(idx, s, axis=-1)  # (..., N, 1)
        return jnp.take_along_axis(q, rows, axis=-2)  # (..., N, C)

    g0 = slot(0)
    # int32 slot indices derived from idx so the carries hold the varying
    # mesh axes under shard_map (same trick as the backward's zero carry)
    z = jnp.broadcast_to((idx[..., :1] * 0).astype(jnp.int32), g0.shape)

    def body(s, carry):
        mx, ax, mn, an, sq, sq2 = carry
        g = slot(s)
        gt = g > mx
        lt = g < mn
        return (
            jnp.where(gt, g, mx),
            jnp.where(gt, s, ax),
            jnp.where(lt, g, mn),
            jnp.where(lt, s, an),
            sq + g,
            sq2 + jnp.square(g),
        )

    mx, ax, mn, an, sq, sq2 = jax.lax.fori_loop(
        1, k, body, (g0, z, g0, z, g0, jnp.square(g0))
    )
    return mx, ax, mn, an, sq, sq2


def _maxmin_streamed(q, idx):
    """Per-query neighbor max/min of ``q[idx]``, one slot at a time.

    The eval-mode counterpart of `_fwd_reductions`'s streamed branch:
    two O(N·C) carries, no statistics, no winner indices. Bitwise equal
    to ``jnp.max/min(gather(q, idx), axis=-2)`` (same max/min monoid
    folded in the same slot order)."""
    k = idx.shape[-1]

    def slot(s):
        rows = jax.lax.dynamic_index_in_dim(idx, s, axis=-1)
        return jnp.take_along_axis(q, rows, axis=-2)

    def body(s, carry):
        mx, mn = carry
        g = slot(s)
        return jnp.maximum(mx, g), jnp.minimum(mn, g)

    g0 = slot(0)
    return jax.lax.fori_loop(1, k, body, (g0, g0))


def _winner_dtype(k: int):
    """Slot indices live in [0, k): store them narrow. At 2M points each
    (..., N, C) int32 winner tensor is a 1 G lane-padded residual; uint8
    is 4x smaller and covers any sane neighbor count."""
    return jnp.uint8 if k <= 255 else jnp.int32


def _gathered_stats_fwd(p, q, idx, w, gsign):
    k = idx.shape[-1]
    c = q.shape[-1]
    ni = idx.shape[-2]
    axes = tuple(range(p.ndim - 1))
    idt = _winner_dtype(k)
    wc = None if w is None else w[..., None]
    if ni * k * c >= SLOT_STREAM_ELEMS:
        # slot-streamed with MINIMAL carries. Unlike `_fwd_reductions`,
        # the per-row sum-of-squares never exists: only its (masked)
        # row-reduction s2a is ever consumed, so it folds to a (C,)
        # carry — at 2M points that removes a 1 G (N, C) f32 carry from
        # the forward AND from every remat replay in the backward.
        # s2a's summation order differs from the dense branch's
        # (slot-major vs row-major) — train-statistics reassociation
        # class, same as the chunked head (models/head.py).
        def slot(s):
            rows = jax.lax.dynamic_index_in_dim(idx, s, axis=-1)
            return jnp.take_along_axis(q, rows, axis=-2)

        def fold_sq2(g):
            g2 = jnp.square(g)
            return jnp.sum(g2 if wc is None else g2 * wc, axis=axes)

        g0 = slot(0)
        # winner carries derived from idx so they hold the varying mesh
        # axes under shard_map (same trick as the backward's zero carry)
        z = jnp.broadcast_to((idx[..., :1] * 0).astype(idt), g0.shape)

        def body(s, carry):
            mx, ax, mn, an, sq, s2a = carry
            g = slot(s)
            gt = g > mx
            lt = g < mn
            si = s.astype(idt)
            return (
                jnp.where(gt, g, mx),
                jnp.where(gt, si, ax),
                jnp.where(lt, g, mn),
                jnp.where(lt, si, an),
                sq + g,
                s2a + fold_sq2(g),
            )

        mx, ax, mn, an, sq, s2a = jax.lax.fori_loop(
            1, k, body, (g0, z, g0, z, g0, fold_sq2(g0))
        )
    else:
        mx, ax, mn, an, sq, sq2 = _fwd_reductions(q, idx)
        ax, an = ax.astype(idt), an.astype(idt)
        s2a = jnp.sum(sq2 if wc is None else sq2 * wc, axis=axes)
    if w is None:
        s1p = jnp.sum(sq, axis=axes)
        s2b = jnp.sum(p * sq, axis=axes)
    else:
        s1p = jnp.sum(sq * wc, axis=axes)
        s2b = jnp.sum(p * sq * wc, axis=axes)
    # fold the per-channel gamma-sign selection INTO the primitive: one
    # winner-value tensor and one uint8 winner-slot residual instead of
    # the mx/ax + mn/an pairs (halves the huge-N winner traffic; the
    # cotangent entering bwd is likewise a single dm)
    m = jnp.where(gsign, mx, mn)
    aw = jnp.where(gsign, ax, an)
    return (m, s1p, s2a, s2b), (p, q, idx, w, aw, sq)


def _gathered_stats_bwd(res, cot):
    p, q, idx, w, aw, sq = res
    dm, ds1p, ds2a, ds2b = cot
    c = q.shape[-1]
    nq = q.shape[-2]  # key rows (may exceed query rows: halo-extended q
    #                   under banded context parallelism carries 2W halo
    #                   rows whose gradients AD routes back through the
    #                   transposed ppermutes of the halo exchange)
    ni = idx.shape[-2]  # query rows
    k = idx.shape[-1]
    lead = idx.shape[:-2]
    bl = int(np.prod(lead)) if lead else 1
    # per-edge cotangent = winner one-hots + broadcast statistic terms,
    # accumulated ONE NEIGHBOR SLOT AT A TIME: a fori_loop of k row-
    # scatters of (..., N, C+1) updates. Same scatter-add totals as one
    # big scatter of the (..., N, k, C+1) update tensor (addition order
    # differs — unspecified for scatter-add either way), but the peak
    # backward memory is O(N·C), not O(N·k·C): at 512k points the
    # edge-tensor-sized update (with its padding) was the single-chip
    # training OOM (BASELINE.md long-context frontier), while (N, C+1)
    # temps are ~130 MB. The carry dependence serializes the slots, so
    # the scheduler can never hold more than one slot's temps.
    # The scatter is written as an explicit .at[].add, NOT via
    # jax.linear_transpose of the gather: transposing a closure inside a
    # custom-VJP bwd miscomputes cotangent varying-mesh-axes under
    # shard_map (observed: silently wrong gradients on a CPU mesh; a
    # standalone repro raises a vma type mismatch).
    stat = ds1p + ds2b * p  # (..., N, C): per-edge stats cotangent
    wrow = (
        jnp.ones(p.shape[:-1], jnp.float32) if w is None else w
    )  # (..., N)
    dm2 = dm.reshape(bl, ni, c)
    aw2 = aw.reshape(bl, ni, c)
    idx2 = idx.reshape(bl, ni, k)
    # the loop-invariant stat term and the in-degree channel are hoisted
    # TOGETHER as one (bl, N, C+1) base: concatenating the (bl, N, 1)
    # wcol per slot made XLA hold a separate lane-padded copy of it
    # (measured: 1 G for 8 MB of data at 2M points)
    base = jnp.concatenate(
        [
            (stat * wrow[..., None]).reshape(bl, ni, c),
            wrow.reshape(bl, ni)[..., None],
        ],
        axis=-1,
    )
    brow = jnp.arange(bl)[:, None]

    # chunk the per-slot updates over N above SCATTER_CHUNK_ROWS (see
    # the constant's rationale): same scatter-add totals, 1/n_chunks the
    # win/upd buffer footprint. n_chunks must divide N statically.
    n_chunks = _resolve_scatter_chunks(bl, ni)
    step = ni // n_chunks

    # experimental probe knob (VERDICT r4 #3): hold the loop residents
    # (dm2/aw2/base — sub-128-lane C-minor arrays the 2M closure blames
    # for two ~0.9 G 2.0x-lane-padded boundary relayout copies) LANE-
    # PACKED as (bl, N*C/128, 128), slicing + reshaping back per chunk
    # (models/head.py's eval trick). Element-order-preserving, so the
    # scatter-add totals are unchanged. Flip via
    # P2M_SCATTER_PACK=1 benchmarks/probe_2m_train.py.
    pack = (
        SCATTER_PACK_OPERANDS
        and isinstance(ni, int)
        and (step * c) % 128 == 0
        and (step * (c + 1)) % 128 == 0
    )
    if pack:
        dm2_pk = dm2.reshape(bl, ni * c // 128, 128)
        aw2_pk = aw2.reshape(bl, ni * c // 128, 128)
        base_pk = base.reshape(bl, ni * (c + 1) // 128, 128)

        def _chunk(a_pk, c_, ci):
            rows = step * c_ // 128
            return a_pk[:, ci * rows : (ci + 1) * rows].reshape(
                bl, step, c_
            )

    def one_slot(s, acc):
        si = s.astype(aw2.dtype)  # winners stored narrow (uint8)
        rows_s = jax.lax.dynamic_index_in_dim(idx2, s, axis=-1)  # (bl, N, 1)

        def add_chunk(acc, ci):
            sl = slice(ci * step, (ci + 1) * step)
            if pack:
                win = jnp.where(
                    _chunk(aw2_pk, c, ci) == si, _chunk(dm2_pk, c, ci), 0.0
                )
                upd = _chunk(base_pk, c + 1, ci) + jnp.pad(
                    win, ((0, 0), (0, 0), (0, 1))
                )
            else:
                win = jnp.where(aw2[:, sl] == si, dm2[:, sl], 0.0)
                upd = base[:, sl] + jnp.pad(win, ((0, 0), (0, 0), (0, 1)))
            return acc.at[brow, rows_s[:, sl, 0]].add(
                upd, mode="promise_in_bounds"
            )

        for ci in range(n_chunks):
            acc = add_chunk(acc, ci)
        return acc

    # derive the zero carry from a varying operand (a fresh jnp.zeros is
    # unvarying under shard_map and fails the scan-vma carry check once
    # the loop body adds varying updates). Derive from idx — int32, so
    # always finite — NOT by multiplying float operands by 0.0, which
    # would seed the accumulator with NaN when a cotangent is inf/NaN
    # and misattribute the poison to rows whose own updates are finite.
    zf = (idx2[..., :1, :1] * 0).astype(jnp.float32)  # (bl, 1, 1) varying 0s
    acc0 = jnp.broadcast_to(zf, (bl, nq, c + 1))
    scat = jax.lax.fori_loop(0, k, one_slot, acc0).reshape(
        *lead, nq, c + 1
    )
    # destination-side q² term: 2·q·ds2a, weighted by masked in-degree
    # (the extra scattered channel)
    dq = scat[..., :c] + 2.0 * q * ds2a * scat[..., c:]
    dp = (ds2b * sq) * wrow[..., None]
    f0 = jax.dtypes.float0
    return (
        dp.astype(p.dtype),
        dq.astype(q.dtype),
        np.zeros(idx.shape, f0),
        None if w is None else jnp.zeros_like(w),
        np.zeros((c,), f0),  # gsign: non-differentiable bool selector
    )


gathered_stats.defvjp(_gathered_stats_fwd, _gathered_stats_bwd)


def edgeconv_block_fused(
    p: jax.Array,
    q: jax.Array,
    bn_params,
    bn_state,
    idx: jax.Array,
    mask: jax.Array | None = None,
    *,
    train: bool,
    momentum: float = 0.9,
    eps: float = 1e-3,
    axis_name: str | None = None,
):
    """`edgeconv_block_reduced` with the `gathered_stats` custom-VJP
    core: identical forward semantics, and a backward that does zero
    gathers and k slot-wise row-scatters with O(N·C) peak memory (the
    block form that trains huge single-chip events — see BASELINE.md's
    long-context frontier). All BN/normalize math stays
    outside the custom VJP as plain (..., N, C)-sized AD (so shard_map's
    replication inference sees the statistic psums). LOCAL gathers only —
    but a parallelism whose gather decomposes into *exchange once, gather
    locally* still qualifies: banded CP passes the halo-extended ``q``
    (more rows than ``p``), the exact ring the all_gathered ``q``, each
    with matching indices, and AD of the exchange collective routes the
    extended-row gradients home.

    Returns ``(y float32, new_bn_state)``.
    """
    if not train:
        # eval needs only the neighbor max/min — the reduced path (same
        # formulas bitwise, no statistic reductions, no backward to
        # optimize) is strictly cheaper than running gathered_stats
        return edgeconv_block_reduced(
            p, q, bn_params, bn_state, idx, mask,
            train=False, momentum=momentum, eps=eps, axis_name=axis_name,
        )
    gamma = bn_params["scale"].astype(jnp.float32)
    beta = bn_params["bias"].astype(jnp.float32)
    p = p.astype(jnp.float32)
    k = idx.shape[-1]
    c = p.shape[-1]
    w = None if mask is None else mask.astype(jnp.float32)
    m, s1p, s2a, s2b = gathered_stats(
        p, q.astype(jnp.float32), idx, w, gamma >= 0
    )
    axes = tuple(range(p.ndim - 1))
    kf = jnp.float32(k)
    if w is None:
        nvalid = float(np.prod(p.shape[:-1]))
        count = jnp.full((c,), k * nvalid, jnp.float32)
        s1 = kf * jnp.sum(p, axis=axes) + s1p
        s2 = kf * jnp.sum(jnp.square(p), axis=axes) + 2.0 * s2b + s2a
    else:
        wc = w[..., None]
        count = jnp.broadcast_to(kf * jnp.sum(w), (c,))
        s1 = kf * jnp.sum(p * wc, axis=axes) + s1p
        s2 = (
            kf * jnp.sum(jnp.square(p) * wc, axis=axes) + 2.0 * s2b + s2a
        )
    from dgcnn_tpu.ops.norm import finalize_batch_stats

    mean, var, new_state = finalize_batch_stats(
        count, s1, s2, bn_state, momentum=momentum, axis_name=axis_name
    )
    # m is already the gamma-sign-selected winner (folded into the
    # primitive — see gathered_stats)
    y = jax.nn.relu(
        (p + m - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
    )
    return y, new_state


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
