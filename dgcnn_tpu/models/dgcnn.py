"""DGCNN segmentation models (plain and residual variants).

Reference behavior: `dgcnn/model.py (build)` [M per SURVEY.md §2 #6], per
SURVEY.md §0.6 [H]: NUM_EDGE_CONV EdgeConv blocks, each re-building the kNN
graph from the previous block's *learned features* (the dynamic graph),
followed by a segmentation head over the concatenated block outputs
(classic DGCNN-seg optionally tiles a global max-pooled feature back over
the points), producing per-point logits over NUM_CLASS. The repo exposes a
plain `dgcnn` and a residual flavor [M per SURVEY.md §0.6 #5].

TPU-first notes:
  * EdgeConv uses the factorized pre-activation (`ops.edge.edge_preact_factorized`)
    so MXU matmuls are per-point, not per-edge; XLA fuses the broadcast
    add + gather + ReLU + max-over-k without materializing (B,N,k,D) in HBM.
  * All shapes are static; variable-length events arrive padded with a
    validity mask that threads through kNN, BN statistics and pooling.
  * When a Pallas kNN implementation is supplied via ``knn_fn``, the
    dynamic-graph build never materializes the (N, N) distance matrix.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.ad_checkpoint
import jax.numpy as jnp

from dgcnn_tpu.models.core import (
    conv_bn_apply,
    conv_bn_init,
    dense_apply,
    dense_init,
    dropout,
)
from dgcnn_tpu.ops.edge import (
    edgeconv_block_fused,
    edgeconv_block_reduced,
    gather_neighbors,
)

# gather elements at or above which the EDGE impl's eval path streams one
# neighbor slot at a time (threshold rationale at the use site: set above
# every measured-working dense bf16 regime, engages only where the dense
# (..., N, k, C) gather cannot allocate — 40 GB at 8M points bf16)
EDGE_EVAL_STREAM_ELEMS = 2**31

# rows (B*N) at or above which block_scan="auto" runs homogeneous EdgeConv
# runs as one lax.scan in TRAIN mode: the measured line where the UNROLLED
# backward stops fitting one chip — 1M-row f32 training works unrolled
# (BASELINE.md frontier), 2M OOMs on ~39 interleaved per-block while-body
# temps that buffer assignment refuses to overlap across the six unrolled
# block backwards (43.8% fragmentation, 9.51 G live vs 15.75 G budget).
# A scanned run has ONE while body, so those temps share buffers by
# construction.
BLOCK_SCAN_ROWS = 2**21
from dgcnn_tpu.models.head import HEAD_STREAM_ELEMS, head_streamed
from dgcnn_tpu.ops.knn import banded_knn_indices, knn_indices
from dgcnn_tpu.ops.norm import batch_norm_apply
from dgcnn_tpu.ops.sfc import morton_order


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static architecture hyperparameters (reference flag names in parens)."""

    num_class: int = 2                       # NUM_CLASS
    k: int = 20                              # KVALUE
    edge_filters: tuple = (64, 64, 64, 64, 64, 64)  # NUM_EDGE_CONV x width
    residual: bool = False                   # MODEL_NAME=residual-dgcnn
    head_feat_dim: int = 1024
    head_mlp: tuple = (512, 256)
    global_pool: bool = True
    dropout: float = 0.0
    bn_momentum: float = 0.9
    compute_dtype: str = "float32"  # "bfloat16": bf16 activations/matmuls,
    #                                  f32 params, BN stats and logits
    remat: bool = False  # jax.checkpoint each EdgeConv block: recompute
    #                      the dynamic graph + edge tensor in backward
    #                      instead of keeping (B,N,k,C) residuals in HBM
    knn_every: int = 1  # rebuild the dynamic kNN graph every this many
    #                     blocks; 1 = per-block (reference semantics).
    #                     Blocks in between reuse the previous indices —
    #                     an opt-in speed/quality knob, since the graph
    #                     build is the dominant cost at large N (see
    #                     BASELINE.md for the measured accuracy delta)
    block_impl: str = "auto"  # EdgeConv block implementation:
    #   "auto" (default): silently resolves to "fused" when the
    #     restructured algebra applies (f32 compute, depth-1 blocks) and
    #     to "edge" otherwise — the fastest measured form per regime
    #     (interleaved A/B, BASELINE.md: fused is 9% faster at 1x16384
    #     and 15% at 4x4096, and its O(N·C) backward memory is what lets
    #     512k-point events train on one chip).
    #   "edge": the classic materializing form (gather + broadcast-add +
    #     BN + relu + max) — XLA fuses it into one traversal.
    #   "reduced": never materializes the (B,N,k,D) edge tensor —
    #     selection commutes with the monotone BN+relu chain and the BN
    #     statistics factor over the edge sum (ops.edge.
    #     edgeconv_block_reduced). Bitwise identical to "edge" in eval
    #     mode; training statistics differ only by f32 summation order.
    #   "fused": "reduced" forward + analytic custom VJP — backward does
    #     zero gathers and k slot-wise row-scatters in O(N·C) memory
    #     (ops.edge.edgeconv_block_fused). Applies to local gathers AND
    #     to both CP gathers, which decompose into exchange + local
    #     gather (banded: halo ppermutes; exact ring: one tiled
    #     all_gather); only a custom gather_fn with no decomposition
    #     falls back to "reduced".
    #   An implementation knob like use_pallas, NOT model-defining.
    #   That non-model-defining contract rests on the bitwise-equal-eval
    #   property, which only holds in f32: under compute_dtype=bfloat16
    #   the edge path rounds each h_ij = p_i + q_j to bf16 BEFORE BN
    #   (per-edge ~2^-8 rounding the factored statistics cannot
    #   reproduce), so bfloat16 models always use the edge form and
    #   block_impl is ignored (enforced in make_model).

    knn_window: int = 0  # banded sub-quadratic kNN: 0 = exact (reference
    #   semantics); > 0 sorts each event's points along a Morton curve
    #   over the input features (ops.sfc) ONCE at entry and restricts
    #   every dynamic-graph build to the `knn_window` consecutive sorted
    #   positions centered on each query — O(N·W) instead of O(N²) score
    #   work, the only remaining lever at 100k+ points where the exact
    #   kernel sits at its O(N²) roofline (BASELINE.md). The whole
    #   network runs in sorted order (kNN, gathers, BN and pooling are
    #   permutation-invariant); logits are unpermuted at exit.
    #   MODEL-DEFINING (changes predictions): inference/export adopt it
    #   from the checkpoint. Accuracy/recall measured in BASELINE.md and
    #   benchmarks/probe_banded.py.

    head_factorized: bool = False  # factorize the first head-MLP dense
    #   over the [agg, pooled-global] concat: agg @ W_a + (g @ W_g)
    #   broadcast — the (B, N, sumC + head_feat_dim) concat tensor never
    #   exists, and the pooled-global rows are multiplied once per EVENT
    #   instead of once per point (~2.7× fewer first-layer MACs at the
    #   flagship widths). The split contraction is measurably NOT
    #   bitwise vs the concat form (BASELINE.md long-context frontier:
    #   max diff ~3e-5 on TPU over random operands), so unlike
    #   block_impl this is MODEL-DEFINING: inference/export adopt it
    #   from the checkpoint (param shapes are unchanged — the same W is
    #   split at apply time — so checkpoints stay byte-compatible either
    #   way). Opt-in: the lever that fits million-point f32 training on
    #   ONE chip, where banded CP (which needs ≥ 2 devices) cannot help.

    head_stream: str = "auto"  # streamed (chunk-scanned) head
    #   (models.head.head_streamed): "auto" (default) engages it when the
    #   static per-head row count crosses HEAD_STREAM_ELEMS — the 1M-4M
    #   frontier where the dense head's (N, width) activations OOM —
    #   and keeps the dense head below it and for symbolic (shape-
    #   polymorphic export) batch dims; "on" forces it at any size;
    #   "off" always uses the dense head. NOT model-defining: eval
    #   output is BITWISE the dense head's (hardware-pinned by
    #   benchmarks/tpu_gate.py's headstream leg); train stats differ
    #   only by f32 summation order — the same reassociation class as
    #   block_impl. A custom non-max pool_fn keeps the dense head
    #   regardless (the streamed pool decomposition assumes masked max;
    #   make_model warns if "on" was requested).

    block_scan: str = "auto"  # run maximal structurally-identical runs of
    #   EdgeConv blocks (same param/state tree: the homogeneous 64->64
    #   tail of the flagship) as ONE lax.scan over stacked params instead
    #   of an unrolled Python loop. Every scanned block then shares a
    #   single while-body whose buffers XLA's assignment must reuse
    #   across iterations — the structural answer to the 2M-train
    #   allocator fragmentation (BASELINE.md: the unrolled form's
    #   per-block backward temps are placed without cross-while reuse).
    #   "auto" (default) engages in TRAIN mode at >= BLOCK_SCAN_ROWS rows
    #   (the measured unrolled OOM line; every smaller regime keeps the
    #   unrolled form that all round-2/3 numbers were measured on) and
    #   never for symbolic dims; "on" forces it; "off" never scans.
    #   NOT model-defining: the scanned body runs the exact same per-block
    #   ops — eval predictions match the unrolled form (pinned by test)
    #   and train differs at most by XLA fusion-level f32 rounding, the
    #   block_impl reassociation class.

    block_convs: int = 1  # stacked shared-MLP convs per EdgeConv block.
    #   SURVEY.md §0.6 step 3 tags the reference's per-block depth [M]
    #   ("possibly 2 stacked conv layers per block"); 1 matches the
    #   factorized production path, ≥2 adds per-EDGE conv+BN+relu stages
    #   before max-aggregation (paper-style blocks). Depth ≥2 always
    #   uses the materializing edge path (the extra convs act on the
    #   per-edge tensor, which the restructured impls never form).
    #   MODEL-DEFINING (changes parameter shapes).

    @property
    def num_edge_conv(self) -> int:
        return len(self.edge_filters)


class Model(NamedTuple):
    init: Callable  # (rng, in_dim) -> (params, state)
    apply: Callable  # (params, state, points, mask, train=..., rng=...) -> (logits, new_state)
    spec: ModelSpec
    # the EdgeConv implementation the build resolved ("auto" and the
    # f32/depth-1/CP constraints applied) — what apply will actually run
    block_impl: str = "edge"


def _masked_max_points(x, mask):
    """Max over the point axis, ignoring padded points. x: (B, N, C)."""
    if mask is None:
        return jnp.max(x, axis=-2)
    neg = jnp.finfo(x.dtype).min
    y = jnp.max(jnp.where(mask[..., None], x, neg), axis=-2)
    # guard fully-empty events (all-padded): produce zeros, not -inf
    any_valid = jnp.any(mask, axis=-1, keepdims=True)
    return jnp.where(any_valid, y, 0.0)


def make_model(
    spec: ModelSpec,
    knn_fn=None,
    precision=None,
    gather_fn=None,
    pool_fn=None,
    gather_extend_fn=None,
    gather_localize_fn=None,
    pre_sorted: bool = False,
) -> Model:
    """Build the init/apply pair for a DGCNN segmentation model.

    Args:
      spec: architecture hyperparameters.
      knn_fn: optional override with signature ``(x, k, mask) -> (idx, valid)``
        — e.g. the fused Pallas kernel, or `ring_knn` under context
        parallelism. Defaults to the jnp oracle.
      precision: matmul precision for oracle-vs-kernel comparisons.
      gather_fn: ``(values, idx) -> (B, N, k, C)`` neighbor gather —
        `ring_gather` under context parallelism. Defaults to the local
        take-along-axis gather.
      pool_fn: ``(x, mask) -> (B, C)`` masked global max pool — a
        pmax-reducing variant under context parallelism.
      gather_extend_fn / gather_localize_fn: optional decomposition of
        ``gather_fn`` into *exchange once, gather locally*:
        ``extend(values) -> values_ext`` (differentiable) and
        ``localize(idx) -> rows into values_ext``, such that
        ``gather_fn(v, idx) == gather_neighbors(extend(v), localize(idx))``
        bitwise (banded CP's halo exchange satisfies this —
        `parallel.context_parallel.banded_cp_graph_ops`). When provided,
        the fused block's O(N·C)-memory custom VJP applies under the
        sharded gather, so ``block_impl="auto"`` resolves to "fused"
        there too.
      pre_sorted: banded models (``knn_window > 0``) normally Morton-sort
        at entry and unpermute logits at exit; True means the CALLER
        already sorted the whole batch globally (banded context
        parallelism — a per-shard local sort would be wrong) and wants
        logits back in sorted order. An execution detail like the
        ``*_fn`` overrides, NOT model-defining.
    """
    if knn_fn is not None:
        _knn = knn_fn
    elif spec.knn_window > 0:
        # banded oracle over SFC-sorted points (apply permutes at entry);
        # the Pallas banded kernel arrives through knn_fn on TPU
        _knn = lambda x, k, mask: banded_knn_indices(  # noqa: E731
            x, k, mask, window=spec.knn_window, precision=precision
        )
    else:
        _knn = lambda x, k, mask: knn_indices(  # noqa: E731
            x, k, mask, precision=precision
        )
    _gather = gather_fn or gather_neighbors
    _pool = pool_fn or _masked_max_points

    restructurable = spec.compute_dtype == "float32" and spec.block_convs == 1
    # the fused custom VJP needs gathers it can transpose locally: either
    # the default local gather, or a gather that DECOMPOSES into a
    # differentiable exchange + local gather (banded CP's halo pair)
    fused_gather_ok = gather_fn is None or (
        gather_extend_fn is not None and gather_localize_fn is not None
    )
    if spec.block_impl == "auto":
        # silently pick the fastest measured form for this config (see
        # the ModelSpec notes; eval predictions are bitwise identical
        # either way, so auto-resolution is not model-defining). Both
        # shipped CP gathers decompose (halo exchange / tiled
        # all_gather), so auto is fused under CP too — its O(rows·C)
        # backward strictly undercuts the edge/reduced impls'
        # (N_local, k, C) edge-tensor temps there (k = 20 vs D ≤ 8
        # extension rows). A gather_fn override WITHOUT a decomposition
        # (custom callers) keeps "edge": the fall-through would be
        # "reduced", whose backward has the LARGEST edge-tensor memory
        # (BASELINE.md: 37.2 G vs edge's 20.3 G at 512k).
        block_impl = (
            "fused" if restructurable and fused_gather_ok else "edge"
        )
    else:
        block_impl = spec.block_impl
        if block_impl != "edge" and not restructurable:
            # an EXPLICITLY requested restructured form needs f32 and
            # depth-1 blocks (see the block_impl / block_convs notes on
            # ModelSpec); say so once at build time instead of silently
            # running the edge path
            reason = (
                f"compute_dtype={spec.compute_dtype!r}"
                if spec.compute_dtype != "float32"
                else f"block_convs={spec.block_convs}"
            )
            print(
                f"WARNING: block_impl={spec.block_impl!r} requires f32 "
                f"depth-1 blocks; {reason} forces the 'edge' implementation",
                flush=True,
            )

    if spec.head_stream not in ("auto", "on", "off"):
        raise ValueError(
            f"head_stream must be 'auto', 'on' or 'off', got "
            f"{spec.head_stream!r}"
        )
    if spec.block_scan not in ("auto", "on", "off"):
        raise ValueError(
            f"block_scan must be 'auto', 'on' or 'off', got "
            f"{spec.block_scan!r}"
        )
    if (
        spec.head_stream == "on"
        and spec.global_pool
        and pool_fn is not None
        and not getattr(pool_fn, "is_masked_max", False)
    ):
        print(
            "WARNING: head_stream='on' requires a masked-max pool; the "
            "custom pool_fn cannot be chunk-decomposed, so the dense "
            "head will be used",
            flush=True,
        )

    def init(rng, in_dim: int):
        # keys/block (conv + extra convs + optional proj) + head feat/mlp/out
        n_keys = (
            (1 + spec.block_convs) * len(spec.edge_filters)
            + len(spec.head_mlp)
            + 4
        )
        keys = iter(jax.random.split(rng, n_keys))
        blocks, block_states = [], []
        c_in = in_dim
        for c_out in spec.edge_filters:
            p, s = conv_bn_init(next(keys), 2 * c_in, c_out)
            if spec.block_convs > 1:
                # paper-style stacked per-edge convs: state becomes a
                # dict ONLY at depth >= 2, so depth-1 checkpoints keep
                # their historical tree structure
                extra = [
                    conv_bn_init(next(keys), c_out, c_out)
                    for _ in range(spec.block_convs - 1)
                ]
                p["extra"] = [ep for ep, _ in extra]
                s = {"main": s, "extra": [es for _, es in extra]}
            if spec.residual and c_in != c_out:
                p["proj"] = dense_init(next(keys), c_in, c_out)
            blocks.append(p)
            block_states.append(s)
            c_in = c_out

        concat_dim = sum(spec.edge_filters)
        feat_p, feat_s = conv_bn_init(next(keys), concat_dim, spec.head_feat_dim)
        mlp_in = (
            concat_dim + spec.head_feat_dim if spec.global_pool else spec.head_feat_dim
        )
        mlp, mlp_states = [], []
        for width in spec.head_mlp:
            p, s = conv_bn_init(next(keys), mlp_in, width)
            mlp.append(p)
            mlp_states.append(s)
            mlp_in = width
        out_p = dense_init(next(keys), mlp_in, spec.num_class)

        params = {"blocks": blocks, "head": {"feat": feat_p, "mlp": mlp, "out": out_p}}
        state = {"blocks": block_states, "head": {"feat": feat_s, "mlp": mlp_states}}
        return params, state

    def apply(
        params,
        state,
        points,
        mask=None,
        *,
        train: bool = False,
        rng=None,
        bn_axis=None,
    ):
        """Forward pass. points: (B, N, F); mask: (B, N) bool or None.

        ``bn_axis``: mesh axis name for cross-replica sync BN (None = the
        reference's per-tower statistics).

        Returns (logits (B, N, num_class), new_state).
        """
        cdtype = jnp.dtype(spec.compute_dtype)
        inv_pos = None
        if spec.knn_window > 0 and not pre_sorted:
            # banded kNN: run the WHOLE network in space-filling-curve
            # order (padded points last) — every op between here and the
            # exit unpermute is permutation-invariant given the permuted
            # mask, so only the entry/exit gathers are new work. The sort
            # key comes from the raw input features (ops.sfc docstring).
            order, inv_pos = morton_order(points, mask)
            points = jnp.take_along_axis(points, order[..., None], axis=-2)
            if mask is not None:
                mask = jnp.take_along_axis(mask, order, axis=-1)
        x = points.astype(cdtype)
        new_state = {"blocks": [], "head": {}}
        block_feats = []
        edge_mask = None if mask is None else mask  # (B, N) → broadcasts over k

        def build_graph(x):
            idx, _ = _knn(x, spec.k, mask)
            # under remat, SAVE the neighbor indices instead of re-running
            # the kNN kernel in backward: the graph build is stop-gradient
            # (integer indices), so recomputing it buys nothing, and idx is
            # tiny ((B,N,k) int32 = N/819 MB) next to the (B,N,k,C) edge
            # tensors remat exists to avoid. Halves the kNN cost of a
            # remat step (measured at 131k; see BASELINE.md). The build
            # lives outside block_fn so `knn_every > 1` can reuse indices
            # across blocks; as a checkpointed-fn *input*, idx is a saved
            # residual either way.
            return jax.ad_checkpoint.checkpoint_name(idx, "knn_idx")

        def block_fn(x, idx, blk_p, blk_s):
            # factorized EdgeConv pre-activation h_ij = P_i + Q_j (see
            # ops.edge.edge_preact_factorized — inlined here so the gather
            # is pluggable for context parallelism); no bias: BN follows
            c = x.shape[-1]
            w = blk_p["w"].astype(cdtype)
            wa, wb = w[:c], w[c:]
            p_feat = jnp.einsum("...nc,cd->...nd", x, wa - wb, precision=precision)
            q_feat = jnp.einsum("...nc,cd->...nd", x, wb, precision=precision)
            # the reduced/fused algebra computes in f32; with bf16
            # compute the edge path's per-edge rounding cannot be
            # reproduced, so bfloat16 models always use "edge" (keeps
            # block_impl a non-model-defining knob — see ModelSpec).
            # Stacked per-edge convs (block_convs >= 2) likewise need
            # the materialized edge tensor.
            use_restructured = (
                cdtype == jnp.float32 and spec.block_convs == 1
            )
            if (
                block_impl == "fused"
                and fused_gather_ok
                and use_restructured
            ):
                # "reduced" forward + analytic custom VJP: backward is k
                # slot-wise row-scatters in O(N·C) memory, zero gathers.
                # Local gathers only — but both CP gathers decompose
                # into a differentiable exchange + local gather (banded:
                # halo ppermutes; exact ring: tiled all_gather), so the
                # same VJP applies to the extended neighbor operand and
                # the extension rows' gradients ride the transposed
                # collectives home. Only a custom gather_fn with no
                # decomposition falls through to "reduced"/edge AD.
                if gather_fn is None:
                    q_in, idx_in = q_feat, idx
                else:
                    q_in = gather_extend_fn(q_feat)
                    idx_in = gather_localize_fn(idx)
                y, bn_s = edgeconv_block_fused(
                    p_feat,
                    q_in,
                    blk_p["bn"],
                    blk_s,
                    idx_in,
                    edge_mask,
                    train=train,
                    momentum=spec.bn_momentum,
                    axis_name=bn_axis,
                )
            elif block_impl in ("reduced", "fused") and use_restructured:
                # algebraically fused: the (B,N,k,C_out) edge tensor never
                # exists — per-query gathered reductions replace the
                # materialize+BN+relu+max chain (bitwise equal in eval
                # mode; see ops.edge.edgeconv_block_reduced)
                y, bn_s = edgeconv_block_reduced(
                    p_feat,
                    q_feat,
                    blk_p["bn"],
                    blk_s,
                    idx,
                    edge_mask,
                    train=train,
                    momentum=spec.bn_momentum,
                    axis_name=bn_axis,
                    gather_fn=_gather,
                )
            else:
                stacked = "extra" in blk_p  # block_convs >= 2
                # total gather elements of the (..., N, k, C) tensor —
                # accumulate over ALL dims of idx (leading batch dims
                # included: a (B, N, k, C) dense gather is B x the
                # per-event size), symbolic dims keep the dense form
                # (same guard as the head_stream/block_scan auto paths)
                gather_elems = q_feat.shape[-1]
                for d in idx.shape:
                    if not isinstance(d, int):
                        gather_elems = 0
                        break
                    gather_elems *= d
                # huge-N EVAL on the edge impl (the bf16 / block_convs>=2
                # route): the materialized (..., N, k, C) gather is the
                # binding allocation (measured 40 GB at 8M bf16) — stream
                # the whole per-edge chain one neighbor slot at a time
                # instead. Every op before the k-aggregation (add, BN with
                # running stats, relu, stacked per-edge convs) is
                # elementwise per edge, and max folds exactly in any
                # order (jnp.maximum propagates NaN like the dense
                # reduce), so in f32 the result is BITWISE the dense edge
                # eval (pinned by test). In bf16 the two forms differ by
                # ~1 bf16 ulp on a minority of elements — NOT a bug in
                # either: XLA compiles with --xla_allow_excess_precision,
                # so whether the bf16 add/matmul outputs round before the
                # f32 BN upcast is fusion-shape-dependent (measured on
                # CPU: the same pair of forms agrees or differs by 1 ulp
                # depending on jit boundaries). Hence the threshold is
                # EDGE_EVAL_STREAM_ELEMS = 2**31 gather elements — far
                # above every measured-working dense bf16 regime (<= 1M
                # points = 1.3e9), so streaming only engages where the
                # dense gather physically cannot allocate and no working
                # config's outputs change. Local gathers only; symbolic
                # dims keep the dense form.
                stream_edge_eval = (
                    not train
                    and gather_fn is None
                    and gather_elems >= EDGE_EVAL_STREAM_ELEMS
                )
                if stream_edge_eval:

                    def edge_chain_eval(hs):
                        # one slot's (..., N, C) edge chain, eval mode
                        hs, _ = batch_norm_apply(
                            {
                                "scale": blk_p["bn"]["scale"],
                                "bias": blk_p["bn"]["bias"],
                            },
                            blk_s["main"] if stacked else blk_s,
                            hs,
                            None,
                            train=False,
                            momentum=spec.bn_momentum,
                            axis_name=bn_axis,
                            out_dtype=jnp.float32,
                        )
                        hs = jax.nn.relu(hs)
                        if stacked:
                            for ep, es in zip(blk_p["extra"], blk_s["extra"]):
                                hs = jnp.einsum(
                                    "...c,cd->...d",
                                    hs.astype(cdtype),
                                    ep["w"].astype(cdtype),
                                    precision=precision,
                                )
                                hs, _ = batch_norm_apply(
                                    {
                                        "scale": ep["bn"]["scale"],
                                        "bias": ep["bn"]["bias"],
                                    },
                                    es,
                                    hs,
                                    None,
                                    train=False,
                                    momentum=spec.bn_momentum,
                                    axis_name=bn_axis,
                                    out_dtype=jnp.float32,
                                )
                                hs = jax.nn.relu(hs)
                        return hs

                    def slot_h(s):
                        rows = jax.lax.dynamic_index_in_dim(idx, s, axis=-1)
                        return p_feat + jnp.take_along_axis(
                            q_feat, rows, axis=-2
                        )

                    # the loop carry is the ONLY materialized (..., N, C)
                    # tensor of this path — at 8M points its f32 copy got
                    # a 2x lane-padded layout (a measured 4 G, the
                    # binding allocation). Carry in compute dtype: the
                    # cast is monotone, so max(cast(x_s)) ==
                    # cast(max(x_s)) element-exactly — f32 models stay
                    # BITWISE (cast is identity), bf16 halves the carry
                    # and rounds once before the residual instead of
                    # after (inside the path's documented ~1-ulp class).
                    # Lane-packing the carry (the models.head trick) was
                    # measured WORSE here: the reshape breaks the
                    # slot-body fusion and both the f32 chain output and
                    # the packed carry materialize (+1.8 G at 8M).
                    acc = jax.lax.fori_loop(
                        1,
                        idx.shape[-1],
                        lambda s, acc: jnp.maximum(
                            acc, edge_chain_eval(slot_h(s)).astype(cdtype)
                        ),
                        edge_chain_eval(slot_h(0)).astype(cdtype),
                    )
                    y = acc.astype(jnp.float32)
                    # eval-mode BN returns its state unchanged
                    if spec.residual:
                        shortcut = (
                            dense_apply(
                                blk_p["proj"], x,
                                precision=precision, dtype=cdtype,
                            )
                            if "proj" in blk_p
                            else x
                        )
                        y = y + shortcut.astype(y.dtype)
                    return y.astype(cdtype), blk_s

                h = p_feat[..., :, None, :] + _gather(q_feat, idx)  # (B,N,k,C_out)

                bn_mask = None if edge_mask is None else edge_mask[..., None]
                # post-BN chain (relu, max, residual add) stays f32: casting
                # it to bf16 makes deep-stack gradients overflow (see
                # ops.norm.batch_norm_apply); y is cast back at the block
                # boundary so the next block's matmuls run in compute dtype
                h, bn_s0 = batch_norm_apply(
                    {"scale": blk_p["bn"]["scale"], "bias": blk_p["bn"]["bias"]},
                    blk_s["main"] if stacked else blk_s,
                    h,
                    bn_mask,
                    train=train,
                    momentum=spec.bn_momentum,
                    axis_name=bn_axis,
                    out_dtype=jnp.float32,
                )
                h = jax.nn.relu(h)
                if stacked:
                    # paper-style stacked per-edge convs (SURVEY §0.6
                    # step 3 [M]): conv+BN+relu on the (B,N,k,C) edge
                    # tensor before aggregation
                    extra_states = []
                    for ep, es in zip(blk_p["extra"], blk_s["extra"]):
                        h = jnp.einsum(
                            "...c,cd->...d",
                            h.astype(cdtype),
                            ep["w"].astype(cdtype),
                            precision=precision,
                        )
                        h, es2 = batch_norm_apply(
                            {
                                "scale": ep["bn"]["scale"],
                                "bias": ep["bn"]["bias"],
                            },
                            es,
                            h,
                            bn_mask,
                            train=train,
                            momentum=spec.bn_momentum,
                            axis_name=bn_axis,
                            out_dtype=jnp.float32,
                        )
                        h = jax.nn.relu(h)
                        extra_states.append(es2)
                    bn_s = {"main": bn_s0, "extra": extra_states}
                else:
                    bn_s = bn_s0
                y = jnp.max(h, axis=-2)  # aggregate over k
            if spec.residual:
                shortcut = (
                    dense_apply(blk_p["proj"], x, precision=precision, dtype=cdtype)
                    if "proj" in blk_p
                    else x
                )
                y = y + shortcut.astype(y.dtype)
            return y.astype(cdtype), bn_s

        if spec.remat:
            # recompute the (B,N,k,C) edge tensor in the backward pass
            # instead of holding it in HBM — BASELINE's "on-chip dynamic
            # graph recompute per layer" — but keep the named knn_idx
            # residual (see above)
            block_fn = jax.checkpoint(
                block_fn,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "knn_idx"
                ),
            )

        if spec.block_scan == "on":
            use_block_scan = True
        elif spec.block_scan == "off":
            use_block_scan = False
        else:
            # "auto": engage only at the huge-N TRAIN frontier where the
            # UNROLLED backward's per-block while-body temps fragment the
            # allocator past the HBM budget (measured at 2M rows —
            # BASELINE.md 2M-train closure); every smaller regime keeps
            # the unrolled form all prior rounds' numbers were measured
            # on. Symbolic dims (shape-polymorphic export) stay unrolled.
            rows = 1
            for d in points.shape[:-1]:
                if not isinstance(d, int):
                    rows = 0
                    break
                rows *= d
            use_block_scan = train and rows >= BLOCK_SCAN_ROWS

        def _struct(bp, bs):
            leaves, treedef = jax.tree_util.tree_flatten((bp, bs))
            return treedef, tuple(
                (leaf.shape, jnp.dtype(leaf.dtype)) for leaf in leaves
            )

        # group consecutive blocks with identical param/state structure
        # (e.g. the flagship's homogeneous 64->64 tail; block 1 differs by
        # its input width and optional residual proj): runs of length >= 2
        # execute as one lax.scan over stacked params when scanning is on
        runs = []  # [start_index, count]
        prev_struct = None
        for i, (bp, bs) in enumerate(zip(params["blocks"], state["blocks"])):
            sk = _struct(bp, bs) if use_block_scan else None
            if use_block_scan and runs and sk == prev_struct:
                runs[-1][1] += 1
            else:
                runs.append([i, 1])
            prev_struct = sk

        idx = None
        for start, count in runs:
            if count == 1:
                blk_p = params["blocks"][start]
                blk_s = state["blocks"][start]
                if start % spec.knn_every == 0:
                    idx = build_graph(x)  # dynamic graph from current features
                y, bn_s = block_fn(x, idx, blk_p, blk_s)
                new_state["blocks"].append(bn_s)
                block_feats.append(y)
                x = y
                continue
            # scanned run: stack params/states along a new leading axis;
            # the body applies the SAME per-block ops as the unrolled loop
            pstack = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *params["blocks"][start:start + count]
            )
            sstack = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *state["blocks"][start:start + count]
            )
            rebuilds = [
                (start + t) % spec.knn_every == 0 for t in range(count)
            ]
            if idx is None:
                # the run starts at block 0, which always rebuilds
                # (0 % knn_every == 0) — seed the carry with a correctly
                # shaped dummy that is never read. Derive a varying zero
                # from the data (the models.head vz trick): under
                # shard_map a constant init is unvarying while the scan
                # body's build_graph output is varying, and lax.scan's
                # carry vma check rejects the mismatch at trace time
                vz = (x[..., :1].sum() * 0).astype(jnp.int32)
                idx0 = jnp.zeros(x.shape[:-1] + (spec.k,), jnp.int32) + vz
            else:
                idx0 = idx
            if all(rebuilds):

                def body(carry, xs):
                    xc, _ = carry
                    idx2 = build_graph(xc)
                    y, bn_s = block_fn(xc, idx2, xs["p"], xs["s"])
                    return (y, idx2), (y, bn_s)

                xs_in = {"p": pstack, "s": sstack}
            elif not any(rebuilds):

                def body(carry, xs):
                    xc, idxc = carry
                    y, bn_s = block_fn(xc, idxc, xs["p"], xs["s"])
                    return (y, idxc), (y, bn_s)

                xs_in = {"p": pstack, "s": sstack}
            else:
                # mixed rebuild/reuse inside the run (knn_every > 1):
                # decide per iteration on the traced block index
                def body(carry, xs):
                    xc, idxc = carry
                    idx2 = jax.lax.cond(
                        xs["i"] % spec.knn_every == 0,
                        lambda xc, idxc: build_graph(xc),
                        lambda xc, idxc: idxc,
                        xc,
                        idxc,
                    )
                    y, bn_s = block_fn(xc, idx2, xs["p"], xs["s"])
                    return (y, idx2), (y, bn_s)

                xs_in = {
                    "p": pstack,
                    "s": sstack,
                    "i": jnp.arange(start, start + count, dtype=jnp.int32),
                }
            (x, idx), (ys, bn_stack) = jax.lax.scan(body, (x, idx0), xs_in)
            for t in range(count):
                block_feats.append(ys[t])
                new_state["blocks"].append(
                    jax.tree_util.tree_map(lambda a, _t=t: a[_t], bn_stack)
                )

        # the streamed pool decomposition assumes masked-MAX pooling (the
        # model default and both CP pools); a custom non-max pool_fn keeps
        # the dense head (warned at build time if head_stream="on")
        stream_pool_ok = (
            not spec.global_pool
            or pool_fn is None
            or getattr(pool_fn, "is_masked_max", False)
        )
        if spec.head_stream == "on":
            use_stream = stream_pool_ok
        elif spec.head_stream == "off":
            use_stream = False
        else:  # "auto": engage at the huge-N frontier only
            rows = 1
            for d in block_feats[0].shape[:-1]:
                if not isinstance(d, int):
                    # symbolic dim (shape-polymorphic `export -mb 0`):
                    # poly-batch artifacts are small-N serving, and
                    # int(d) on a symbolic dim raises
                    # InconclusiveDimensionOperation — keep the dense head
                    rows = 0
                    break
                rows *= d
            use_stream = (
                stream_pool_ok
                and rows * max(spec.head_feat_dim, 1) >= HEAD_STREAM_ELEMS
            )
        if use_stream:
            # frontier-size events: the dense head's per-point activations
            # are the binding HBM tensors (measured: (2M,1024)+2x(2M,512)
            # +2x(2M,256) backward temps / a 301 MB miss at 4M eval —
            # BASELINE.md). Stream the head over point chunks instead;
            # eval-bitwise, train stats differ only by summation order
            # (models.head docstring); the (B, N, sum C) agg concat is
            # never materialized (a measured 6 G at 4M). A custom
            # non-max pool_fn keeps the dense head (its pool cannot be
            # chunk-decomposed).
            logits, head_state = head_streamed(
                params["head"],
                state["head"],
                block_feats,
                mask,
                spec=spec,
                cdtype=cdtype,
                precision=precision,
                bn_axis=bn_axis,
                pool_fn=_pool,
                rng=rng,
                train=train,
            )
            new_state["head"] = head_state
            if inv_pos is not None:
                logits = jnp.take_along_axis(
                    logits, inv_pos[..., None], axis=-2
                )
            return logits.astype(jnp.float32), new_state

        agg = jnp.concatenate(block_feats, axis=-1)  # (B, N, sum C)
        feat, feat_s = conv_bn_apply(
            params["head"]["feat"],
            state["head"]["feat"],
            agg,
            mask,
            train=train,
            momentum=spec.bn_momentum,
            precision=precision,
            axis_name=bn_axis,
            dtype=cdtype,
        )
        new_state["head"]["feat"] = feat_s

        factorize_head = spec.global_pool and spec.head_factorized
        if spec.global_pool:
            g_vec = _pool(feat, mask)  # (B, head_feat_dim)
            if factorize_head:
                # the first head-MLP dense consumes agg and the pooled
                # global separately (see ModelSpec.head_factorized):
                # no (B, N, sumC + head_feat_dim) concat is ever built
                h = agg
            else:
                g = jnp.broadcast_to(
                    g_vec[..., None, :], agg.shape[:-1] + g_vec.shape[-1:]
                )
                h = jnp.concatenate([agg, g], axis=-1)
        else:
            h = feat

        keys = (
            iter(jax.random.split(rng, len(params["head"]["mlp"])))
            if rng is not None
            else iter([None] * len(params["head"]["mlp"]))
        )
        new_state["head"]["mlp"] = []
        for li, (p, s) in enumerate(
            zip(params["head"]["mlp"], state["head"]["mlp"])
        ):
            if li == 0 and factorize_head:
                # same W as the concat form, split at the agg boundary:
                # h @ [Wa; Wg] = agg @ Wa + g @ Wg, with the per-event
                # g @ Wg computed once and broadcast over points
                ca = h.shape[-1]
                w = p["w"].astype(cdtype)
                pre = jnp.einsum(
                    "...nc,cd->...nd", h.astype(cdtype), w[:ca],
                    precision=precision,
                ) + jnp.einsum(
                    "...c,cd->...d", g_vec.astype(cdtype), w[ca:],
                    precision=precision,
                )[..., None, :]
                y_dtype = pre.dtype
                h, s2 = batch_norm_apply(
                    {"scale": p["bn"]["scale"], "bias": p["bn"]["bias"]},
                    s,
                    pre,
                    mask,
                    train=train,
                    momentum=spec.bn_momentum,
                    axis_name=bn_axis,
                    out_dtype=jnp.float32,
                )
                h = jax.nn.relu(h).astype(y_dtype)
            else:
                h, s2 = conv_bn_apply(
                    p, s, h, mask, train=train, momentum=spec.bn_momentum,
                    precision=precision, axis_name=bn_axis, dtype=cdtype,
                )
            h = dropout(next(keys), h, spec.dropout, train=train)
            new_state["head"]["mlp"].append(s2)

        logits = dense_apply(
            params["head"]["out"], h, precision=precision, dtype=cdtype
        )
        if inv_pos is not None:
            # back to the caller's point order (row j was computed at
            # sorted position inv_pos[j])
            logits = jnp.take_along_axis(logits, inv_pos[..., None], axis=-2)
        # losses/metrics always see f32 logits
        return logits.astype(jnp.float32), new_state

    # what the dispatch in block_fn will actually run, for callers/tests
    effective_impl = block_impl
    if not restructurable:
        effective_impl = "edge"
    elif effective_impl == "fused" and not fused_gather_ok:
        # explicit fused under the exact ring (no local decomposition)
        effective_impl = "reduced"
    return Model(init=init, apply=apply, spec=spec, block_impl=effective_impl)
