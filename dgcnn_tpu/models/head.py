"""Streamed (chunked-over-points) head for huge-N events.

The DGCNN head is pointwise: a feature conv (agg -> head_feat_dim) whose
ONLY consumer under global pooling is the masked max pool, then an MLP
over [agg, pooled-global] (or the factorized pair — see
`ModelSpec.head_factorized`), then the output dense. At frontier sizes
its per-point activations dominate HBM: at N=2M the train-step backward
holds an (N, 1024) f32 temp (8 G) plus two (N, 512) and two (N, 256)
temps — measured as the binding allocations once the blocks are
slot-streamed and the head concat is factorized (BASELINE.md).

This module rebuilds the head as scans over point chunks so no
(N, width) tensor wider than one chunk ever exists:

- The pooled global vector commutes with BN+relu exactly like the
  EdgeConv blocks (`ops.edge.edgeconv_block_reduced` identity 1): per
  channel, ``t -> relu((t - mu) * rsqrt(var+eps) * gamma + beta)`` and
  the final compute-dtype cast are monotone (nondecreasing for
  ``gamma >= 0``, nonincreasing otherwise), so the masked pool of
  ``relu(bn(agg @ Wf))`` is ``relu(bn(M))`` with ``M`` the masked
  per-channel max-or-min of the PRE-activation — accumulated chunk by
  chunk with two (B, C) carries.
- Train-mode BN statistics accumulate per chunk and finalize through
  the shared `ops.norm.finalize_batch_stats` (same psums under sync-BN /
  context parallelism). Each MLP layer takes one stats sweep that
  recomputes the ladder below it per chunk (matmul FLOPs are a
  rounding error at these sizes — the step is selection/HBM-bound).
- Each sweep is a `lax.scan` with a rematerialized body: the backward
  re-derives chunk temps from ``agg`` instead of saving them, so peak
  memory is O(chunk) + the (B, C)-sized carries.

Numerics contract (mirrors the block-impl contract):
- EVAL output is intended to be bitwise the dense head's: per-row dense
  math is row-independent, the normalize chain is the exact
  `batch_norm_apply` expression, and chunked masked max equals the
  dense reduce (same monoid, same fold order). Verified on hardware by
  `benchmarks/tpu_gate.py`'s streamed-head leg.
- TRAIN differs from the dense head only in the f32 summation order of
  BN batch statistics — the same reassociation class as the fused
  block's (and as XLA's own between-compilation variance).
- Dropout > 0 draws per-(layer, chunk) folded keys instead of one
  (B, N, C) draw — deterministic per seed, but a different stream than
  the dense head's; only reachable above the streaming threshold.

The pool decomposition assumes masked-MAX pooling (the model default
and both context-parallel pools). `make_model` only routes here when
its pool is one of those; a custom `pool_fn` keeps the dense head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.ops.norm import finalize_batch_stats

# rows * head_feat_dim at or above which the head streams. 2**30 is the
# measured dense-head OOM line on 16 G HBM: at 1M x 1024 (= 2**30) the
# dense concat misses by 3.1 G in train and 2.5 G in eval (round 3
# needed --head_factorized there ONLY because auto sat at 2**31); 512k
# x 1024 (= 2**29) fits and is faster dense. Streaming is eval-bitwise
# and train-stat-reassociation-only, so auto engaging it where dense
# would OOM is a pure capability win (round 4; BASELINE.md frontier).
HEAD_STREAM_ELEMS = 2**30

# target element count of one chunk's widest activation (2**27 f32
# elements = 512 MB — the "max single alloc" of the 2M-train allocator
# study; benchmarks/probe_2m_train.py sweeps it)
HEAD_CHUNK_TARGET_ELEMS = 2**27

_EPS = 1e-3  # batch_norm_apply's default — the chain must match bitwise


def _chunk_geometry(n: int, b: int, width: int):
    """Chunk rows so one chunk's widest activation is
    ~HEAD_CHUNK_TARGET_ELEMS elements."""
    ch = max(int(HEAD_CHUNK_TARGET_ELEMS) // max(b * width, 1), 8)
    ch = min(ch, n)
    ch = max((ch // 8) * 8, 8)
    nchunks = -(-n // ch)  # ceil
    return ch, nchunks, nchunks * ch - n


def _pad_points(x, pad, value=0):
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[-2 if x.ndim >= 2 else -1] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _normalize(pre, mean, var, scale, bias):
    """The exact normalize+relu chain of `ops.norm.batch_norm_apply` /
    `models.core.conv_bn_apply` (f32 in, relu, cast back)."""
    xf = pre.astype(jnp.float32)
    y = (xf - mean) * jax.lax.rsqrt(var + _EPS) * scale + bias
    return jax.nn.relu(y).astype(pre.dtype)


def head_streamed(
    params,
    state,
    feats,
    mask,
    *,
    spec,
    cdtype,
    precision,
    bn_axis,
    pool_fn,
    rng,
    train: bool,
):
    """Streamed equivalent of the dense head in `models.dgcnn.apply`.

    Args:
      params/state: the ``head`` subtrees (``feat``/``mlp``/``out``).
      feats: the per-block feature tensors (each ``(B, N, C_i)``); the
        (B, N, sum C) concat is NEVER materialized — each chunk
        concatenates its slices (at 4M points the whole-array concat is
        a measured 6 G allocation on top of the block outputs that must
        exist anyway).
      mask: ``(B, N)`` bool validity or None.
      spec: the ModelSpec (head_factorized, global_pool, dropout,
        head_feat_dim, bn_momentum).
      pool_fn: the model's masked-max pool ``(x, mask) -> (B, C)``; the
        streamed pool hands it a (B, 1, C) local partial so context-
        parallel pools still apply their cross-shard merge + empty-event
        guard exactly as in the dense path.
      rng: dropout key or None (same contract as the dense head).

    Returns:
      ``(logits, new_head_state)`` — logits in compute dtype, caller
      casts to f32 exactly as the dense path does.
    """
    b, n = feats[0].shape[0], feats[0].shape[-2]
    ca = sum(f.shape[-1] for f in feats)
    lead = feats[0].shape[:-2]
    mom = spec.bn_momentum
    new_state = {"feat": state["feat"], "mlp": []}

    ch, nchunks, pad = _chunk_geometry(n, b, max(spec.head_feat_dim, 1))
    feats_p = [_pad_points(f, pad) for f in feats]
    mask_p = (
        jnp.ones(feats_p[0].shape[:-1], bool)
        if mask is None
        else _pad_points(mask, pad)
    )
    if mask is None and pad:
        mask_p = mask_p.at[..., n:].set(False)
    # scans carry the CHUNK INDEX, not the row start: packed slices need
    # start*C/128, and (row start)*C can overflow int32 past 32M points —
    # per-array starts are derived from the index with small multipliers
    starts = jnp.arange(nchunks)

    # LANE-PACK the resident block features: a (B, N, C<128) f32 tensor
    # held across the chunk scan gets a lane-padded layout from XLA
    # (C=64 → 2.0× "Extra memory due to padding" per buffer — the
    # measured 8M-eval OOM was six such copies, 24 G for 12 G of data).
    # Reshaping to (B, N·C/128, 128) before the scan makes the resident
    # copy lane-full; each chunk slices packed rows and reshapes back,
    # which is pure element-order-preserving data movement — outputs,
    # BN stats and gradients are BITWISE unchanged (non-overlapping
    # chunk slices, so even the cotangent scatter has no reassociation).
    _LANE = 128
    np_pad = feats_p[0].shape[-2]  # padded point count (concrete)

    def _packable(c):
        # EVAL-only: the padded resident copies appear when XLA's remat
        # compression kicks in on the eval chunk scan (measured at 8M);
        # train never showed them, and the packed cotangent path (dus
        # into packed zeros + reshape) measured a 4.7% slower 1M train
        # step — so the backward keeps the direct slices.
        return (
            not train
            and 0 < c < _LANE
            and (ch * c) % _LANE == 0
            and (np_pad * c) % _LANE == 0
        )

    def _pack(f):
        c = f.shape[-1]
        if not _packable(c):
            return f, None
        return (
            f.reshape(*f.shape[:-2], np_pad * c // _LANE, _LANE),
            c,
        )

    feats_pk = [_pack(f) for f in feats_p]
    # a varying zero derived from the data: under shard_map the scan
    # carries must hold the mesh axes' varying type from step 0, but
    # constant inits are unvarying (the same trick as the fused block's
    # idx-derived zero carry) — adding this zero scalar fixes the vma
    # without changing any value
    vz = (feats_p[0][..., :1, :1].sum() * 0.0).astype(jnp.float32)

    def vary(c):
        return jax.tree_util.tree_map(lambda t: t + vz, c)

    def chunk(x, j):
        return jax.lax.dynamic_slice_in_dim(x, j * ch, ch, axis=-2)

    def chunk_packed(fc, j):
        f, c = fc
        if c is None:
            return chunk(f, j)
        rows = ch * c // _LANE
        sl = jax.lax.dynamic_slice_in_dim(f, j * rows, rows, axis=-2)
        return sl.reshape(*sl.shape[:-2], ch, c)

    def agg_chunk(j):
        # per-chunk concat of the block features: (..., ch, sum C)
        return jnp.concatenate([chunk_packed(fc, j) for fc in feats_pk], axis=-1)

    def chunk_mask(j):
        return jax.lax.dynamic_slice_in_dim(mask_p, j * ch, ch, axis=-1)

    use_mask = mask is not None or pad > 0

    def masked_sums(pre, m):
        """Per-chunk BN partial sums, mirroring batch_norm_apply."""
        xf = pre.astype(jnp.float32)
        axes = tuple(range(xf.ndim - 1))
        if not use_mask:
            cnt = jnp.asarray(float(np.prod(xf.shape[:-1])), jnp.float32)
            return cnt, jnp.sum(xf, axis=axes), jnp.sum(jnp.square(xf), axis=axes)
        w = jnp.broadcast_to(m[..., None], xf.shape).astype(jnp.float32)
        return (
            jnp.sum(w, axis=axes),
            jnp.sum(xf * w, axis=axes),
            jnp.sum(jnp.square(xf) * w, axis=axes),
        )

    # ---------------- pooled global vector (global_pool only) ----------
    g_vec = None
    if spec.global_pool:
        fp = params["feat"]
        wf = fp["w"].astype(cdtype)
        fdim = wf.shape[-1]

        @jax.checkpoint
        def feat_sweep(carry, s):
            cnt, s1, s2, mx, mn = carry
            a_c = agg_chunk(s).astype(cdtype)
            m_c = chunk_mask(s)
            pre = jnp.einsum("...c,cd->...d", a_c, wf, precision=precision)
            if train:
                c2, a1, a2 = masked_sums(pre, m_c)
                cnt, s1, s2 = cnt + c2, s1 + a1, s2 + a2
            pf = pre.astype(jnp.float32)
            big = jnp.finfo(jnp.float32).max
            valid = m_c[..., None]
            mx = jnp.maximum(mx, jnp.max(jnp.where(valid, pf, -big), axis=-2))
            mn = jnp.minimum(mn, jnp.min(jnp.where(valid, pf, big), axis=-2))
            return (cnt, s1, s2, mx, mn), None

        big = jnp.finfo(jnp.float32).max
        z = jnp.zeros((fdim,), jnp.float32)
        carry0 = (
            jnp.zeros((), jnp.float32) if not use_mask else z,
            z,
            z,
            jnp.full((b, fdim), -big, jnp.float32),
            jnp.full((b, fdim), big, jnp.float32),
        )
        (cnt, s1, s2, mx, mn), _ = jax.lax.scan(feat_sweep, vary(carry0), starts)
        if train:
            mean, var, feat_s = finalize_batch_stats(
                cnt, s1, s2, state["feat"], momentum=mom, axis_name=bn_axis
            )
            new_state["feat"] = feat_s
        else:
            mean, var = state["feat"]["mean"], state["feat"]["var"]
        scale = fp["bn"]["scale"].astype(jnp.float32)
        bias = fp["bn"]["bias"].astype(jnp.float32)
        # selection commutes with the monotone bn+relu+cast chain: the
        # pooled max of relu(bn(pre)) is relu(bn(max-or-min of pre by
        # sign(gamma))) — identity 1 of ops.edge.edgeconv_block_reduced
        sel = jnp.where(scale >= 0, mx, mn)
        g_row = _normalize(sel.astype(cdtype), mean, var, scale, bias)
        # hand the (B, 1, C) partial to the model's pool so CP pools
        # apply their all-gather merge and all-empty-event guard
        any_valid = jnp.any(mask_p[..., :n], axis=-1, keepdims=True)
        g_vec = pool_fn(g_row[..., None, :], any_valid)

    # ---------------- MLP ladder over chunks ---------------------------
    factorized = spec.global_pool and spec.head_factorized
    mlp = list(zip(params["mlp"], state["mlp"]))
    keys = (
        list(jax.random.split(rng, len(mlp))) if rng is not None else [None] * len(mlp)
    )

    # per-event terms computed once, added per chunk (bitwise the dense
    # hf branch, which broadcasts the same (B, D) einsum result)
    g_terms = {}
    if factorized:
        w0 = mlp[0][0]["w"].astype(cdtype)
        g_terms[0] = jnp.einsum(
            "...c,cd->...d", g_vec.astype(cdtype), w0[ca:], precision=precision
        )

    def ladder(s, upto, stats):
        """Forward through mlp[0:upto] for one chunk; returns the
        pre-activation of layer ``upto`` (or the post-relu h when
        ``upto == len(mlp)``, for the output dense). ``stats`` holds the
        finalized (mean, var) per layer computed so far."""
        if spec.global_pool:
            h = agg_chunk(s).astype(cdtype)
            if not factorized:
                g = jnp.broadcast_to(
                    g_vec[..., None, :].astype(cdtype),
                    h.shape[:-1] + g_vec.shape[-1:],
                )
                h = jnp.concatenate([h, g], axis=-1)
        else:
            # no pool: the feat conv itself is layer -1 of the ladder
            a_c = agg_chunk(s).astype(cdtype)
            pre = jnp.einsum(
                "...c,cd->...d",
                a_c,
                params["feat"]["w"].astype(cdtype),
                precision=precision,
            )
            fmean, fvar = stats["feat"]
            h = _normalize(
                pre,
                fmean,
                fvar,
                params["feat"]["bn"]["scale"].astype(jnp.float32),
                params["feat"]["bn"]["bias"].astype(jnp.float32),
            )
        for li in range(upto):
            p_l, _ = mlp[li]
            w = p_l["w"].astype(cdtype)
            if li == 0 and factorized:
                pre = (
                    jnp.einsum("...c,cd->...d", h, w[:ca], precision=precision)
                    + g_terms[0][..., None, :]
                )
            else:
                pre = jnp.einsum("...c,cd->...d", h, w, precision=precision)
            lmean, lvar = stats[li]
            h = _normalize(
                pre,
                lmean,
                lvar,
                p_l["bn"]["scale"].astype(jnp.float32),
                p_l["bn"]["bias"].astype(jnp.float32),
            )
            if train and spec.dropout > 0.0 and keys[li] is not None:
                kc = jax.random.fold_in(keys[li], s)
                keep = 1.0 - spec.dropout
                dm = jax.random.bernoulli(kc, keep, h.shape)
                h = jnp.where(dm, h / keep, 0.0)
        return h

    stats = {}
    if not spec.global_pool:
        # stats sweep for the feat conv (its pre-activation ladder depth 0)
        if train:
            wf = params["feat"]["w"].astype(cdtype)

            @jax.checkpoint
            def fsweep(carry, s):
                cnt, s1, s2 = carry
                pre = jnp.einsum(
                    "...c,cd->...d",
                    agg_chunk(s).astype(cdtype),
                    wf,
                    precision=precision,
                )
                c2, a1, a2 = masked_sums(pre, chunk_mask(s))
                return (cnt + c2, s1 + a1, s2 + a2), None

            fdim = params["feat"]["w"].shape[-1]
            z = jnp.zeros((fdim,), jnp.float32)
            c0 = (jnp.zeros((), jnp.float32) if not use_mask else z, z, z)
            (cnt, s1, s2), _ = jax.lax.scan(fsweep, vary(c0), starts)
            fmean, fvar, feat_s = finalize_batch_stats(
                cnt, s1, s2, state["feat"], momentum=mom, axis_name=bn_axis
            )
            new_state["feat"] = feat_s
        else:
            fmean, fvar = state["feat"]["mean"], state["feat"]["var"]
        stats["feat"] = (fmean, fvar)

    for li, (p_l, s_l) in enumerate(mlp):
        if train:
            dim = p_l["w"].shape[-1]

            @jax.checkpoint
            def stats_sweep(carry, s, li=li):
                cnt, s1, s2 = carry
                h = ladder(s, li, stats)
                w = p_l["w"].astype(cdtype)
                if li == 0 and factorized:
                    pre = (
                        jnp.einsum("...c,cd->...d", h, w[:ca], precision=precision)
                        + g_terms[0][..., None, :]
                    )
                else:
                    pre = jnp.einsum("...c,cd->...d", h, w, precision=precision)
                c2, a1, a2 = masked_sums(pre, chunk_mask(s))
                return (cnt + c2, s1 + a1, s2 + a2), None

            z = jnp.zeros((dim,), jnp.float32)
            c0 = (jnp.zeros((), jnp.float32) if not use_mask else z, z, z)
            (cnt, s1, s2), _ = jax.lax.scan(stats_sweep, vary(c0), starts)
            lmean, lvar, s_new = finalize_batch_stats(
                cnt, s1, s2, s_l, momentum=mom, axis_name=bn_axis
            )
            new_state["mlp"].append(s_new)
        else:
            lmean, lvar = s_l["mean"], s_l["var"]
            new_state["mlp"].append(s_l)
        stats[li] = (lmean, lvar)

    # ---------------- final sweep: logits -------------------------------
    wo = params["out"]["w"].astype(cdtype)
    bo = params["out"].get("b")

    @jax.checkpoint
    def logits_sweep(_, s):
        h = ladder(s, len(mlp), stats)
        y = jnp.einsum("...c,cd->...d", h, wo, precision=precision)
        if bo is not None:
            y = y + bo.astype(y.dtype)
        return (), y

    _, logits = jax.lax.scan(logits_sweep, (), starts)
    # (nchunks, B, ch, nc) -> (B, nchunks*ch, nc) -> drop padding
    logits = jnp.moveaxis(logits, 0, -3).reshape(
        lead + (nchunks * ch, logits.shape[-1])
    )
    return logits[..., :n, :], new_state
