#!/usr/bin/env python
"""Per-round TPU health gate: kernel exactness + serving + convergence.

VERDICT r2 #2: bit-exactness on real hardware was a benchmark claim, not
a per-round gate — a Mosaic upgrade could silently break tie order and
nothing would catch it. This script runs on the real chip in minutes and
emits ONE JSON line; commit it as TPU_GATE_r{N}.json each round (ritual
in CLAUDE.md, next to bench.py).

Legs:
  knn      fused Pallas kNN vs the f32 oracle at 16k (full-index sweep,
           masks + duplicate points; expect 0 mismatches; near-ties are
           reported AND bounded at <=1e-4 of slots)
  samescore  fused Pallas kNN vs a jnp reference computing the SAME
           single-contraction score over the shared augmented operands
           (lax.top_k tie rule) — ZERO tolerance, ties included: a merge
           bug hiding in the near-tie class fails here
  banded   banded Pallas kNN (--knn_window) vs the banded jnp oracle at
           4k, window n/4 (same sweep + near-tie split; expect 0), plus
           the halo-cross form (banded CP's local scorer: nonzero
           q_base/key_base offsets) on a mid-event shard (expect 0)
  rdma     ring_knn_rdma Mosaic-compiled at the largest local D vs the
           global oracle (expect 0)
  export   export -> deserialize -> serve round-trip vs live eval-mode
           inference, for BOTH head forms (default concat and the
           model-defining --head_factorized opt-in; expect bitwise 0
           diff each)
  headstream  streamed head (models/head.py — the 2M/4M serving path)
           vs the dense head, eval mode (expect bitwise 0 diff on TPU;
           the CPU smoke gates on <=1e-5 — CPU dots block K differently
           inside scans)
  scanchunk  the >=2M-row train levers, three comparisons: (a)
           scanned+N-chunked scatter vs scanned unchunked, train mode
           — BITWISE (the chunk is a row partition, no cross-chunk
           reassociation); (b) unrolled/unchunked vs scanned+chunked
           in EVAL mode (identical graphs + pool winners; pure
           backward reassociation, <= 1e-2); (c) the train-mode
           dynamic-graph composition REPORTED only — BN-stat noise
           flips near-tie kNN/pool selections discretely (0.296
           max-rel on TPU is legitimate; contract = convergence pin)
  conv     30-step convergence smoke on the flagship model (loss must
           drop by >30%)

Env knobs (for the CPU CI smoke): GATE_N, GATE_RING_N, GATE_CONV_STEPS,
GATE_CONV_N.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

GATE_N = int(os.environ.get("GATE_N", 16384))
GATE_RING_N = int(os.environ.get("GATE_RING_N", 2048))
GATE_CONV_STEPS = int(os.environ.get("GATE_CONV_STEPS", 30))
GATE_CONV_N = int(os.environ.get("GATE_CONV_N", 4096))


def leg_knn():
    """Fused kNN vs f32 oracle: full-index sweep with masks + dup ties.

    The kernel's single-contraction score (2<x,y> - |y|^2) and the
    oracle's assembled distance are algebraically equal but can round
    1-ulp near-ties in opposite orders (measured: ~1e-5 of slots on
    random data, rel distance diff ~8e-8 — see BASELINE.md). The gate
    therefore splits disagreements: near-ties (f64 relative distance
    diff <= 1e-6) are reported but allowed; anything else is a HARD
    mismatch and fails the gate.
    """
    from dgcnn_tpu.kernels.knn_pallas import knn_pallas
    from dgcnn_tpu.ops.knn import knn_indices

    n, c, k = GATE_N, 64, 20
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, n, c)).astype(np.float32)
    x[:, n // 2] = x[:, 1]  # exact duplicate -> tie order must match
    x[:, n - 5] = x[:, 1]
    mask = np.ones((1, n), bool)
    mask[:, -n // 64 :] = False
    xj, mj = jnp.asarray(x), jnp.asarray(mask)
    idx_p, val_p = jax.jit(
        lambda x, m: knn_pallas(x, k, m, precision=jax.lax.Precision.HIGHEST)
    )(xj, mj)
    idx_o, val_o = jax.jit(
        lambda x, m: knn_indices(x, k, m, precision=jax.lax.Precision.HIGHEST)
    )(xj, mj)
    hard, near = _split_mismatches(x, idx_p, idx_o, val_p, val_o)
    return {
        "knn_mismatches": hard,
        "knn_near_ties": near,
        "knn_total": int(idx_p.size),
    }


def leg_knn_samescore():
    """Zero-tolerance leg: kernel vs a jnp reference computing the SAME
    single-contraction score — 0 disagreements INCLUDING ties.

    The oracle leg's near-tie allowance exists because the kernel's score
    (2<x,y> - |y|^2, one contraction over the augmented operands) and the
    oracle's assembled distance can round 1-ulp ties oppositely — which
    means a merge bug whose damage lands exclusively on near-tie pairs
    would stay green there (VERDICT r3 weak #4). This leg closes that
    hole: the reference builds the IDENTICAL augmented operands through
    `build_augmented_operands` (the single shared score-defining
    constructor), contracts them with one HIGHEST-precision dot, and
    ranks with `lax.top_k` (value desc, index asc — the kernel's tie
    rule). Same per-element score expression -> the comparison is exact:
    any disagreement at all fails the gate.
    """
    from dgcnn_tpu.kernels.knn_pallas import (
        build_augmented_operands,
        knn_pallas,
    )

    n, c, k = GATE_N, 64, 20
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, n, c)).astype(np.float32)
    x[:, n // 2] = x[:, 1]  # duplicate ties must agree exactly
    x[:, n - 5] = x[:, 1]
    x[:, n // 3] = x[:, 7]
    mask = np.ones((1, n), bool)
    mask[:, -n // 64 :] = False
    xj, mj = jnp.asarray(x), jnp.asarray(mask)
    idx_p, valid_p = jax.jit(
        lambda x, m: knn_pallas(x, k, m, precision=jax.lax.Precision.HIGHEST)
    )(xj, mj)

    def reference(xq, m):
        qa, ka, _, _, _ = build_augmented_operands(
            xq, xq, m, block_q=256, block_t=1024, key_layout="narrow_t"
        )
        c2p = ka.shape[1]
        scores = jax.lax.dot_general(
            qa[:, :, :c2p],
            ka,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (B, nq_pad, nk_pad)
        vals, idx = jax.lax.top_k(scores[:, :n], k)
        valid = vals > -1e29
        self_idx = jnp.arange(n, dtype=jnp.int32)[None, :, None]
        idx = jnp.where(valid, idx.astype(jnp.int32), self_idx)
        return idx, valid

    idx_r, valid_r = jax.jit(reference)(xj, mj)
    return {
        "knn_samescore_disagreements": int(
            np.sum(np.asarray(idx_p) != np.asarray(idx_r))
            + np.sum(np.asarray(valid_p) != np.asarray(valid_r))
        ),
        "knn_samescore_total": int(idx_p.size),
    }


def _split_mismatches(x, idx_a, idx_b, val_a, val_b, rtol=1e-6, q_off=0):
    """(hard, near): disagreements whose f64 distances differ beyond /
    within rtol — near-ties are legitimate 1-ulp expression skew. Any
    validity-flag disagreement is HARD regardless of distances (a slot
    with equal indices but flipped valid would otherwise compare its
    distance against itself and always pass as a near-tie).

    ``q_off``: global position of query row 0 when the idx arrays cover
    only a shard of ``x`` (the halo-cross leg)."""
    va, vb = np.asarray(val_a), np.asarray(val_b)
    ia, ib = np.asarray(idx_a), np.asarray(idx_b)
    hard = int(np.sum(va != vb))
    near = 0
    for b, i, s in np.argwhere((ia != ib) & (va == vb)):
        xi = x[b, q_off + i].astype(np.float64)
        da = float(np.sum((xi - x[b, ia[b, i, s]].astype(np.float64)) ** 2))
        db = float(np.sum((xi - x[b, ib[b, i, s]].astype(np.float64)) ** 2))
        if abs(da - db) <= rtol * max(da, db, 1e-12):
            near += 1
        else:
            hard += 1
    return hard, near


def leg_knn_banded():
    """Banded Pallas kNN vs the banded jnp oracle (same near-tie split).

    Runs at GATE_N // 4 with window GATE_N // 16: the banded oracle's
    blocked dynamic-slice + top_k form compiles slowly at 16k through
    the remote TPU compiler, and a 4k sweep already exercises every
    kernel feature (dynamic tile bounds, per-row band mask, SMEM nvalid,
    masked suffix, duplicate ties)."""
    from dgcnn_tpu.kernels.knn_banded import knn_pallas_banded
    from dgcnn_tpu.ops.knn import banded_knn_indices
    from dgcnn_tpu.ops.sfc import morton_order

    n, c, k = max(GATE_N // 4, 512), 64, 20
    w = max(n // 4, 128)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, n, c)).astype(np.float32)
    x[:, n // 2] = x[:, 1]  # duplicates -> tie order must match
    x[:, n - 5] = x[:, 1]
    mask = np.ones((1, n), bool)
    mask[:, -n // 64 :] = False
    xj, mj = jnp.asarray(x), jnp.asarray(mask)
    order, _ = morton_order(xj, mj)
    xs = jnp.take_along_axis(xj, order[..., None], axis=-2)
    ms = jnp.take_along_axis(mj, order, axis=-1)
    idx_p, val_p = jax.jit(
        lambda x, m: knn_pallas_banded(
            x, k, m, window=w, precision=jax.lax.Precision.HIGHEST
        )
    )(xs, ms)
    idx_o, val_o = jax.jit(
        lambda x, m: banded_knn_indices(
            x, k, m, window=w, precision=jax.lax.Precision.HIGHEST
        )
    )(xs, ms)
    hard, near = _split_mismatches(
        np.asarray(xs), idx_p, idx_o, val_p, val_o
    )
    out = {
        "banded_n": n,
        "banded_window": w,
        "banded_mismatches": hard,
        "banded_near_ties": near,
        "banded_total": int(idx_p.size),
    }

    # halo-cross form (banded CP's local scorer): same kernel with
    # nonzero q_base/key_base SMEM offsets — 'shard' 1 of 4 with W-row
    # halos sliced from the same sorted event; valid rows must match the
    # oracle's rows (padded-row self-edge contract differs by design)
    from dgcnn_tpu.kernels.knn_banded import knn_pallas_banded_cross

    d, off = 4, n // 4
    nl = n // d
    nv = jnp.sum(ms, axis=-1).astype(jnp.int32)
    idx_c, val_c = knn_pallas_banded_cross(
        xs[:, off : off + nl],
        xs[:, off - w : off + nl + w],
        k,
        ms[:, off - w : off + nl + w],
        window=w, q_base=off, key_base=off - w, nvalid=nv,
        precision=jax.lax.Precision.HIGHEST,
    )
    mrow = np.asarray(ms[:, off : off + nl])
    keep = mrow[..., None] & np.ones((1, 1, k), bool)
    hard_c, near_c = _split_mismatches(
        np.asarray(xs),
        np.where(keep, np.asarray(idx_c), np.asarray(idx_o[:, off : off + nl])),
        np.asarray(idx_o[:, off : off + nl]),
        np.where(keep, np.asarray(val_c), np.asarray(val_o[:, off : off + nl])),
        np.asarray(val_o[:, off : off + nl]),
        q_off=off,
    )
    out.update(
        {"banded_cross_mismatches": hard_c, "banded_cross_near_ties": near_c}
    )

    # zero-trip-guard case ON HARDWARE: batch a second event whose few
    # valid points all sort before this shard, so ITS chunks claim
    # windows entirely left of the key array (t_end <= t0*block_t — the
    # kernel must still run one banded-out tile pass to drain the
    # pre-started DMA). The FIRST event's rows, produced by the same
    # kernel instance's subsequent grid steps, must stay bitwise the
    # oracle — a dangling DMA semaphore would corrupt them
    # nondeterministically.
    nv_tiny = n // 64
    ms2 = jnp.concatenate(
        [ms, jnp.asarray(np.arange(n)[None, :] < nv_tiny)], axis=0
    )
    xs2 = jnp.concatenate([xs, xs], axis=0)
    nv2 = jnp.sum(ms2, axis=-1).astype(jnp.int32)
    off2 = 2 * nl
    idx_z, val_z = knn_pallas_banded_cross(
        xs2[:, off2 : off2 + nl],
        xs2[:, off2 - w : off2 + nl + w],
        k,
        ms2[:, off2 - w : off2 + nl + w],
        window=w, q_base=off2, key_base=off2 - w, nvalid=nv2,
        precision=jax.lax.Precision.HIGHEST,
    )
    mrow0 = np.asarray(ms[:, off2 : off2 + nl])  # event 0 only
    hard_z, near_z = _split_mismatches(
        np.asarray(xs),
        np.where(
            mrow0[..., None], np.asarray(idx_z[:1]),
            np.asarray(idx_o[:, off2 : off2 + nl]),
        ),
        np.asarray(idx_o[:, off2 : off2 + nl]),
        np.where(
            mrow0[..., None], np.asarray(val_z[:1]),
            np.asarray(val_o[:, off2 : off2 + nl]),
        ),
        np.asarray(val_o[:, off2 : off2 + nl]),
        q_off=off2,
    )
    # the all-padded event's shard rows must all be flagged invalid
    # (every candidate banded out -> -inf -> self-edge fallback)
    zerotrip_valid_leak = int(np.asarray(val_z[1]).sum())
    out.update({
        "banded_zerotrip_mismatches": hard_z,
        "banded_zerotrip_near_ties": near_z,
        "banded_zerotrip_valid_leak": zerotrip_valid_leak,
    })
    return out


def leg_rdma():
    """RDMA ring kernel (Mosaic-compiled on TPU; interpreted on CPU) vs
    the global oracle at the largest local ring size."""
    from jax.sharding import Mesh, PartitionSpec as P

    from dgcnn_tpu.kernels.ring_knn_rdma import ring_knn_rdma
    from dgcnn_tpu.ops.knn import pairwise_sq_dists

    b, n, c, k = 1, GATE_RING_N, 64, 20
    rng = np.random.default_rng(1)
    x = rng.normal(size=(b, n, c)).astype(np.float32)
    x[:, n // 3] = x[:, 2]
    mask = np.ones((b, n), bool)
    mask[:, -31:] = False
    d = next(
        dd for dd in (4, 2, 1) if dd <= len(jax.devices()) and n % dd == 0
    )
    mesh = Mesh(np.array(jax.devices())[:d], ("points",))
    f = jax.shard_map(
        lambda xs, ms: ring_knn_rdma(xs, k, ms, axis_name="points"),
        mesh=mesh,
        in_specs=(P(None, "points"), P(None, "points")),
        out_specs=(P(None, "points"), P(None, "points")),
        check_vma=False,
    )
    idx, valid = jax.jit(f)(x, mask)
    xj = jnp.asarray(x)
    sc = jnp.sum(jnp.square(xj), -1)[..., :, None] - pairwise_sq_dists(
        xj, precision=jax.lax.Precision.HIGHEST
    )
    sc = jnp.where(jnp.asarray(mask)[:, None, :], sc, -1e30)
    ov, oi = jax.lax.top_k(sc, k)
    ovalid = ov > -1e29
    self_i = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[None, :, None], oi.shape
    )
    oi = jnp.where(ovalid, oi, self_i).astype(jnp.int32)
    hard, near = _split_mismatches(x, idx, oi, valid, ovalid)
    return {
        "rdma_devices": d,
        # honesty flag: with d == 1 the kernel Mosaic-compiles and its
        # merge/protocol run, but no remote DMA crosses ICI — a 1-chip
        # host cannot certify the inter-chip path (multi-device coverage
        # is interpret-mode via tests/test_ring_rdma.py)
        "rdma_ici_exercised": d > 1,
        "rdma_mismatches": hard,
        "rdma_near_ties": near,
    }


def leg_export(tmpdir):
    """Export -> deserialize -> serve must match live eval inference.

    HIGHEST matmul precision (the serving-parity configuration
    tests/test_export.py pins at atol 1e-5): under DEFAULT precision the
    live and deserialized executables can legitimately differ at ~1e-2
    (different fusion -> different bf16 matmul roundings).

    Runs BOTH head forms: the default concat head and the model-defining
    `--head_factorized` opt-in — each round-trip must match its own live
    apply, so a Mosaic/XLA upgrade breaking the factorized contraction
    path shows up here, not in production serving."""
    import types

    from dgcnn_tpu.config import Config
    from dgcnn_tpu.models import get_model
    from dgcnn_tpu.train.export import export_model, load_exported

    n = min(GATE_CONV_N, 2048)
    out = {}
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.normal(size=(1, n, 4)).astype(np.float32))
    mask = jnp.asarray(rng.random((1, n)) > 0.1)
    for tag, hf in (("export", False), ("export_hf", True)):
        cfg = Config(
            model_name="residual-dgcnn", num_class=2, kvalue=20,
            edge_filters=(64,) * 6, num_point=n, use_pallas=False,
            precision="highest", head_factorized=hf,
        )
        model = get_model(
            cfg.model_name, cfg.model_spec(),
            precision=jax.lax.Precision.HIGHEST,
        )
        params, mstate = model.init(jax.random.PRNGKey(7), 4)
        live = jax.jit(
            lambda p, s, x, m, model=model: jax.nn.softmax(
                model.apply(p, s, x, m, train=False)[0], axis=-1
            )
        )(params, mstate, pts, mask)
        state = types.SimpleNamespace(params=params, model_state=mstate)
        blob = export_model(cfg, state, in_dim=4, batch=1)
        served = load_exported(blob)(pts, mask)
        out[f"{tag}_max_abs_diff"] = float(jnp.max(jnp.abs(served - live)))
        if not hf:
            out["export_bytes"] = len(blob)
            # shape-polymorphic artifact (`export -mb 0`): the symbolic
            # batch dim must trace (round 3 regressed this via int(dim)
            # in the streamed-head threshold — VERDICT r3 weak #1) and
            # serve an unseen batch size matching live eval
            blob_poly = export_model(cfg, state, in_dim=4, batch=0)
            pts2 = jnp.concatenate([pts, pts * 0.5], axis=0)
            mask2 = jnp.concatenate([mask, mask], axis=0)
            live2 = jax.jit(
                lambda p, s, x, m, model=model: jax.nn.softmax(
                    model.apply(p, s, x, m, train=False)[0], axis=-1
                )
            )(params, mstate, pts2, mask2)
            served2 = load_exported(blob_poly)(pts2, mask2)
            out["export_poly_max_abs_diff"] = float(
                jnp.max(jnp.abs(served2 - live2))
            )
    return out


def leg_head_stream():
    """Streamed head vs dense head: EVAL must be bitwise on hardware.

    The streamed head is the 2M-serving/4M-serving path (models/head.py);
    its contract is bitwise-eval vs the dense head (chunked row-
    independent matmuls + the exact normalize chain + max-monoid pool
    decomposition). A compiler upgrade changing M-tiling rounding would
    surface here. Forced on via the user-facing knob
    (ModelSpec.head_stream='on' / --head_stream on)."""
    import dataclasses

    from dgcnn_tpu.models import ModelSpec, get_model

    n = GATE_CONV_N
    spec = ModelSpec(
        num_class=2, k=20, edge_filters=(64,) * 6, head_feat_dim=1024,
        head_mlp=(512, 256), global_pool=True, head_factorized=True,
    )
    model = get_model("residual-dgcnn", spec)
    model_s = get_model(
        "residual-dgcnn", dataclasses.replace(spec, head_stream="on")
    )
    params, state = model.init(jax.random.PRNGKey(5), 4)
    rng = np.random.default_rng(11)
    pts = jnp.asarray(rng.normal(size=(1, n, 4)).astype(np.float32))
    mask = jnp.asarray(rng.random((1, n)) > 0.1)
    y_dense = np.asarray(
        jax.jit(lambda p, s, x, m: model.apply(p, s, x, m, train=False)[0])(
            params, state, pts, mask
        )
    )
    y_stream = np.asarray(
        jax.jit(
            lambda p, s, x, m: model_s.apply(p, s, x, m, train=False)[0]
        )(params, state, pts, mask)
    )
    return {
        "headstream_mismatches": int((y_dense != y_stream).sum()),
        "headstream_total": int(y_dense.size),
        "headstream_max_abs_diff": float(np.abs(y_dense - y_stream).max()),
    }


def leg_block_scan():
    """Scanned EdgeConv stack (--block_scan on) vs the unrolled loop:
    EVAL must be bitwise on hardware.

    The scan is the >=2M-row train regime's allocator lever (one
    while-body reused across blocks instead of six unrolled backwards —
    BASELINE.md 2M closure); its contract is that the body runs the
    exact same per-block ops, so eval logits are bitwise the unrolled
    stack's. A compiler upgrade fusing the scan body differently in
    EVAL would surface here."""
    import dataclasses

    from dgcnn_tpu.models import ModelSpec, get_model

    n = GATE_CONV_N
    spec = ModelSpec(
        num_class=2, k=20, edge_filters=(64,) * 6, head_feat_dim=1024,
        head_mlp=(512, 256), global_pool=True,
    )
    model_u = get_model(
        "residual-dgcnn", dataclasses.replace(spec, block_scan="off")
    )
    model_s = get_model(
        "residual-dgcnn", dataclasses.replace(spec, block_scan="on")
    )
    params, state = model_u.init(jax.random.PRNGKey(7), 4)
    rng = np.random.default_rng(13)
    pts = jnp.asarray(rng.normal(size=(1, n, 4)).astype(np.float32))
    mask = jnp.asarray(rng.random((1, n)) > 0.1)
    y_u = np.asarray(
        jax.jit(lambda p, s, x, m: model_u.apply(p, s, x, m, train=False)[0])(
            params, state, pts, mask
        )
    )
    y_s = np.asarray(
        jax.jit(lambda p, s, x, m: model_s.apply(p, s, x, m, train=False)[0])(
            params, state, pts, mask
        )
    )
    return {
        "blockscan_mismatches": int((y_u != y_s).sum()),
        "blockscan_total": int(y_u.size),
        "blockscan_max_abs_diff": float(np.abs(y_u - y_s).max()),
    }


def leg_scan_chunk_grad():
    """Train-path gate for the >=2M-row levers (VERDICT r4 #2), split
    into the comparisons that are actually well-posed (round-5 finding):

    (a) CHUNK lever — scanned + N-chunked fused-backward scatter
        (ops.edge.SCATTER_CHUNK_ROWS forced to rows/4; production
        engagement is 1.5M rows, unreachable in a minutes-long gate)
        vs the same scanned form unchunked: gated BITWISE. The chunk is
        a row partition of the scatter destination — every row's adds
        happen inside exactly one chunk, so there is NO cross-chunk
        reassociation (measured exactly 0.0 on CPU and TPU; the
        300-step TPU convergence pin is bitwise-identical too).
    (b) SCAN+CHUNK lever in EVAL mode — unrolled/unchunked vs
        scanned+chunked grads of an eval-mode loss. The eval forward is
        BITWISE between the arms (the blockscan leg pins it), so both
        arms see identical kNN graphs and identical pool winners; the
        residual difference is pure backward reduction reassociation
        between the scanned and unrolled program shapes (measured
        9.7e-4 max-rel on TPU). A real scan/chunk break (wrong run
        grouping, carry misalignment, stacked-param grad transpose,
        chunk offset) lands at O(1); gated at 1e-2.
    (c) The full TRAIN-mode dynamic-graph composition is REPORTED, not
        gated on a numeric line: train-mode BN batch-stat reassociation
        perturbs features at the ulp level and near-tie kNN selections
        AND max-pool winners flip DISCRETELY, so the two arms
        legitimately train on slightly different graphs (measured 0.296
        max-rel on TPU at knn_every=1, and still 1.1e-2 with the graph
        pinned via knn_every>depth — winner flips remain; CPU: 6.7e-4 /
        3.3e-4). Same mechanism class as the documented kernel
        near-ties. Its accuracy contract is the 300-step convergence
        pin (in-band, BASELINE.md), not per-step gradient equality —
        the original single-number form of this leg gated (c) at 1e-3
        and could never pass on hardware."""
    import dataclasses

    import dgcnn_tpu.ops.edge as edge_mod
    from dgcnn_tpu.models import ModelSpec, get_model

    n, b = GATE_CONV_N, 2
    spec = ModelSpec(
        num_class=2, k=20, edge_filters=(64,) * 6, head_feat_dim=1024,
        head_mlp=(512, 256), global_pool=True, remat=True,
        knn_window=max(n // 4, 128),
    )
    rng = np.random.default_rng(19)
    pts = jnp.asarray(rng.normal(size=(b, n, 4)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, n)) > 0.1)

    def grads(block_scan, chunk_rows=None, train=True):
        sp = dataclasses.replace(spec, block_scan=block_scan)
        model = get_model("residual-dgcnn", sp)
        # same seed -> identical params/state across arms (block_scan
        # does not change the param tree)
        params, state = model.init(jax.random.PRNGKey(17), 4)

        def loss_fn(p):
            logits, _ = model.apply(p, state, pts, mask, train=train)
            return jnp.mean(jnp.square(logits))

        orig = edge_mod.SCATTER_CHUNK_ROWS
        if chunk_rows is not None:
            edge_mod.SCATTER_CHUNK_ROWS = chunk_rows
        try:
            g = jax.jit(jax.grad(loss_fn))(params)
            g = jax.tree_util.tree_map(np.asarray, g)
        finally:
            edge_mod.SCATTER_CHUNK_ROWS = orig
        return g

    def max_rel(ga, gb):
        # one global scale: per-leaf ratios explode on near-zero leaves
        # (e.g. a proj bias grad at 1e-9 under reassociation noise),
        # while any real break corrupts the O(0.1) weight grads
        err = scale = 0.0
        for a, b_ in zip(
            jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)
        ):
            a, b_ = np.asarray(a, np.float64), np.asarray(b_, np.float64)
            err = max(err, float(np.abs(a - b_).max()))
            scale = max(scale, float(np.abs(a).max()))
        return err / (scale + 1e-12)

    orig = edge_mod.SCATTER_CHUNK_ROWS
    edge_mod.SCATTER_CHUNK_ROWS = (b * n) // 4  # -> n_chunks == 4
    try:
        n_chunks = edge_mod._resolve_scatter_chunks(b, n)
    finally:
        edge_mod.SCATTER_CHUNK_ROWS = orig
    g_s = grads("on")
    g_sc = grads("on", chunk_rows=(b * n) // 4)
    g_u = grads("off")
    g_u_ev = grads("off", train=False)
    g_sc_ev = grads("on", chunk_rows=(b * n) // 4, train=False)
    return {
        "scanchunk_chunk_max_rel_diff": max_rel(g_s, g_sc),  # (a) bitwise
        "scanchunk_eval_max_rel_diff": max_rel(g_u_ev, g_sc_ev),  # (b)
        "scanchunk_dynamicgraph_max_rel_diff": max_rel(g_u, g_sc),  # (c)
        "scanchunk_chunks": n_chunks,
    }


def leg_convergence():
    """30-step flagship smoke: loss must drop by >30%."""
    from dgcnn_tpu.config import Config
    from dgcnn_tpu.io import BucketBatcher, SyntheticIO
    from dgcnn_tpu.parallel.mesh import make_mesh
    from dgcnn_tpu.train import Trainval

    n, b = GATE_CONV_N, 2
    cfg = Config(
        model_name="residual-dgcnn", num_class=2, kvalue=20,
        edge_filters=(64,) * 6, minibatch_size=b, num_point=n,
        use_pallas=jax.default_backend() not in ("cpu",),
        learning_rate=1e-3,
    )
    tv = Trainval(cfg, mesh=make_mesh(1))
    state = tv.initialize(4)
    io = SyntheticIO(
        num_events=b, num_point=n, seed=0, variable_length=False
    ).initialize()
    batch = next(BucketBatcher(io, b, num_point=n, shuffle=False).epoch())
    losses = []
    for _ in range(GATE_CONV_STEPS):
        state, m = tv.train_step(state, batch)
        losses.append(float(m["loss"]))
    return {
        "conv_steps": GATE_CONV_STEPS,
        "conv_loss_start": round(losses[0], 4),
        "conv_loss_end": round(losses[-1], 4),
    }


def main():
    import tempfile

    out = {"backend": jax.default_backend(), "n": GATE_N}
    with tempfile.TemporaryDirectory() as td:
        out.update(leg_knn())
        out.update(leg_knn_samescore())
        out.update(leg_knn_banded())
        out.update(leg_rdma())
        out.update(leg_export(td))
        out.update(leg_head_stream())
        out.update(leg_block_scan())
        out.update(leg_scan_chunk_grad())
        out.update(leg_convergence())
    # near-tie allowance is BOUNDED (VERDICT r3 weak #4): the legitimate
    # 1-ulp expression-skew class measures ~1e-5 of slots on random data;
    # 1e-4 of slots is the ceiling before green means "hiding a bug"
    near_tie_ok = all(
        out[f"{leg}_near_ties"] <= max(1e-4 * out[f"{tot}_total"], 4)
        for leg, tot in (
            ("knn", "knn"),
            ("rdma", "knn"),
            ("banded", "banded"),
            ("banded_cross", "banded"),
            ("banded_zerotrip", "banded"),
        )
    )
    out["ok"] = bool(
        out["knn_mismatches"] == 0
        and out["knn_samescore_disagreements"] == 0
        and near_tie_ok
        and out["banded_mismatches"] == 0
        and out["banded_cross_mismatches"] == 0
        and out["banded_zerotrip_mismatches"] == 0
        and out["banded_zerotrip_valid_leak"] == 0
        and out["rdma_mismatches"] == 0
        and out["export_max_abs_diff"] <= 1e-5
        and out["export_hf_max_abs_diff"] <= 1e-5
        and out["export_poly_max_abs_diff"] <= 1e-5
        # bitwise is a TPU-hardware contract (MXU accumulation is
        # deterministic per tile shape — measured 0/524288 at 256k); the
        # CPU backend's dot blocks K differently inside scans, so the
        # CPU smoke gates on tolerance instead
        and (
            out["headstream_mismatches"] == 0
            if out["backend"] != "cpu"
            else out["headstream_max_abs_diff"] <= 1e-5
        )
        and (
            out["blockscan_mismatches"] == 0
            if out["backend"] != "cpu"
            else out["blockscan_max_abs_diff"] <= 1e-5
        )
        # (a) the chunk is a row partition of the scatter destination —
        # no cross-chunk reassociation exists; bitwise (0.0 CPU + TPU)
        and out["scanchunk_chunk_max_rel_diff"] == 0.0
        # (b) eval-mode composition: identical graphs/winners, pure
        # backward reassociation measured 9.7e-4 TPU; a break is O(1)
        and out["scanchunk_eval_max_rel_diff"] <= 1e-2
        and out["scanchunk_chunks"] >= 2
        and out["conv_loss_end"] < 0.7 * out["conv_loss_start"]
    )
    print(json.dumps(out), flush=True)
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
