"""Context parallelism: DGCNN over events whose points are sharded.

Glue between the ring primitives (`kernels.ring_knn`) and the model: the
graph ops a point-sharded `make_model` needs. The reference has no
analog — it caps events at NUM_POINT on one device [H per SURVEY.md §5];
this is the rebuild's path to 100k+-point events (BASELINE config 5):
every EdgeConv's dynamic graph build ring-passes point blocks over ICI
(`ppermute`), the neighbor gather becomes a ring halo exchange, and the
global max pool finishes with a `pmax` over the ``points`` axis.

Use with `models.make_model`:

    ops = cp_graph_ops(precision=...)
    model = make_model(spec, knn_fn=ops.knn, gather_fn=ops.gather,
                       pool_fn=ops.pool)

inside a `shard_map` whose in/out specs shard the point axis on
`POINT_AXIS` (Trainval wires this up when ``point_shards > 1``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from dgcnn_tpu.kernels.ring_knn import ring_gather, ring_knn
from dgcnn_tpu.parallel.mesh import POINT_AXIS


class GraphOps(NamedTuple):
    knn: Callable
    gather: Callable
    pool: Callable
    # optional decomposition of `gather` into *exchange once, gather
    # locally*: ``extend(values) -> values_ext`` (differentiable) and
    # ``localize(idx) -> rows into values_ext``. When present, the fused
    # EdgeConv block's local-gather custom VJP (O(N·C) backward memory)
    # applies under this parallelism; None means only whole-gather AD
    # paths work (the exact ring, whose neighbors can live anywhere).
    extend: Callable | None = None
    localize: Callable | None = None


def cp_masked_max_pool(x, mask, axis_name: str = POINT_AXIS):
    """Masked max over the (sharded) point axis → replicated (B, C).

    Uses all_gather + max instead of `pmax` because pmax has no
    differentiation rule; the gathered tensor is only (shards, B, C).
    """
    neg = jnp.finfo(x.dtype).min
    if mask is None:
        local = jnp.max(x, axis=-2)
        return jnp.max(jax.lax.all_gather(local, axis_name, axis=0), axis=0)
    local = jnp.max(jnp.where(mask[..., None], x, neg), axis=-2)
    g = jnp.max(jax.lax.all_gather(local, axis_name, axis=0), axis=0)
    any_valid = (
        jax.lax.psum(jnp.sum(mask.astype(x.dtype), axis=-1), axis_name) > 0
    )
    return jnp.where(any_valid[..., None], g, 0.0)


def _masked_max_pool_for(axis_name: str):
    """Bind `cp_masked_max_pool` to an axis and TAG it as a masked-max
    pool: the streamed head (models.head) may then chunk-decompose the
    pool into a local running max + this fn on the (B, 1, C) partial."""
    f = lambda x, mask: cp_masked_max_pool(x, mask, axis_name)  # noqa: E731
    f.is_masked_max = True
    return f


def cp_graph_ops(
    axis_name: str = POINT_AXIS,
    precision=None,
    use_pallas: bool | None = None,
    impl: str = "ppermute",
    knn_precision=None,
) -> GraphOps:
    """Ring-based kNN / gather / pool bound to a mesh axis.

    ``use_pallas`` routes each ring step's block scoring through the
    fused kernel (no (Nq, Nb) score matrices even per block). Defaults
    to True on TPU backends, False elsewhere (the jnp path is the
    bitwise global-oracle reference and what CPU-mesh tests exercise).

    ``impl`` selects the ring mechanism for the graph build:
      * ``"ppermute"`` (default) — unrolled shard_map steps, block
        handoff via `lax.ppermute` (XLA-scheduled collectives).
      * ``"rdma"`` — one fused Pallas kernel per device owning the whole
        ring (`kernels.ring_knn_rdma`): chip-to-chip block transfer via
        explicit RDMA, started before each step's merge so it always
        hides behind compute. Same bit-exact global top-k contract.
        TPU-only inside Trainval (the Pallas interpreter cannot emulate
        remote DMA on the joint (data, points) mesh); on CPU meshes the
        kernel is testable under a single-axis shard_map with
        ``check_vma=False``.

    ``knn_precision`` is the graph-build scoring precision (the CP analog
    of `--knn_precision`), applied identically to BOTH impls so switching
    ``impl`` never changes the neighbor graph. Defaults to HIGHEST, the
    same bit-exact-vs-f32-oracle contract as the single-device kernel;
    ``precision`` remains the *model* matmul precision and is not used
    for scoring.
    """
    if knn_precision is None:
        knn_precision = jax.lax.Precision.HIGHEST
    if use_pallas is None:
        import jax as _jax

        use_pallas = _jax.default_backend() in ("tpu", "axon")
    if impl == "rdma":
        from dgcnn_tpu.kernels.ring_knn_rdma import ring_knn_rdma

        knn = lambda x, k, mask: ring_knn_rdma(
            x, k, mask, axis_name=axis_name, precision=knn_precision
        )
    elif impl == "ppermute":
        knn = lambda x, k, mask: ring_knn(
            x, k, mask, axis_name=axis_name, precision=knn_precision,
            use_pallas=use_pallas,
        )
    else:
        raise ValueError(f"unknown ring impl {impl!r} (ppermute|rdma)")
    return GraphOps(
        knn=knn,
        gather=lambda values, idx: ring_gather(values, idx, axis_name=axis_name),
        pool=_masked_max_pool_for(axis_name),
        # exact-ring decomposition for the fused block's local-gather
        # custom VJP: 'exchange' = one tiled all_gather of the neighbor
        # operand (same total ICI bytes as ring_gather's D−1 hops; the
        # transpose AD inserts is the matching reduce-scatter), indices
        # are already global rows of the gathered array. The extended
        # operand is (B, N_global, C) — SMALLER than the edge/reduced
        # backward's (B, N_local, k, C) edge-tensor temps whenever the
        # shard count D < k (D ≤ 8 vs k = 20 at the flagship config).
        extend=lambda values: jax.lax.all_gather(
            values, axis_name, axis=-2, tiled=True
        ),
        localize=lambda idx: idx,
    )


def banded_cp_graph_ops(
    axis_name: str = POINT_AXIS,
    *,
    window: int,
    knn_precision=None,
    use_pallas: bool | None = None,
) -> GraphOps:
    """Halo-exchange banded kNN / gather / pool bound to a mesh axis.

    The `--knn_window` × `--point_shards` composition: the batch arrives
    GLOBALLY Morton-sorted (Trainval sorts it before `shard_map`), each
    device owns a contiguous sorted band, and both the graph build and the
    neighbor gathers exchange only ``window``-row halos with the two ring
    neighbors — O(W) ICI traffic per device instead of the exact ring's
    O(N_local · (D−1)). See `kernels.halo_knn` for the exactness contract
    (valid rows bitwise the single-device banded oracle).

    ``knn_precision`` is the graph-build scoring precision, the same knob
    and default (HIGHEST) as `cp_graph_ops`. ``use_pallas`` routes the
    local banded selection through the fused kernel
    (`kernels.knn_banded.knn_pallas_banded_cross`); defaults to True on
    TPU backends, False elsewhere (the jnp core is the bitwise
    banded-oracle reference and what CPU-mesh tests exercise).
    """
    from dgcnn_tpu.kernels.halo_knn import (
        halo_extend_values,
        halo_gather,
        halo_knn,
        halo_localize_idx,
    )

    if knn_precision is None:
        knn_precision = jax.lax.Precision.HIGHEST
    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")
    return GraphOps(
        knn=lambda x, k, mask: halo_knn(
            x, k, mask, window=window, axis_name=axis_name,
            precision=knn_precision, use_pallas=use_pallas,
        ),
        gather=lambda values, idx: halo_gather(
            values, idx, window=window, axis_name=axis_name
        ),
        pool=_masked_max_pool_for(axis_name),
        # halo gathers decompose into exchange + local gather, so the
        # fused block's O(N·C) backward applies under banded CP (the
        # halo-row gradients ride the transposed ppermutes of `extend`)
        extend=lambda values: halo_extend_values(
            values, window=window, axis_name=axis_name
        ),
        localize=lambda idx: halo_localize_idx(
            idx, window=window, axis_name=axis_name
        ),
    )
