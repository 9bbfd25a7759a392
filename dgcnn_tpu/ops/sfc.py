"""Space-filling-curve point ordering (the banded-kNN sort key).

Sorting points along a Z-order (Morton) curve makes sorted-position
proximity a proxy for feature-space proximity, which is what lets the
banded kNN (`ops.knn.banded_knn_indices`, `--knn_window`) restrict each
query's candidate set to a window of consecutive sorted positions —
O(N·W) score work instead of the exact path's O(N²).

Design notes (measured in `benchmarks/probe_banded.py` on synthetic
LArTPC-like events):
  * the code is built over ALL input feature channels (up to 8), not
    just xyz — layer-0 kNN distances include the value channel, and a
    4-D code recovers most of the recall a 3-D code loses to it
    (85% vs 72% at a window of 3% of N);
  * Hilbert ordering was probed too and is within ±1% recall of Morton
    on this geometry — not worth its extra code;
  * quantization is per-event min/max over VALID points only, so padded
    rows can never distort the box; invalid points sort last.

No reference analog: the reference computes exact O(N²) kNN only
[H per SURVEY.md §0.6]; this module exists for the TPU-native
sub-quadratic opt-in path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_CODE_DIMS = 8  # interleave at most this many feature channels


def morton_code(x: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """Z-order code of every point, uint32.

    Args:
      x: ``(..., N, C)`` point features; the first ``min(C, 8)`` channels
        feed the code with ``32 // ndim`` bits each.
      mask: optional ``(..., N)`` bool; False rows quantize as zeros
        (their code value is irrelevant — `morton_order` sorts them last
        via a separate validity key).

    Returns:
      ``(..., N)`` uint32 codes.
    """
    ndim = min(x.shape[-1], MAX_CODE_DIMS)
    bits = 32 // ndim
    x = x[..., :ndim].astype(jnp.float32)
    if mask is not None:
        big = jnp.float32(3.4e38)
        lo = jnp.min(jnp.where(mask[..., None], x, big), axis=-2, keepdims=True)
        hi = jnp.max(jnp.where(mask[..., None], x, -big), axis=-2, keepdims=True)
        # all-padded events: lo > hi; collapse to a zero-extent box
        hi = jnp.maximum(hi, lo)
    else:
        lo = jnp.min(x, axis=-2, keepdims=True)
        hi = jnp.max(x, axis=-2, keepdims=True)
    scale = (2.0**bits - 1.0) / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip(
        (x - lo) * scale, 0.0, 2.0**bits - 1.0
    ).astype(jnp.uint32)  # (..., N, ndim)
    code = jnp.zeros(x.shape[:-1], jnp.uint32)
    for b in range(bits):
        for d in range(ndim):
            bit = (q[..., d] >> jnp.uint32(b)) & jnp.uint32(1)
            code = code | (bit << jnp.uint32(ndim * b + d))
    return code


def morton_order(
    x: jax.Array, mask: jax.Array | None = None
) -> tuple[jax.Array, jax.Array]:
    """Sorted order of points along the Z-curve; padded points last.

    Returns:
      ``order``: ``(..., N)`` int32; ``order[i]`` is the original index of
        the point at sorted position ``i`` (stable: code ties keep
        original index order, so the sort is deterministic).
      ``pos``: ``(..., N)`` int32 inverse permutation;
        ``pos[j]`` is the sorted position of original point ``j``.
    """
    code = morton_code(x, mask)
    n = code.shape[-1]
    iota = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32), code.shape
    )
    if mask is not None:
        invalid = (~mask).astype(jnp.uint32)
    else:
        invalid = jnp.zeros_like(code)
    _, _, order = jax.lax.sort(
        (invalid, code, iota), num_keys=2, is_stable=True
    )
    pos = jnp.argsort(order, axis=-1).astype(jnp.int32)
    return order.astype(jnp.int32), pos
