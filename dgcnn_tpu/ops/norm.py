"""Mask-aware batch normalization with running statistics.

Reference behavior: `dgcnn/ops.py (batch_norm)` [M per SURVEY.md §2 #7] —
PointNet `tf_util`-style BN after every 1x1 conv, exponential moving
average of batch statistics, per-replica (no cross-replica sync, matching
the reference's per-tower BN [M per SURVEY.md §7]).

TPU-first extension: statistics are computed only over *valid* positions
(padded points in variable-length batches are excluded via ``mask``), so
bucketed padding never biases the normalization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def batch_norm_init(dim: int, dtype=jnp.float32):
    """Returns (params, state) for one BN layer over a trailing channel dim."""
    params = {
        "scale": jnp.ones((dim,), dtype),
        "bias": jnp.zeros((dim,), dtype),
    }
    state = {
        "mean": jnp.zeros((dim,), dtype),
        "var": jnp.ones((dim,), dtype),
    }
    return params, state


def finalize_batch_stats(
    count,
    s1,
    s2,
    state,
    *,
    momentum: float,
    axis_name: str | None = None,
):
    """Assemble BN batch statistics from local partial sums.

    The ONE place the statistic semantics live — shared by
    `batch_norm_apply` and the restructured EdgeConv blocks
    (`ops.edge.edgeconv_block_reduced` / `edgeconv_block_fused`), whose
    equivalence tests pin that they can never diverge.

    Args:
      count, s1, s2: valid-position count, sum, and sum-of-squares per
        channel (count may be scalar when unmasked).
      state: ``{"mean", "var"}`` running statistics.
      axis_name: psum-merge the partial sums over this mesh axis
        (cross-replica sync BN).

    Returns:
      ``(mean, var, new_state)``.
    """
    if axis_name is not None:
        count = jax.lax.psum(count, axis_name)
        s1 = jax.lax.psum(s1, axis_name)
        s2 = jax.lax.psum(s2, axis_name)
    denom = jnp.maximum(count, 1.0)
    mean = s1 / denom
    var = jnp.maximum(s2 / denom - jnp.square(mean), 0.0)
    # an all-masked batch (count==0 — e.g. a DP replica that got only
    # padded filler rows under --no_bn_sync) must leave the running
    # statistics UNTOUCHED: blending in the degenerate mean=0/var=0
    # would drag saved inference stats toward zero every epoch tail
    has_data = count > 0
    new_state = {
        "mean": jnp.where(
            has_data,
            momentum * state["mean"] + (1.0 - momentum) * mean,
            state["mean"],
        ),
        "var": jnp.where(
            has_data,
            momentum * state["var"] + (1.0 - momentum) * var,
            state["var"],
        ),
    }
    return mean, var, new_state


def batch_norm_apply(
    params,
    state,
    x: jax.Array,
    mask: jax.Array | None = None,
    *,
    train: bool,
    momentum: float = 0.9,
    eps: float = 1e-3,
    axis_name: str | None = None,
    out_dtype=None,
):
    """Normalize ``x`` over all axes but the last.

    Args:
      params: ``{"scale", "bias"}`` of shape ``(C,)``.
      state: ``{"mean", "var"}`` running statistics of shape ``(C,)``.
      x: ``(..., C)``.
      mask: optional bool broadcastable to ``x.shape[:-1]``; False positions
        are excluded from the batch statistics (their outputs are still
        produced; downstream losses mask them).
      train: True → use (masked) batch statistics and update the running
        averages; False → use running statistics (reference inference mode).
      axis_name: if set (inside shard_map), batch statistics are psum-merged
        over that mesh axis — cross-replica sync BN, which makes training
        bitwise independent of the data-parallel device count. ``None``
        reproduces the reference's per-tower BN [M per SURVEY.md §7].
      out_dtype: output dtype; defaults to the input dtype. Mixed-precision
        callers pass float32: casting normalized activations down to bf16
        between BN and the nonlinearity/aggregation makes gradients of
        deep (≥5-block) stacks overflow to inf (observed empirically);
        keeping the post-BN chain f32 and casting at block boundaries is
        stable and costs nothing (the chain lives inside an XLA fusion).

    Returns:
      ``(y, new_state)``.
    """
    out_dtype = out_dtype or x.dtype
    # statistics always accumulate in f32 (bf16 sums overflow/lose bits)
    x = x.astype(jnp.float32)
    if train:
        axes = tuple(range(x.ndim - 1))
        if mask is None:
            count = jnp.asarray(float(np.prod(x.shape[:-1])), x.dtype)
            s1 = jnp.sum(x, axis=axes)
            s2 = jnp.sum(jnp.square(x), axis=axes)
        else:
            w = jnp.broadcast_to(mask[..., None], x.shape).astype(x.dtype)
            count = jnp.sum(w, axis=axes)  # (C,), identical per channel
            s1 = jnp.sum(x * w, axis=axes)
            s2 = jnp.sum(jnp.square(x) * w, axis=axes)
        mean, var, new_state = finalize_batch_stats(
            count, s1, s2, state, momentum=momentum, axis_name=axis_name
        )
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + eps) * params["scale"] + params["bias"]
    return y.astype(out_dtype), new_state
