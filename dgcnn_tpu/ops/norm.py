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


def batch_norm_apply(
    params,
    state,
    x: jax.Array,
    mask: jax.Array | None = None,
    *,
    train: bool,
    momentum: float = 0.9,
    eps: float = 1e-3,
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

    Returns:
      ``(y, new_state)``.
    """
    if train:
        if mask is None:
            mean = jnp.mean(x, axis=tuple(range(x.ndim - 1)))
            var = jnp.mean(jnp.square(x - mean), axis=tuple(range(x.ndim - 1)))
        else:
            w = jnp.broadcast_to(mask[..., None], x.shape).astype(x.dtype)
            denom = jnp.maximum(jnp.sum(w, axis=tuple(range(x.ndim - 1))), 1.0)
            mean = jnp.sum(x * w, axis=tuple(range(x.ndim - 1))) / denom
            var = (
                jnp.sum(jnp.square(x - mean) * w, axis=tuple(range(x.ndim - 1)))
                / denom
            )
        new_state = {
            "mean": momentum * state["mean"] + (1.0 - momentum) * mean,
            "var": momentum * state["var"] + (1.0 - momentum) * var,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + eps) * params["scale"] + params["bias"]
    return y, new_state
