"""Minimal functional layer helpers (no framework dependency).

The reference wraps TF1 variable creation in PointNet `tf_util`-style
helpers (`conv2d`, `batch_norm`, `fc`) [M per SURVEY.md §2 #7]. Here the
equivalents are explicit init/apply pairs over param pytrees — idiomatic
for JAX transforms (`jit`/`grad`/`shard_map` treat params as data).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dgcnn_tpu.ops.norm import batch_norm_apply, batch_norm_init


def glorot_uniform(rng, shape, dtype=jnp.float32):
    """Xavier/Glorot uniform — the TF1 conv2d default initializer."""
    fan_in, fan_out = shape[0], shape[-1]
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, -limit, limit)


def dense_init(rng, din: int, dout: int, dtype=jnp.float32, bias: bool = True):
    p = {"w": glorot_uniform(rng, (din, dout), dtype)}
    if bias:
        p["b"] = jnp.zeros((dout,), dtype)
    return p


def dense_apply(params, x, *, precision=None, dtype=None):
    """1x1 conv == dense over the trailing channel axis.

    ``dtype``: cast the weights to this compute dtype (mixed precision —
    master params stay f32, the matmul runs in e.g. bf16).
    """
    w = params["w"] if dtype is None else params["w"].astype(dtype)
    y = jnp.einsum("...c,cd->...d", x, w, precision=precision)
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y


def conv_bn_init(rng, din: int, dout: int, dtype=jnp.float32):
    """Dense + BN block; returns (params, state).

    No conv bias: BN's mean subtraction makes a preceding bias an exact
    no-op (zero-gradient direction that only adds Adam sign noise).
    """
    dp = dense_init(rng, din, dout, dtype, bias=False)
    bn_params, bn_state = batch_norm_init(dout, dtype)
    return {**dp, "bn": bn_params}, bn_state


def conv_bn_apply(
    params,
    state,
    x,
    mask=None,
    *,
    train: bool,
    momentum: float = 0.9,
    activation=jax.nn.relu,
    precision=None,
    axis_name=None,
    dtype=None,
):
    """dense → BN(f32 out) → activation → cast back; returns (y, state)."""
    y = dense_apply(params, x, precision=precision, dtype=dtype)
    y_dtype = y.dtype
    y, new_state = batch_norm_apply(
        {"scale": params["bn"]["scale"], "bias": params["bn"]["bias"]},
        state,
        y,
        mask,
        train=train,
        momentum=momentum,
        axis_name=axis_name,
        out_dtype=jnp.float32,  # see ops.norm: bf16 post-BN grads overflow
    )
    if activation is not None:
        y = activation(y)
    return y.astype(y_dtype), new_state


def dropout(rng, x, rate: float, *, train: bool):
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
