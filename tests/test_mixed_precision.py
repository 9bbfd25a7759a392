"""bf16 compute path and remat: correctness properties."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dgcnn_tpu.models import ModelSpec, get_model
from dgcnn_tpu.ops import softmax_cross_entropy

BASE = dict(num_class=2, k=6, edge_filters=(16, 16), head_feat_dim=32, head_mlp=(32,))


def _setup(spec):
    model = get_model("residual-dgcnn", spec)
    rng = jax.random.PRNGKey(0)
    params, state = model.init(rng, 4)
    x = jax.random.normal(rng, (2, 64, 4))
    mask = jnp.ones((2, 64), bool)
    return model, params, state, x, mask


def test_bf16_forward_close_to_f32():
    m32, params, state, x, mask = _setup(ModelSpec(**BASE))
    m16 = get_model("residual-dgcnn", ModelSpec(compute_dtype="bfloat16", **BASE))
    l32, _ = m32.apply(params, state, x, mask, train=True)
    l16, _ = m16.apply(params, state, x, mask, train=True)
    assert l16.dtype == jnp.float32  # logits always f32
    # bf16 rounds features, which can flip a handful of kNN neighbors —
    # individual points may shift discretely, so assert bulk agreement,
    # not elementwise closeness
    a, b = np.asarray(l16).ravel(), np.asarray(l32).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.995
    assert np.median(np.abs(a - b)) < 0.05
    assert np.mean(np.abs(a - b) > 0.2) < 0.1  # few outliers only


def test_bf16_trains():
    spec = ModelSpec(compute_dtype="bfloat16", **BASE)
    model = get_model("dgcnn", spec)
    rng = jax.random.PRNGKey(1)
    params, state = model.init(rng, 3)
    pts = np.random.RandomState(0).randn(1, 128, 3).astype(np.float32)
    labels = (pts[..., 0] > 0).astype(np.int32)
    pts[..., 1] += labels * 2.0
    x, y = jnp.asarray(pts), jnp.asarray(labels)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, state, opt_state):
        def loss_fn(p):
            logits, st = model.apply(p, state, x, train=True)
            return softmax_cross_entropy(logits, y), st

        (loss, st), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # master params stay f32 even in bf16 compute mode
        for g in jax.tree_util.tree_leaves(grads):
            assert g.dtype == jnp.float32
        updates, opt_state2 = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), st, opt_state2, loss

    losses = []
    for _ in range(40):
        params, state, opt_state, loss = step(params, state, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::10]


def test_remat_identical_loss_and_grads():
    spec_plain = ModelSpec(**BASE)
    spec_remat = ModelSpec(remat=True, **BASE)
    m_plain, params, state, x, mask = _setup(spec_plain)
    m_remat = get_model("residual-dgcnn", spec_remat)
    labels = jnp.zeros((2, 64), jnp.int32)

    def loss(model, p):
        logits, _ = model.apply(p, state, x, mask, train=True)
        return softmax_cross_entropy(logits, labels)

    l_p, g_p = jax.value_and_grad(lambda p: loss(m_plain, p))(params)
    l_r, g_r = jax.value_and_grad(lambda p: loss(m_remat, p))(params)
    np.testing.assert_allclose(float(l_p), float(l_r), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_p), jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_bn_output_stays_f32_for_bf16_inputs():
    """Regression: casting the post-BN chain to bf16 made gradients of
    deep (>=5 block) stacks overflow to inf on TPU. BN must emit f32 when
    asked (models pass out_dtype=f32 and cast at block boundaries)."""
    from dgcnn_tpu.ops.norm import batch_norm_apply, batch_norm_init

    params, state = batch_norm_init(8)
    x = jnp.ones((4, 8), jnp.bfloat16)
    y, _ = batch_norm_apply(params, state, x, train=True, out_dtype=jnp.float32)
    assert y.dtype == jnp.float32
    y2, _ = batch_norm_apply(params, state, x, train=True)
    assert y2.dtype == jnp.bfloat16  # default unchanged


def test_bf16_deep_stack_grads_finite():
    """6-block residual stack in bf16: grads stay finite (the failing
    depth of the original overflow)."""
    spec = ModelSpec(
        num_class=2, k=8, edge_filters=(32,) * 6, head_feat_dim=64,
        head_mlp=(64,), compute_dtype="bfloat16",
    )
    model = get_model("residual-dgcnn", spec)
    rng = jax.random.PRNGKey(0)
    params, state = model.init(rng, 4)
    x = jax.random.normal(rng, (1, 512, 4))
    labels = jnp.zeros((1, 512), jnp.int32)

    def loss_fn(p):
        logits, _ = model.apply(p, state, x, train=True)
        return softmax_cross_entropy(logits, labels)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    for g in jax.tree_util.tree_leaves(grads):
        assert bool(jnp.all(jnp.isfinite(g)))
