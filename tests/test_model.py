"""Model forward/backward sanity: shapes, masking invariance, overfit."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dgcnn_tpu.models import ModelSpec, get_model
from dgcnn_tpu.ops import accuracy, softmax_cross_entropy

SMALL = ModelSpec(
    num_class=3, k=6, edge_filters=(16, 16), head_feat_dim=32, head_mlp=(32,)
)


@pytest.mark.parametrize("name", ["dgcnn", "residual-dgcnn"])
def test_forward_shapes_and_state(name):
    model = get_model(name, SMALL)
    rng = jax.random.PRNGKey(0)
    params, state = model.init(rng, 4)
    x = jax.random.normal(rng, (2, 64, 4))
    mask = jnp.ones((2, 64), bool)
    logits, new_state = model.apply(params, state, x, mask, train=True)
    assert logits.shape == (2, 64, 3)
    # BN state must actually move in train mode
    leaves0 = jax.tree_util.tree_leaves(state)
    leaves1 = jax.tree_util.tree_leaves(new_state)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(leaves0, leaves1)
    )
    # eval mode leaves state untouched
    _, eval_state = model.apply(params, state, x, mask, train=False)
    for a, b in zip(leaves0, jax.tree_util.tree_leaves(eval_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_padding_invariance():
    """Padding an event with garbage must not change valid-point logits."""
    model = get_model("dgcnn", SMALL)
    rng = jax.random.PRNGKey(1)
    params, state = model.init(rng, 4)
    x = jax.random.normal(rng, (1, 48, 4))
    logits_ref, _ = model.apply(params, state, x, jnp.ones((1, 48), bool), train=True)

    pad = jnp.full((1, 16, 4), 1e3)
    x_padded = jnp.concatenate([x, pad], axis=1)
    mask = jnp.concatenate([jnp.ones((1, 48), bool), jnp.zeros((1, 16), bool)], axis=1)
    logits_pad, _ = model.apply(params, state, x_padded, mask, train=True)
    np.testing.assert_allclose(
        np.asarray(logits_pad[:, :48]), np.asarray(logits_ref), atol=2e-4
    )


@pytest.mark.parametrize("name", ["dgcnn", "residual-dgcnn"])
def test_overfit_toy_event(name):
    """BASELINE config 1: tiny DGCNN overfits a single toy event."""
    spec = ModelSpec(num_class=2, k=8, edge_filters=(16,), head_feat_dim=16, head_mlp=(16,))
    model = get_model(name, spec)
    rng = jax.random.PRNGKey(42)
    # two separable clusters of points → labels 0/1
    n = 128
    pts = np.random.RandomState(0).randn(1, n, 3).astype(np.float32)
    labels = (pts[..., 0] > 0).astype(np.int32)
    pts[..., 1] += labels * 2.0
    x, y = jnp.asarray(pts), jnp.asarray(labels)

    params, state = model.init(rng, 3)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, state, opt_state):
        def loss_fn(p):
            logits, st = model.apply(p, state, x, train=True)
            return softmax_cross_entropy(logits, y), (logits, st)

        (loss, (logits, st)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), st, opt_state2, loss, logits

    for i in range(60):
        params, state, opt_state, loss, logits = step(params, state, opt_state)
    acc = float(accuracy(logits, y))
    assert float(loss) < 0.25, f"loss did not drop: {float(loss)}"
    assert acc > 0.95, f"accuracy {acc}"


def test_knn_every_semantics():
    """Graph reuse: knn_every=1 is the per-block reference semantics
    (default unchanged); knn_every=n reuses indices across blocks —
    different logits from per-block rebuilds but identical whenever the
    rebuild schedule coincides (n >= L builds the graph exactly once)."""
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (2, 64, 4))
    mask = jnp.ones((2, 64), bool)

    def logits_for(every):
        spec = ModelSpec(
            num_class=3, k=6, edge_filters=(16, 16, 16), head_feat_dim=32,
            head_mlp=(32,), knn_every=every,
        )
        model = get_model("dgcnn", spec)
        params, state = model.init(jax.random.PRNGKey(0), 4)
        out, _ = model.apply(params, state, x, mask, train=False)
        return np.asarray(out)

    base = logits_for(1)
    default = logits_for(1)
    np.testing.assert_array_equal(base, default)
    reused = logits_for(3)
    assert not np.allclose(base, reused), "graph reuse must change block 2+"
    # any schedule >= num blocks builds the input graph exactly once
    np.testing.assert_array_equal(logits_for(3), logits_for(99))


def test_knn_every_trains():
    """Loss must still descend with a reused graph (the opt-in knob is a
    speed/quality trade, not a correctness break)."""
    spec = ModelSpec(
        num_class=2, k=6, edge_filters=(16, 16, 16), head_feat_dim=32,
        head_mlp=(32,), knn_every=3,
    )
    model = get_model("dgcnn", spec)
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (1, 128, 4))
    labels = (x[..., 0] > 0).astype(jnp.int32)
    mask = jnp.ones((1, 128), bool)
    w = jnp.ones((1, 128))
    params, state = model.init(rng, 4)
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, state, opt_state):
        def loss_fn(p):
            logits, s2 = model.apply(p, state, x, mask, train=True)
            return softmax_cross_entropy(logits, labels, w, mask), s2

        (loss, s2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), s2, opt_state2, loss

    first = None
    for i in range(40):
        params, state, opt_state, loss = step(params, state, opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.5 * first, (first, float(loss))
