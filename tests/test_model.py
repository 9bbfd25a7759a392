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


def test_block_convs_stacked_depth():
    """--block_convs >= 2: paper-style stacked per-edge convs (SURVEY
    §0.6 step 3 [M]). Depth changes parameters and predictions; depth 1
    keeps the historical param/state tree (old checkpoints load)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dgcnn_tpu.models import ModelSpec, get_model

    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(2, 64, 4).astype(np.float32))
    mask = jnp.asarray(rng.rand(2, 64) > 0.2)
    spec1 = ModelSpec(
        num_class=2, k=5, edge_filters=(12, 16), head_feat_dim=24,
        head_mlp=(16,), residual=True,
    )
    spec2 = dataclasses.replace(spec1, block_convs=2)
    m1 = get_model("residual-dgcnn", spec1)
    m2 = get_model("residual-dgcnn", spec2)
    p1, s1 = m1.init(jax.random.PRNGKey(0), 4)
    p2, s2 = m2.init(jax.random.PRNGKey(0), 4)

    # depth-1 tree shape unchanged (no "extra" anywhere)
    assert "extra" not in p1["blocks"][0]
    assert "extra" in p2["blocks"][0] and len(p2["blocks"][0]["extra"]) == 1
    assert p2["blocks"][0]["extra"][0]["w"].shape == (12, 12)
    assert set(s2["blocks"][0]) == {"main", "extra"}

    # both depths run fwd (train + eval) and produce distinct functions
    l1, st1 = m1.apply(p1, s1, pts, mask, train=True)
    l2, st2 = m2.apply(p2, s2, pts, mask, train=True)
    assert l1.shape == l2.shape == (2, 64, 2)
    m2.apply(p2, st2, pts, mask, train=False)

    # gradients flow through the stacked convs
    def loss(p):
        logits, _ = m2.apply(p, s2, pts, mask, train=True)
        return jnp.mean(jnp.square(logits))

    g = jax.grad(loss)(p2)
    gext = g["blocks"][0]["extra"][0]["w"]
    assert float(jnp.sum(jnp.abs(gext))) > 0


def test_block_convs_trains():
    """Depth-2 blocks train end-to-end (loss decreases) through Trainval."""
    from dgcnn_tpu.config import Config
    from dgcnn_tpu.io import BucketBatcher, SyntheticIO
    from dgcnn_tpu.parallel.mesh import make_mesh
    from dgcnn_tpu.train import Trainval

    cfg = Config(
        num_class=2, kvalue=6, edge_filters=(12, 12), head_feat_dim=16,
        head_mlp=(16,), minibatch_size=2, num_point=128, use_pallas=False,
        block_convs=2, learning_rate=3e-3,
    )
    tv = Trainval(cfg, mesh=make_mesh(1))
    state = tv.initialize(4)
    io = SyntheticIO(num_events=2, num_point=128, seed=0).initialize()
    batch = next(BucketBatcher(io, 2, num_point=128, shuffle=False).epoch())
    losses = []
    for _ in range(25):
        state, m = tv.train_step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < 0.75 * losses[0], losses[::6]


def test_block_impl_fallback_warns(capsys):
    """Requesting a restructured block_impl it can't honor (bf16 compute
    or stacked blocks) prints a one-time build warning naming the cause,
    and prints nothing when the restructured path is actually used."""
    import dataclasses

    from dgcnn_tpu.models import ModelSpec, get_model

    spec = ModelSpec(
        num_class=2, k=5, edge_filters=(12,), head_feat_dim=8,
        head_mlp=(8,), block_impl="fused",
    )
    get_model("dgcnn", dataclasses.replace(spec, block_convs=2))
    out = capsys.readouterr().out
    assert "WARNING" in out and "block_convs=2" in out

    get_model("dgcnn", dataclasses.replace(spec, compute_dtype="bfloat16"))
    out = capsys.readouterr().out
    assert "WARNING" in out and "bfloat16" in out

    get_model("dgcnn", spec)
    assert capsys.readouterr().out == ""


def test_block_impl_auto_resolution(capsys):
    """The 'auto' default resolves silently to the fastest measured form
    for the config (BASELINE.md interleaved A/B): fused for f32 depth-1
    local-gather models; edge under bf16, stacked blocks, OR a gather_fn
    override (context parallelism — where the fused VJP doesn't apply
    and the reduced fall-through has the worst backward memory)."""
    import dataclasses

    from dgcnn_tpu.models import ModelSpec, get_model

    spec = ModelSpec(
        num_class=2, k=5, edge_filters=(12,), head_feat_dim=8,
        head_mlp=(8,), block_impl="auto",
    )
    assert get_model("dgcnn", spec).block_impl == "fused"
    assert (
        get_model(
            "dgcnn", dataclasses.replace(spec, compute_dtype="bfloat16")
        ).block_impl
        == "edge"
    )
    assert (
        get_model("dgcnn", dataclasses.replace(spec, block_convs=2)).block_impl
        == "edge"
    )
    gather = lambda v, i: v  # any CP-style override  # noqa: E731
    assert get_model("dgcnn", spec, gather_fn=gather).block_impl == "edge"
    # explicit fused under CP keeps the documented reduced fall-through
    assert (
        get_model(
            "dgcnn",
            dataclasses.replace(spec, block_impl="fused"),
            gather_fn=gather,
        ).block_impl
        == "reduced"
    )
    # auto never warns — resolution is silent by contract
    assert "WARNING" not in capsys.readouterr().out
