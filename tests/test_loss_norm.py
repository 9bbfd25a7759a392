"""Masked loss/metrics and mask-aware batch norm."""

import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.ops import (
    accuracy,
    batch_norm_apply,
    batch_norm_init,
    confusion_matrix,
    mean_iou,
    per_class_accuracy,
    softmax_cross_entropy,
)


def test_xent_masked_equals_unpadded():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 10, 3).astype(np.float32)
    labels = rng.randint(0, 3, (2, 10))
    mask = np.ones((2, 10), bool)
    mask[:, 7:] = False
    # poison the padded region — must not affect the loss
    poisoned = logits.copy()
    poisoned[:, 7:] = 1e6
    l_masked = softmax_cross_entropy(jnp.asarray(poisoned), jnp.asarray(labels), mask=jnp.asarray(mask))
    l_trunc = softmax_cross_entropy(jnp.asarray(logits[:, :7]), jnp.asarray(labels[:, :7]))
    np.testing.assert_allclose(float(l_masked), float(l_trunc), rtol=1e-6)


def test_xent_weights():
    logits = jnp.asarray([[[10.0, 0.0], [0.0, 10.0]]])
    labels = jnp.asarray([[0, 0]])  # second point wrong
    w_hi = softmax_cross_entropy(logits, labels, weights=jnp.asarray([[0.1, 10.0]]))
    w_lo = softmax_cross_entropy(logits, labels, weights=jnp.asarray([[10.0, 0.1]]))
    assert float(w_hi) > float(w_lo)


def test_accuracy_and_miou():
    logits = jnp.asarray(
        [[[5.0, 0.0], [0.0, 5.0], [5.0, 0.0], [0.0, 5.0]]]
    )  # preds: 0 1 0 1
    labels = jnp.asarray([[0, 1, 1, 1]])
    mask = jnp.asarray([[True, True, True, False]])
    acc = accuracy(logits, labels, mask)
    np.testing.assert_allclose(float(acc), 2.0 / 3.0, rtol=1e-6)
    cm = confusion_matrix(jnp.argmax(logits, -1), labels, 2, mask)
    np.testing.assert_allclose(np.asarray(cm), [[1, 0], [1, 1]])
    pca = per_class_accuracy(cm)
    np.testing.assert_allclose(np.asarray(pca), [1.0, 0.5])
    # IoU: class0 = 1/2, class1 = 1/2 → mIoU 0.5
    np.testing.assert_allclose(float(mean_iou(cm)), 0.5)


def test_batch_norm_masked_stats():
    rng = np.random.RandomState(1)
    x = rng.randn(4, 20, 8).astype(np.float32)
    mask = np.ones((4, 20), bool)
    mask[:, 15:] = False
    poisoned = x.copy()
    poisoned[:, 15:] = 1e5
    params, state = batch_norm_init(8)
    y1, s1 = batch_norm_apply(params, state, jnp.asarray(poisoned), jnp.asarray(mask), train=True)
    y2, s2 = batch_norm_apply(
        params, state, jnp.asarray(x[:, :15].reshape(-1, 8)), train=True
    )
    np.testing.assert_allclose(np.asarray(s1["mean"]), np.asarray(s2["mean"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s1["var"]), np.asarray(s2["var"]), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(y1)[:, :15].reshape(-1, 8), np.asarray(y2), atol=1e-4
    )


def test_batch_norm_eval_uses_running_stats():
    params, state = batch_norm_init(4)
    state = {"mean": jnp.full((4,), 2.0), "var": jnp.full((4,), 4.0)}
    x = jnp.full((3, 4), 4.0)
    y, new_state = batch_norm_apply(params, state, x, train=False, eps=0.0)
    np.testing.assert_allclose(np.asarray(y), 1.0, rtol=1e-6)
    assert new_state is state


def test_bn_all_masked_batch_leaves_running_stats_unchanged():
    """A replica that received only padded filler rows (count==0) must
    not blend the degenerate mean=0/var=0 into its running statistics —
    epoch-tail filler batches would otherwise drag saved inference stats
    toward zero under --no_bn_sync."""
    import jax.numpy as jnp

    from dgcnn_tpu.ops.norm import batch_norm_apply, batch_norm_init

    params, state = batch_norm_init(8)
    state = {
        "mean": jnp.full((8,), 1.5),
        "var": jnp.full((8,), 2.0),
    }
    x = jnp.ones((2, 16, 8)) * 42.0  # garbage in fully-masked rows
    mask = jnp.zeros((2, 16), bool)
    _, new_state = batch_norm_apply(
        params, state, x, mask, train=True, momentum=0.9
    )
    np.testing.assert_array_equal(
        np.asarray(new_state["mean"]), np.asarray(state["mean"])
    )
    np.testing.assert_array_equal(
        np.asarray(new_state["var"]), np.asarray(state["var"])
    )
    # sanity: a batch WITH data still updates
    mask2 = mask.at[0, :4].set(True)
    _, upd = batch_norm_apply(
        params, state, x, mask2, train=True, momentum=0.9
    )
    assert not np.allclose(np.asarray(upd["mean"]), np.asarray(state["mean"]))
