"""Frozen-oracle regression fixture (SURVEY.md §4 numerics north star).

The TF reference was unavailable, so the bit-comparability target is OUR
pure-jnp model frozen at fixture-generation time: any semantic drift in
init, kNN, EdgeConv, BN or the head changes these logits and fails here.
Regenerate deliberately (see the script in the git history of this file)
only when the model semantics are *supposed* to change.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.models import ModelSpec, get_model

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "frozen_oracle.npz")


def test_frozen_oracle_logits():
    data = np.load(FIXTURE)
    spec = ModelSpec(
        num_class=3, k=10, edge_filters=(16, 24), head_feat_dim=48, head_mlp=(32,)
    )
    model = get_model("residual-dgcnn", spec)
    params, state = model.init(jax.random.PRNGKey(1234), 4)
    pts, mask = jnp.asarray(data["points"]), jnp.asarray(data["mask"])
    logits_train, st = model.apply(params, state, pts, mask, train=True)
    logits_eval, _ = model.apply(params, st, pts, mask, train=False)
    np.testing.assert_allclose(
        np.asarray(logits_train), data["logits_train"], atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(logits_eval), data["logits_eval"], atol=2e-5)
