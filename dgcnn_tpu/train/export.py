"""Serving export: serialize the inference function to a StableHLO artifact.

Goes beyond the reference (which serves by rebuilding the TF graph +
Saver.restore): `export_model` bakes a trained checkpoint into a
self-contained `jax.export` artifact — fixed input shapes, params as
constants — that any process with jaxlib can deserialize and call
without the dgcnn_tpu package or the checkpoint file. CLI:

  python -m dgcnn_tpu export -mp weights/snap -np 4096 -of model.jaxir
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jexport


def export_model(cfg, state, in_dim: int = 4, batch: int = 1):
    """Serialize eval-mode inference at (batch, num_point, in_dim).

    ``batch=0`` exports a *shape-polymorphic* artifact: the batch
    dimension is symbolic, so one artifact serves any request batch size
    (the point count stays static — kNN tiling and padding depend on it).

    Returns the serialized bytes. The callable signature of the artifact
    is ``(points f32[B,N,F], mask bool[B,N]) -> scores f32[B,N,C]``.
    """
    from dgcnn_tpu.models import get_model

    if cfg.num_point <= 0:
        raise ValueError("export requires --num_point (static serving shape)")
    n = cfg.num_point
    # the artifact must compute the same function the live trainer/server
    # does: thread the matmul precision through (on TPU, omitting it
    # bakes DEFAULT bf16 matmuls into a --precision highest serving
    # config — ~1e-2 softmax drift vs live inference, caught by
    # benchmarks/tpu_gate.py's export leg)
    from dgcnn_tpu.train.trainval import _precision_of

    model = get_model(
        cfg.model_name, cfg.model_spec(),
        precision=_precision_of(cfg.precision),
    )
    params, mstate = state.params, state.model_state

    def serve(points, mask):
        logits, _ = model.apply(params, mstate, points, mask, train=False)
        return jax.nn.softmax(logits, axis=-1)

    b = jexport.symbolic_shape("b")[0] if batch == 0 else batch
    exp = jexport.export(jax.jit(serve))(
        jax.ShapeDtypeStruct((b, n, in_dim), jnp.float32),
        jax.ShapeDtypeStruct((b, n), jnp.bool_),
    )
    return exp.serialize()


def load_exported(path_or_bytes):
    """Deserialize an exported artifact; returns a callable
    (points, mask) -> scores."""
    data = (
        path_or_bytes
        if isinstance(path_or_bytes, (bytes, bytearray))
        else open(path_or_bytes, "rb").read()
    )
    exp = jexport.deserialize(data)
    return lambda points, mask: exp.call(points, mask)


def run_export(cfg) -> str:
    """CLI driver: restore checkpoint → export → write artifact file."""
    import types

    from dgcnn_tpu.models import get_model
    from dgcnn_tpu.train import checkpoint

    if not cfg.model_path:
        raise ValueError("export requires --model_path")
    if not cfg.output_file:
        raise ValueError("export requires --output_file")
    # only params + BN state matter for serving — optimizer/schedule flags
    # of the original run are irrelevant here. in_dim comes from the
    # checkpoint itself: the first EdgeConv weight is (2*in_dim, C_out),
    # so a model trained on F!=4 events exports correctly.
    payload = checkpoint.peek(cfg.model_path)
    # serve exactly the trained function: adopt the checkpoint's
    # model-defining flags (kvalue/knn_every/... don't all change
    # parameter shapes, so a mismatch would export a DIFFERENT model
    # from byte-identical weights without any error)
    cfg = checkpoint.adopt_model_flags(cfg, payload=payload)
    try:
        in_dim = int(payload["tree"]["params"]["blocks"]["0"]["w"].shape[0]) // 2
    except (KeyError, AttributeError) as e:
        raise ValueError(
            f"cannot derive in_dim from checkpoint {cfg.model_path!r}: {e}"
        ) from e
    model = get_model(cfg.model_name, cfg.model_spec())
    params0, mstate0 = model.init(jax.random.PRNGKey(0), in_dim)
    loaded, step, _ = checkpoint.restore_subtrees(
        cfg.model_path, {"params": params0, "model_state": mstate0},
        payload=payload,
    )
    state = types.SimpleNamespace(
        params=loaded["params"], model_state=loaded["model_state"]
    )
    blob = export_model(cfg, state, in_dim=in_dim, batch=cfg.minibatch_size)
    with open(cfg.output_file, "wb") as f:
        f.write(blob)
    bdesc = "b" if cfg.minibatch_size == 0 else str(cfg.minibatch_size)
    print(
        f"exported step-{step} model ({len(blob)/1e6:.2f} MB, shapes "
        f"[{bdesc},{cfg.num_point},{in_dim}]) -> {cfg.output_file}",
        flush=True,
    )
    return cfg.output_file
