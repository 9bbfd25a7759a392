"""Trainer: jitted train/eval/inference steps with shard_map data parallelism.

Counterpart of the reference's `trainval` class (`dgcnn/trainval.py` [M per
SURVEY.md §2 #4]): builds the model, the optimizer (Adam), the per-device
step, and checkpoint save/restore hooks. Where the reference replicates
the graph per GPU and averages tower gradients with implicit device
copies, the rebuild runs one `shard_map` over the ``data`` mesh axis and
reduces gradients with a single `psum` over ICI.

Exactness upgrade over the reference: the loss is the *global* weighted
mean (psum of weighted sums / psum of weights), so gradients — and
therefore training trajectories — are identical for any device count
(tower-mean semantics would weight unbalanced shards unevenly). BN batch
statistics stay per-replica in the forward pass (reference per-tower BN
[M per SURVEY.md §7]) while the *running* statistics are pmean-synced so
the saved state is device-count independent.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from dgcnn_tpu.io.batching import Batch
from dgcnn_tpu.models import get_model
from dgcnn_tpu.ops.sfc import morton_order
from dgcnn_tpu.parallel.collectives import DATA_AXIS, POINT_AXIS
from dgcnn_tpu.parallel.context_parallel import banded_cp_graph_ops, cp_graph_ops
from dgcnn_tpu.parallel.mesh import make_mesh


class TrainState(NamedTuple):
    params: Any
    model_state: Any  # BN running stats
    opt_state: Any
    step: jax.Array  # scalar int32
    rng: jax.Array  # PRNG key


def _precision_of(name: str):
    return {
        "default": None,
        "highest": jax.lax.Precision.HIGHEST,
        "bfloat16": jax.lax.Precision.DEFAULT,
    }[name]


class Trainval:
    """Build once per run; owns mesh, model, optimizer and compiled steps."""

    def __init__(self, cfg, mesh=None, knn_fn=None):
        self.cfg = cfg
        point_shards = int(getattr(cfg, "point_shards", 1) or 1)
        self.mesh = (
            mesh
            if mesh is not None
            else make_mesh(cfg.num_devices, num_point_shards=point_shards)
        )
        self.num_devices = int(np.prod(self.mesh.devices.shape))
        self.point_shards = self.mesh.shape[POINT_AXIS]
        self._cp = self.point_shards > 1
        if cfg.minibatch_size % self.mesh.shape[DATA_AXIS]:
            raise ValueError(
                f"minibatch_size={cfg.minibatch_size} not divisible by "
                f"data-parallel devices={self.mesh.shape[DATA_AXIS]}"
            )
        precision = _precision_of(cfg.precision)
        extra_ops = {}
        ring_impl = getattr(cfg, "ring_impl", "ppermute")
        # banded CP: globally Morton-sorted batch, halo-exchange banded
        # graph builds/gathers — O(window) ICI traffic instead of the
        # exact ring's O(N_local·(D−1)). The steps sort the batch before
        # shard_map (a per-shard local sort would be wrong) and the model
        # is built pre_sorted.
        self._banded_cp = self._cp and getattr(cfg, "knn_window", 0) > 0
        if (
            self._cp
            and not self._banded_cp
            and ring_impl == "rdma"
            and jax.default_backend() not in ("tpu", "axon")
        ):
            # the Pallas interpreter emulates remote DMA only on
            # single-axis meshes; the training mesh is (data, points)
            raise ValueError(
                "--ring_impl rdma requires a TPU backend: the Pallas "
                "interpreter cannot emulate inter-chip DMA on the joint "
                "(data, points) training mesh. Use --ring_impl ppermute "
                "on CPU meshes (identical results, XLA collectives)."
            )
        if self._cp:
            # points sharded over the mesh: ring kNN/gather/pool over ICI.
            # Graph-build scoring precision follows --knn_precision (same
            # knob as the single-device kernel), NOT the model precision.
            knn_prec = (
                jax.lax.Precision.HIGHEST
                if getattr(cfg, "knn_precision", "highest") == "highest"
                else jax.lax.Precision.DEFAULT
            )
            if self._banded_cp:
                if ring_impl == "rdma":
                    raise ValueError(
                        "--ring_impl rdma does not apply to banded context "
                        "parallelism (--knn_window with point_shards > 1): "
                        "the banded path exchanges halos, not ring blocks."
                    )
                ops = banded_cp_graph_ops(
                    POINT_AXIS,
                    window=cfg.knn_window,
                    knn_precision=knn_prec,
                    # honor --no_pallas (the kernel-bypass debug knob);
                    # True still defers to the backend default (jnp core
                    # on CPU meshes, fused kernel on TPU)
                    use_pallas=None if cfg.use_pallas else False,
                )
            else:
                ops = cp_graph_ops(
                    POINT_AXIS,
                    precision=precision,
                    impl=ring_impl,
                    knn_precision=knn_prec,
                )
            knn_fn = knn_fn or ops.knn
            extra_ops = {"gather_fn": ops.gather, "pool_fn": ops.pool}
            if ops.extend is not None:
                # both CP gathers decompose into exchange + local gather
                # (banded: halo ppermutes; exact ring: tiled all_gather):
                # lets the fused block's O(rows·C) backward run under CP
                # (models.make_model resolves auto -> fused)
                extra_ops["gather_extend_fn"] = ops.extend
                extra_ops["gather_localize_fn"] = ops.localize
        elif knn_fn is None and cfg.use_pallas:
            knn_fn = _maybe_pallas_knn(
                getattr(cfg, "knn_precision", "highest"),
                getattr(cfg, "knn_window", 0),
            )
        self.model = get_model(
            cfg.model_name,
            cfg.model_spec(),
            knn_fn=knn_fn,
            precision=precision,
            pre_sorted=self._banded_cp,
            **extra_ops,
        )
        self._lr = _make_lr(cfg)
        self.opt = _make_optimizer(
            getattr(cfg, "optimizer", "adam"),
            self._lr,
            getattr(cfg, "grad_clip", 0.0),
        )
        # reduce over both mesh axes (the points axis is a no-op under
        # pure DP where its size is 1)
        self._axes = (DATA_AXIS, POINT_AXIS)
        self._batch_spec = P(DATA_AXIS, POINT_AXIS)
        self._batch_sharding = NamedSharding(self.mesh, self._batch_spec)
        self._repl_sharding = NamedSharding(self.mesh, P())
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step(gather=True)
        self._metrics_step = self._build_eval_step(gather=False)

    # ---------------------------------------------------------------- init

    def initialize(self, in_dim: int, rng=None) -> TrainState:
        """Init params/optimizer (reference `trainval.initialize` [M])."""
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        params, mstate = self.model.init(rng, in_dim)
        opt_state = self.opt.init(params)
        state = TrainState(
            params=params,
            model_state=mstate,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
            rng=rng,
        )
        return jax.device_put(state, self._repl_sharding)

    def lr_at(self, step: int) -> float:
        """Learning rate at a step (for report lines / observability)."""
        return float(self._lr(step)) if callable(self._lr) else float(self._lr)

    def restore_for_eval(self, state: "TrainState", path: str):
        """Restore only params + BN state from a checkpoint (inference/
        serving never carries optimizer state, so optimizer and schedule
        flags of the original run are irrelevant). Returns (state, step)."""
        from dgcnn_tpu.train import checkpoint

        loaded, step, _ = checkpoint.restore_subtrees(
            path, {"params": state.params, "model_state": state.model_state}
        )
        state = state._replace(
            params=jax.device_put(loaded["params"], self._repl_sharding),
            model_state=jax.device_put(
                loaded["model_state"], self._repl_sharding
            ),
        )
        return state, step

    # ---------------------------------------------------------- train step

    def _build_train_step(self):
        model, opt = self.model, self.opt
        axes = self._axes
        num_class = self.cfg.num_class
        cls_w = _class_weights_of(self.cfg)
        # under context parallelism BN stats must always merge over the
        # points axis (a point shard is not a meaningful statistics unit);
        # the data axis merges only with sync-BN on
        if self.cfg.bn_sync:
            bn_axis = axes
        elif self._cp:
            bn_axis = (POINT_AXIS,)
        else:
            bn_axis = None

        def device_step(params, mstate, opt_state, step, rng, points, labels, weights, mask):
            lin_idx = (
                jax.lax.axis_index(DATA_AXIS) * jax.lax.axis_size(POINT_AXIS)
                + jax.lax.axis_index(POINT_AXIS)
            )
            dev_rng = jax.random.fold_in(jax.random.fold_in(rng, step), lin_idx)

            def loss_fn(p):
                logits, new_mstate = model.apply(
                    p, mstate, points, mask, train=True, rng=dev_rng,
                    bn_axis=bn_axis,
                )
                logp = jax.nn.log_softmax(logits, axis=-1)
                ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
                w = weights * mask.astype(logits.dtype)
                if cls_w is not None:
                    # class-level weights (imbalanced shower/track data)
                    # COMPOSE with the per-point weights from the file
                    w = w * cls_w[labels]
                # exact global weighted mean: device-count invariant
                loss_sum = jax.lax.psum(-jnp.sum(ll * w), axes)
                w_sum = jax.lax.psum(jnp.sum(w), axes)
                loss = loss_sum / jnp.maximum(w_sum, 1e-9)
                pred = jnp.argmax(logits, axis=-1)
                correct = jnp.sum((pred == labels) * mask)
                nvalid = jnp.sum(mask)
                # per-class counts for the report line (reference prints
                # per-class/nonzero accuracies at report steps [M per
                # SURVEY.md §0.6 #8])
                cls = jnp.arange(num_class, dtype=jnp.int32)
                is_cls = (labels[..., None] == cls) & mask[..., None]
                cls_total = jnp.sum(is_cls, axis=tuple(range(labels.ndim)))
                cls_correct = jnp.sum(
                    is_cls & (pred == labels)[..., None],
                    axis=tuple(range(labels.ndim)),
                )
                return loss, (new_mstate, correct, nvalid, cls_correct, cls_total)

            (loss, (new_mstate, correct, nvalid, cls_correct, cls_total)), grads = (
                jax.value_and_grad(loss_fn, has_aux=True)(params)
            )
            # params are replicated (unvarying) inputs, so shard_map's AD
            # inserts the cross-device psum itself: `grads` is already the
            # full global gradient on every device (the tower-average
            # analog). A manual psum here would multiply it by the device
            # count.
            updates, new_opt_state = opt.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            # per-replica batch norm in fwd; running stats synced
            new_mstate = jax.tree_util.tree_map(
                lambda s: jax.lax.pmean(s, axes), new_mstate
            )
            acc = jax.lax.psum(correct, axes) / jnp.maximum(
                jax.lax.psum(nvalid, axes), 1.0
            )
            cls_acc = jax.lax.psum(cls_correct, axes) / jnp.maximum(
                jax.lax.psum(cls_total, axes), 1.0
            )
            metrics = {
                "loss": loss,
                "acc": acc.astype(jnp.float32),
                "class_acc": cls_acc.astype(jnp.float32),
            }
            return new_params, new_mstate, new_opt_state, step + 1, rng, metrics

        bspec = self._batch_spec
        smapped = jax.shard_map(
            device_step,
            mesh=self.mesh,
            in_specs=(P(), P(), P(), P(), P(), bspec, bspec, bspec, bspec),
            out_specs=(P(), P(), P(), P(), P(), P()),
        )
        if self._banded_cp:
            # banded CP: Morton-sort the GLOBAL batch before shard_map so
            # every device owns a contiguous sorted band (the model is
            # built pre_sorted). Loss/metrics/BN are permutation-invariant
            # given the consistently permuted labels/weights/mask, so
            # nothing unpermutes on the train path.
            def sorted_step(
                params, mstate, opt_state, step, rng, points, labels, weights, mask
            ):
                points, labels, weights, mask = _sort_batch_global(
                    points, labels, weights, mask
                )[:4]
                return smapped(
                    params, mstate, opt_state, step, rng,
                    points, labels, weights, mask,
                )

            return jax.jit(sorted_step, donate_argnums=(0, 1, 2))
        return jax.jit(smapped, donate_argnums=(0, 1, 2))

    def train_step(self, state: TrainState, batch) -> tuple[TrainState, dict]:
        """One optimization step (reference `trainval.train_step` [M])."""
        points, labels, weights, mask = self._put_batch(batch)
        p, ms, os_, step, rng, metrics = self._train_step(
            state.params, state.model_state, state.opt_state, state.step,
            state.rng, points, labels, weights, mask,
        )
        return TrainState(p, ms, os_, step, rng), metrics

    # ----------------------------------------------------------- eval step

    def _build_eval_step(self, gather: bool = True):
        """``gather=True``: predictions all-gathered/replicated (write-back
        needs the whole batch host-addressable — multi-host inference
        collects on process 0). ``gather=False``: metrics only — the
        periodic validator consumes just loss/confusion, so it skips the
        prediction collectives entirely."""
        model = self.model
        num_class = self.cfg.num_class
        cls_w = _class_weights_of(self.cfg)

        axes = self._axes

        def device_eval(params, mstate, points, labels, weights, mask):
            logits, _ = model.apply(params, mstate, points, mask, train=False)
            pred = jnp.argmax(logits, axis=-1)
            logp = jax.nn.log_softmax(logits, axis=-1)
            ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
            w = weights * mask.astype(logits.dtype)
            if cls_w is not None:
                # same objective as training: val_loss drives early
                # stopping, so it must watch the class-WEIGHTED loss
                w = w * cls_w[labels]
            loss_sum = jax.lax.psum(-jnp.sum(ll * w), axes)
            w_sum = jax.lax.psum(jnp.sum(w), axes)
            cls = jnp.arange(num_class, dtype=jnp.int32)
            m = mask.reshape(-1).astype(jnp.float32)
            t1h = (labels.reshape(-1)[:, None] == cls).astype(jnp.float32) * m[:, None]
            p1h = (pred.reshape(-1)[:, None] == cls).astype(jnp.float32)
            cm = jax.lax.psum(t1h.T @ p1h, axes)
            loss = loss_sum / jnp.maximum(w_sum, 1e-9)
            if not gather:
                return loss, w_sum, cm
            scores = jax.nn.softmax(logits, axis=-1)
            # pack scores + prediction + the (already-psum'd) loss into
            # ONE gathered f32 array: the device->host hop through the
            # axon tunnel costs ~45 ms per transfer regardless of size
            # at these shapes, so the serving loop fetches a single
            # (B, N, C+2) array instead of three.  Packed in f32 even
            # for bf16 models: f32 holds class indices exactly up to
            # 2^24 (bf16 would silently round above 256) and the
            # reported per-batch loss keeps full precision; the widening
            # cast of bf16 scores is exact.
            loss_lane = jnp.broadcast_to(
                loss.astype(jnp.float32)[None, None], pred.shape
            )
            packed = jnp.concatenate(
                [
                    scores.astype(jnp.float32),
                    pred.astype(jnp.float32)[..., None],
                    loss_lane[..., None],
                ],
                axis=-1,
            )
            packed = jax.lax.all_gather(packed, DATA_AXIS, axis=0, tiled=True)
            packed = jax.lax.all_gather(packed, POINT_AXIS, axis=1, tiled=True)
            return packed, loss, w_sum, cm

        bspec = self._batch_spec
        out_specs = (P(), P(), P(), P()) if gather else (P(), P(), P())
        smapped = jax.shard_map(
            device_eval,
            mesh=self.mesh,
            in_specs=(P(), P(), bspec, bspec, bspec, bspec),
            out_specs=out_specs,
            # the tiled all_gathers above make every output replicated,
            # but the static vma checker cannot infer that for gathered
            # values — replication is asserted by the multi-host tests
            check_vma=not gather,
        )
        if self._banded_cp:
            # banded CP: sort globally before shard_map; the gathered
            # packed scores/predictions come back in SORTED order and are
            # unpermuted here so write-back sees the caller's point order.
            # Loss/confusion are permutation-invariant.
            def sorted_eval(params, mstate, points, labels, weights, mask):
                points, labels, weights, mask, pos = _sort_batch_global(
                    points, labels, weights, mask
                )
                out = smapped(params, mstate, points, labels, weights, mask)
                if not gather:
                    return out
                packed, loss, w_sum, cm = out
                packed = jnp.take_along_axis(packed, pos[..., None], axis=-2)
                return packed, loss, w_sum, cm

            return jax.jit(sorted_eval)
        return jax.jit(smapped)

    def inference_packed(self, state: TrainState, batch):
        """Eval-mode forward returning the PACKED device array.

        Returns ``(packed (B,N,C+2), metrics)`` where ``packed[..., :C]``
        are softmax scores, ``packed[..., C]`` the argmax prediction and
        ``packed[..., C+1]`` the (scalar, broadcast) batch loss — all
        f32. The serving loop uses this to pay ONE device->host transfer
        per batch instead of three.
        """
        points, labels, weights, mask = self._put_batch(batch)
        packed, loss, w_sum, cm = self._eval_step(
            state.params, state.model_state, points, labels, weights, mask
        )
        return packed, {"loss": loss, "loss_weight": w_sum, "confusion": cm}

    def inference(self, state: TrainState, batch):
        """Forward pass in eval mode (reference `trainval.inference` [M]).

        Returns (scores (B,N,C), pred (B,N), metrics dict incl. confusion
        matrix) — per-point softmax scores for write-back.
        """
        packed, metrics = self.inference_packed(state, batch)
        scores = packed[..., : self.cfg.num_class]
        pred = packed[..., self.cfg.num_class].astype(jnp.int32)
        return scores, pred, metrics

    def evaluate(self, state: TrainState, batch) -> dict:
        """Metrics-only eval (loss/confusion) — no prediction gathers; what
        the periodic validator should call (it discards predictions)."""
        points, labels, weights, mask = self._put_batch(batch)
        loss, w_sum, cm = self._metrics_step(
            state.params, state.model_state, points, labels, weights, mask
        )
        return {"loss": loss, "loss_weight": w_sum, "confusion": cm}

    # ------------------------------------------------------------- helpers

    def _put_batch(self, batch):
        if isinstance(batch, Batch):
            points, labels, mask = batch.points, batch.labels, batch.mask
            weights = batch.weights
        else:
            points, labels, weights, mask = batch
        if weights is None:
            weights = np.ones(labels.shape, np.float32)
        def _presharded(x):
            return isinstance(x, jax.Array) and x.sharding.is_equivalent_to(
                self._batch_sharding, x.ndim
            )

        if all(_presharded(x) for x in (points, labels, weights, mask)):
            # caller already built correctly-sharded global arrays for
            # ALL FOUR batch parts (e.g. the multi-host CP tests, whose
            # cross-process point shards don't fit
            # make_array_from_process_local_data's contiguous
            # per-process-rows assumption); a partial set falls through
            # to the normal placement + dtype normalization
            return points, labels, weights, mask
        if jax.process_count() > 1:
            # each process holds its share of the global batch; assemble
            # global jax.Arrays across hosts (addressable shards only)
            def put(x):
                return jax.make_array_from_process_local_data(
                    self._batch_sharding, np.asarray(x)
                )
        else:
            def put(x):
                return jax.device_put(np.asarray(x), self._batch_sharding)
        return (
            put(points.astype(np.float32)),
            put(labels.astype(np.int32)),
            put(weights.astype(np.float32)),
            put(mask),
        )


def _sort_batch_global(points, labels, weights, mask):
    """Morton-sort every event of a GLOBAL batch (banded CP entry sort).

    Same `ops.sfc.morton_order` as the single-device banded model's entry
    permute — so the sorted point rows, and therefore every per-row value
    downstream, are bitwise identical between the two paths. Runs on the
    global (B, N, …) arrays OUTSIDE shard_map (XLA partitions the sort
    and the permuting gathers across the mesh); labels/weights/mask are
    permuted consistently so the masked loss and metrics are unchanged.

    Returns (points, labels, weights, mask, pos) — ``pos`` is the inverse
    permutation (original row j sits at sorted position pos[j]), used by
    the eval path to unpermute gathered predictions for write-back.
    """
    order, pos = morton_order(points, mask)
    return (
        jnp.take_along_axis(points, order[..., None], axis=-2),
        jnp.take_along_axis(labels, order, axis=-1),
        jnp.take_along_axis(weights, order, axis=-1),
        jnp.take_along_axis(mask, order, axis=-1),
        pos,
    )


def _make_lr(cfg):
    """Learning-rate schedule (constant matches the reference)."""
    kind = getattr(cfg, "lr_schedule", "constant")
    base = cfg.learning_rate
    horizon = getattr(cfg, "lr_decay_steps", 0) or max(cfg.iteration, 1)
    if kind == "constant":
        return base
    if kind == "cosine":
        return optax.cosine_decay_schedule(base, decay_steps=horizon)
    if kind == "step":
        return optax.exponential_decay(
            base,
            transition_steps=horizon,
            decay_rate=getattr(cfg, "lr_decay_rate", 0.5),
            staircase=True,
        )
    raise ValueError(f"unknown lr_schedule {kind!r}")


def _class_weights_of(cfg):
    """(num_class,) f32 array from --class_weights, or None when unset."""
    cw = getattr(cfg, "class_weights", None)
    if not cw:
        return None
    return jnp.asarray(tuple(cw), jnp.float32)


def _make_optimizer(name: str, lr, grad_clip: float = 0.0):
    """Reference uses Adam [H per SURVEY.md §2 #4]; others for experiments.

    ``grad_clip > 0`` prepends global-norm clipping — outlier events
    (huge energy depositions) can spike per-batch gradients in physics
    data, and clipping is the standard guard."""
    if name == "adam":
        opt = optax.adam(lr)
    elif name == "adamw":
        opt = optax.adamw(lr)
    elif name == "sgd":
        opt = optax.sgd(lr)
    elif name == "momentum":
        opt = optax.sgd(lr, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if grad_clip and grad_clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    return opt


def _maybe_pallas_knn(knn_precision: str = "highest", knn_window: int = 0):
    """Fused Pallas kNN on TPU backends; None (jnp oracle) elsewhere —
    interpret-mode emulation off-TPU is orders of magnitude slower than
    lax.top_k and must never be a silent default. With ``knn_window > 0``
    returns the banded kernel (`kernels.knn_banded`) — the model permutes
    points to SFC order before calling it."""
    import functools

    import jax as _jax

    if _jax.default_backend() not in ("tpu", "axon"):
        return None
    try:
        prec = {
            "highest": _jax.lax.Precision.HIGHEST,
            "default": _jax.lax.Precision.DEFAULT,
        }[knn_precision]
        if knn_window > 0:
            from dgcnn_tpu.kernels.knn_banded import knn_pallas_banded

            return functools.partial(
                knn_pallas_banded, window=knn_window, precision=prec
            )
        from dgcnn_tpu.kernels.knn_pallas import knn_pallas

        return functools.partial(knn_pallas, precision=prec)
    except ImportError:
        return None
