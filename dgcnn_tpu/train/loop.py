"""Driver loops — the reference's `main_funcs.train/inference` equivalent
[M names / H behavior per SURVEY.md §3.1-3.2]: iteration loop over the IO
prefetch buffer, report/checkpoint cadence, CSV/stdout logging, and the
inference write-back path.
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from dgcnn_tpu.io import BucketBatcher, SegmentWriter, io_factory, prefetch
from dgcnn_tpu.ops.loss import mean_iou, per_class_accuracy
from dgcnn_tpu.train import checkpoint
from dgcnn_tpu.train.logging import Reporter, maybe_start_profiler, maybe_stop_profiler
from dgcnn_tpu.train.trainval import Trainval

# Flush the on-device f32 confusion accumulator to host f64 once this
# many points have been accumulated: a single cell can gain at most one
# count per point, and 2^23 leaves 2x headroom under f32's 2^24 integer
# exactness bound. Module-level so tests can force frequent flushes.
_CM_FLUSH_POINTS = 1 << 23


def _flatten_metrics(metrics: dict) -> dict:
    """Expand vector metrics (per-class accuracy) into scalar columns."""
    out = {}
    for k, v in metrics.items():
        arr = np.asarray(v)
        if arr.ndim == 0:
            out[k] = float(arr)
        else:
            for i, x in enumerate(arr.ravel()):
                out[f"{k}{i}"] = float(x)
    return out


def _build_io(cfg, shuffle: bool, subset: bool = True):
    """Reader + batcher. ``subset=True`` (training): each process reads
    its own contiguous event slice and assembles its share of the global
    minibatch. ``subset=False`` (inference): every process reads the full
    file and iterates the identical batch sequence — shape and batch-count
    synchronization across hosts is then automatic, and each process
    feeds its device rows from its slice of the global batch."""
    io = io_factory(cfg).initialize()
    batch_size = cfg.minibatch_size
    # epoch accounting uses the GLOBAL event count — capture it before any
    # per-host SubsetIO wrap (per-host counts would inflate the reported
    # epoch by process_count)
    total_events = io.num_events()
    nproc = jax.process_count()
    if nproc > 1 and subset:
        # multi-host: each process reads its own contiguous event slice
        # and assembles its share of the GLOBAL minibatch; the arrays are
        # joined into global jax.Arrays in Trainval._put_batch
        from dgcnn_tpu.io.readers import SubsetIO
        from dgcnn_tpu.utils.distributed import host_event_range

        if cfg.minibatch_size % nproc:
            raise ValueError(
                f"minibatch_size={cfg.minibatch_size} not divisible by "
                f"process_count={nproc}"
            )
        if cfg.num_point <= 0:
            raise ValueError(
                "multi-host training requires --num_point (all hosts must "
                "assemble identically-shaped batches; dynamic bucketing "
                "would desynchronize shapes across processes)"
            )
        lo, hi = host_event_range(io.num_events())
        io = SubsetIO(io, lo, hi).initialize()
        batch_size = cfg.minibatch_size // nproc
    batcher = BucketBatcher(
        io,
        batch_size=batch_size,
        buckets=cfg.buckets,
        num_point=cfg.num_point,
        shuffle=shuffle,
        seed=cfg.seed,
        crop_mode=getattr(cfg, "crop_mode", "random"),
    )
    in_dim = io.read_event(0).points.shape[1]
    return io, batcher, in_dim, total_events


def _make_validator(cfg, tv):
    """Periodic held-out evaluation (beyond the reference, which reports
    train-batch metrics only): returns a callable state -> metrics dict."""
    if not cfg.val_file:
        return None
    import dataclasses

    # the validation file's FORMAT follows its own extension, not the
    # training io_type — `-io dgb -vf val.h5` is a perfectly reasonable
    # pairing and previously died with "not a DGB file"
    from dgcnn_tpu.io.readers import kind_of_path

    val_cfg = dataclasses.replace(
        cfg,
        input_file=cfg.val_file,
        io_type=kind_of_path(cfg.val_file, default=cfg.io_type),
    )
    val_io = io_factory(val_cfg).initialize()
    val_batcher = BucketBatcher(
        val_io,
        batch_size=cfg.minibatch_size,
        buckets=cfg.buckets,
        num_point=cfg.num_point,
        shuffle=False,
        seed=cfg.seed,
        crop_mode=getattr(cfg, "crop_mode", "random"),
    )

    nproc, pid = jax.process_count(), jax.process_index()

    def validate(state):
        cm = np.zeros((cfg.num_class, cfg.num_class), np.float64)
        loss_sum = w_sum = 0.0
        for i, batch in enumerate(val_batcher.epoch()):
            if cfg.val_batches and i >= cfg.val_batches:
                break
            # every host reads the full val file (identical batches);
            # compute on this host's row slice of each global batch.
            # metrics-only step: no prediction gathers on the train path
            local = batch if nproc == 1 else _local_batch_rows(batch, pid, nproc)
            m = tv.evaluate(state, local)
            cm += np.asarray(m["confusion"], np.float64)
            # weight each batch's mean loss by its valid-point mass so
            # val_loss is a true per-point mean across buckets
            w = float(m.get("loss_weight", 1.0))
            loss_sum += float(m["loss"]) * w
            w_sum += w
        acc = float(np.trace(cm) / max(cm.sum(), 1.0))
        return {
            "val_loss": loss_sum / max(w_sum, 1e-9),
            "val_acc": acc,
            "val_miou": float(mean_iou(cm)),
        }

    return validate


class _GracefulStop:
    """SIGTERM/SIGINT → finish the current step, checkpoint, exit cleanly
    (TPU preemption workflow; pairs with --auto_resume)."""

    def __init__(self):
        self.stop = False
        self._installed = []

    def install(self):
        import signal

        def handler(signum, frame):
            # flag FIRST; then async-signal-safe os.write (print() can hit
            # 'reentrant call' if the signal lands inside another print,
            # and an exception here would skip the preemption checkpoint)
            self.stop = True
            try:
                os.write(
                    2,
                    f"received signal {signum}: checkpointing and "
                    f"stopping (repeat to abort immediately)\n".encode(),
                )
            except OSError:
                pass
            # a second signal must still be able to kill a hung/compiling
            # run (flag is only polled between steps): restore originals
            self.uninstall()

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._installed.append((sig, signal.signal(sig, handler)))
            except ValueError:  # non-main thread (tests) — skip
                pass
        return self

    def uninstall(self):
        import signal

        for sig, old in self._installed:
            try:
                signal.signal(sig, old)
            except ValueError:
                pass
        self._installed = []


def train(cfg) -> dict:
    """Train per the flag surface; returns final metrics (for tests)."""
    io, batcher, in_dim, total_events = _build_io(cfg, shuffle=cfg.shuffle)
    tv = Trainval(cfg)
    state = tv.initialize(in_dim)
    validator = _make_validator(cfg, tv)
    start_step = 0
    restore_from = cfg.model_path
    if not restore_from and getattr(cfg, "auto_resume", False):
        restore_from = checkpoint.latest(cfg.weight_prefix) or ""
    if restore_from:
        state, start_step, saved_cfg = checkpoint.restore(restore_from, state)
        diffs = checkpoint.model_flag_diffs(cfg, saved_cfg or {})
        if diffs:
            # a resume may legitimately change shape-invariant model
            # flags (e.g. fine-tune with a different k) — but never
            # silently: the trajectory will differ from the original run
            print(
                "WARNING: model flags differ from the checkpoint "
                + ", ".join(
                    f"{k}: now {cur!r}, trained with {sav!r}"
                    for k, (cur, sav) in sorted(diffs.items())
                ),
                flush=True,
            )
        state = state._replace(step=jax.numpy.asarray(start_step, jax.numpy.int32))
        # fold the resume step into the shuffle seed: a resumed run must
        # continue with a fresh batch order, not re-train on the epoch's
        # first batches again (round-1 ADVICE)
        batcher.reseed(cfg.seed + start_step)
        print(f"restored checkpoint at step {start_step}", flush=True)
    if jax.process_count() > 1:
        # every host must resume at the SAME step: checkpoints are written
        # by process 0 only, so a host-local (non-shared) weight_prefix
        # would make hosts disagree on start_step — host 0 then finishes
        # its loop early and the others hang in the next all-reduce. Fail
        # loudly instead.
        from jax.experimental import multihost_utils

        # all-gather, not broadcast: EVERY process (including 0, whose
        # local view can be the one that is ahead) must see the mismatch
        # and raise — if only the behind hosts died, process 0 would
        # enter the loop and hang in its first all-reduce
        all_steps = np.asarray(
            multihost_utils.process_allgather(np.int32(start_step))
        ).reshape(-1)
        if len(set(int(x) for x in all_steps)) > 1:
            raise RuntimeError(
                f"resume step mismatch across hosts (per-process steps "
                f"{[int(x) for x in all_steps]}): weight_prefix must point "
                f"at a SHARED filesystem so every host restores the "
                f"checkpoint process 0 wrote"
            )

    # metrics are global (psum) — only process 0 reports/logs (concurrent
    # CSV writers on a shared filesystem would interleave)
    reporter = (
        Reporter(
            cfg.log_dir, "train", tensorboard=cfg.tensorboard,
            append=start_step > 0, start_iter=start_step,
        )
        if jax.process_index() == 0
        else None
    )
    prof = maybe_start_profiler(cfg.profile_dir)
    events_per_epoch = max(total_events, 1)
    metrics = {}
    it = start_step
    batches = batcher.forever()
    if getattr(cfg, "augment", False):
        from dgcnn_tpu.io.augment import augment_stream

        # counter keyed off the resume step so a resumed run doesn't
        # replay the same augmentations
        batches = augment_stream(batches, cfg.seed + start_step)
    stream = prefetch(batches, cfg.prefetch)
    stopper = _GracefulStop().install()
    nproc = jax.process_count()

    patience = int(getattr(cfg, "early_stop_patience", 0) or 0)
    best_val, stale = float("inf"), 0
    early_stopped = False

    def agreed_stop() -> bool:
        # multi-host: a signal lands on ONE process (and an early-stop
        # decision could in principle diverge); if any host broke out
        # unilaterally the others would hang in the next all-reduce.
        # Agree on ONE combined flag every iteration (a 1-int DCN
        # allgather — negligible next to a multi-host step) so all hosts
        # stop at the same iteration or none do.
        if nproc == 1:
            return stopper.stop or early_stopped
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.int32(1 if (stopper.stop or early_stopped) else 0)
        )
        return bool(np.asarray(flags).any())

    try:
        for batch in stream:
            if it >= cfg.iteration or agreed_stop():
                break
            state, metrics = tv.train_step(state, batch)
            it += 1
            if it % cfg.report_step == 0 or it == cfg.iteration or cfg.debug:
                epoch = it * cfg.minibatch_size / events_per_epoch
                row = _flatten_metrics(metrics)
                # the step just taken was update number it-1 (optax
                # schedules are indexed by prior-update count), so report
                # the rate that was actually applied, not the next one
                row["lr"] = tv.lr_at(it - 1)
                if validator is not None:
                    row.update(validator(state))
                    if patience and "val_loss" in row:
                        # val metrics are identical on every host (same
                        # data, collective reductions), so this decision
                        # is multi-host consistent without a broadcast
                        if row["val_loss"] < best_val:
                            best_val, stale = row["val_loss"], 0
                        else:
                            stale += 1
                            if stale >= patience:
                                early_stopped = True
                                print(
                                    f"early stop at iter {it}: val_loss "
                                    f"has not improved for {stale} "
                                    f"validations (best {best_val:.4f})",
                                    flush=True,
                                )
                if reporter is not None:
                    reporter.report(it, epoch, row)
            # multi-host: only process 0 writes (state is replicated, and
            # concurrent writers to the same {path}.tmp on a shared
            # filesystem could interleave into a torn checkpoint)
            if cfg.checkpoint_step and it % cfg.checkpoint_step == 0:
                if jax.process_index() == 0:
                    checkpoint.save(cfg.weight_prefix, it, state, vars(cfg))
                    checkpoint.prune(
                        cfg.weight_prefix, getattr(cfg, "max_to_keep", 0)
                    )
        if jax.process_index() == 0:
            path = checkpoint.save(cfg.weight_prefix, it, state, vars(cfg))
            checkpoint.prune(cfg.weight_prefix, getattr(cfg, "max_to_keep", 0))
            print(f"saved final checkpoint {path}", flush=True)
    finally:
        stopper.uninstall()
        # stop + join the prefetch worker BEFORE tearing down the reader
        # (a DGB munmap under a mid-copy worker is a use-after-unmap)
        stream.close()
        maybe_stop_profiler(prof)
        if reporter is not None:
            reporter.close()
        io.finalize()
    return _flatten_metrics(metrics)


def _local_batch_rows(batch, pid: int, nproc: int):
    """This process's contiguous row slice of a global batch (multi-host
    inference: every host builds the same global batch; compute feeds each
    host its device rows)."""
    import dataclasses

    b = batch.points.shape[0]
    lb = b // nproc
    lo, hi = pid * lb, (pid + 1) * lb
    return dataclasses.replace(
        batch,
        points=batch.points[lo:hi],
        labels=batch.labels[lo:hi],
        weights=None if batch.weights is None else batch.weights[lo:hi],
        mask=batch.mask[lo:hi],
        event_ids=batch.event_ids[lo:hi],
        lengths=batch.lengths[lo:hi],
    )


def inference(cfg) -> dict:
    """Inference + per-event prediction write-back; returns summary metrics.

    Multi-host: every process iterates the full input file (identical
    batch sequence — no cross-host shape drift), computes on its slice of
    each global batch, and the eval step all-gathers predictions so
    process 0 holds every event for write-back.
    """
    nproc, pid = jax.process_count(), jax.process_index()
    if not cfg.model_path:
        raise ValueError("inference requires --model_path")
    # the served function must BE the trained function: adopt the
    # checkpoint's model-defining flags (kvalue, knn_every, widths, ...)
    # so predictions cannot silently diverge when a flag isn't repeated
    cfg = checkpoint.adopt_model_flags(cfg, cfg.model_path)
    io, batcher, in_dim, _ = _build_io(cfg, shuffle=False, subset=False)
    if nproc > 1 and cfg.minibatch_size % nproc:
        raise ValueError(
            f"minibatch_size={cfg.minibatch_size} not divisible by "
            f"process_count={nproc}"
        )
    tv = Trainval(cfg)
    state = tv.initialize(in_dim)
    # params + BN state only: inference never touches optimizer state,
    # and requiring optimizer/schedule flags to match the training run
    # just to predict would be hostile (export does the same)
    state, step = tv.restore_for_eval(state, cfg.model_path)
    print(f"restored checkpoint at step {step}", flush=True)

    is_lead = pid == 0
    writer = SegmentWriter(cfg.output_file) if cfg.output_file and is_lead else None
    reporter = Reporter(cfg.log_dir, "inference", tensorboard=cfg.tensorboard) if is_lead else None
    cm_total = np.zeros((cfg.num_class, cfg.num_class), np.float64)
    n_batches = 0
    t0 = time.perf_counter()
    stream = prefetch(batcher.epoch(), cfg.prefetch)

    nc = cfg.num_class
    cm_dev = None  # confusion accumulates ON DEVICE between flushes
    cm_pts = 0  # points accumulated since the last flush

    def consume(pending):
        """Host-side half of one batch: transfer, write-back, report.
        One packed f32 device->host transfer carries scores, predictions
        AND the batch loss (each hop through the axon tunnel costs
        ~45 ms at these shapes); the confusion matrix never leaves the
        device until the accumulator flushes."""
        batch, packed, it = pending
        if writer is not None:
            arr = np.asarray(packed)
            scores_h = arr[..., :nc]
            pred_h = arr[..., nc].astype(np.int32)
            loss = float(arr[0, 0, nc + 1])
            for i, eid in enumerate(batch.event_ids):
                n_valid = int(batch.mask[i].sum())
                writer.store_segment(
                    int(eid),
                    batch.points[i, :n_valid],
                    pred_h[i, :n_valid],
                    scores_h[i, :n_valid],
                )
        else:
            # no write-back on this host (non-lead process, or no
            # --output_file): still pay a TINY per-batch transfer so
            # device dispatch stays paced — without it the bounded
            # queue provides no backpressure and hundreds of staged
            # inputs + gathered outputs could pile up in HBM
            loss = float(np.asarray(packed[0, 0, nc + 1]))
        if reporter is not None:
            reporter.report(it, 0.0, {"loss": loss})

    # The host half runs on ONE worker thread behind a small bounded
    # queue, so batch i+1's device compute, batch i's tunnel transfer and
    # batch i-1's writer/report work all overlap (the transfer releases
    # the GIL). On error the worker records it and drains — it never
    # blocks the producer — and the loop re-raises promptly. FIFO order
    # preserves the writer's first-write-wins and report-line ordering.
    import queue as _queue
    import threading as _threading

    work = _queue.Queue(maxsize=3)
    errs = []

    def _worker():
        while True:
            item = work.get()
            try:
                if item is None:
                    return
                if not errs:
                    consume(item)
            except BaseException as e:  # surfaced by the main thread
                errs.append(e)
            finally:
                work.task_done()

    worker = _threading.Thread(
        target=_worker, name="inference-consume", daemon=True
    )
    worker.start()
    try:
        for batch in stream:
            if cfg.iteration and n_batches >= cfg.iteration:
                break
            if errs:
                break
            local = batch if nproc == 1 else _local_batch_rows(batch, pid, nproc)
            # eval outputs are all-gathered/replicated: full global batch
            packed, metrics = tv.inference_packed(state, local)
            cm = metrics["confusion"]
            cm_dev = cm if cm_dev is None else cm_dev + cm
            cm_pts += batch.points.shape[0] * batch.points.shape[1]
            n_batches += 1
            if cm_pts >= _CM_FLUSH_POINTS:
                # flush the f32 device accumulator into host f64 before
                # any cell could approach 2^24 (f32 integer exactness):
                # one batch adds at most B*N counts to a single cell,
                # so the flush cadence must scale with B*N
                cm_total += np.asarray(cm_dev, np.float64)
                cm_dev = None
                cm_pts = 0
            work.put((batch, packed, n_batches))
    finally:
        work.put(None)
        worker.join()
        stream.close()
        if cm_dev is not None:
            cm_total += np.asarray(cm_dev, np.float64)
        if reporter is not None:
            reporter.close()
        io.finalize()
    if errs:
        # re-raised OUTSIDE the finally so a loop-body exception is
        # never masked by the worker's
        raise errs[0]
    if writer is not None:
        writer.finalize()
        print(f"wrote {len(writer)} events -> {cfg.output_file}", flush=True)

    acc = float(np.trace(cm_total) / max(cm_total.sum(), 1.0))
    miou = float(mean_iou(cm_total))
    pca = np.asarray(per_class_accuracy(cm_total))
    dt = time.perf_counter() - t0
    if is_lead:
        print(
            f"inference: {n_batches} batches in {dt:.2f}s  acc={acc:.4f} "
            f"mIoU={miou:.4f} per-class={np.round(pca, 4).tolist()}",
            flush=True,
        )
    return {"acc": acc, "miou": miou, "batches": n_batches}
