"""Worker process for the two-process multi-host tests (not a test file).

Usage: python multihost_worker.py <pid> <nproc> <port> <workdir> [mode]

``mode`` defaults to "all" (parts A+B). mode="stoptest" instead runs an
effectively-unbounded train() so the parent can SIGTERM ONE process and
assert the whole pair stops together (the per-iteration agreed-stop
allgather) instead of the un-signaled process hanging in a collective.

Configures a 4-CPU-device backend, joins a gloo-backed jax.distributed
pair, then:
  A) trainval-level: 3 train steps on ONE fixed global batch (each process
     feeds its local rows) — losses must match the single-process run of
     the same batch bit-closely (device/process-count invariance);
  B) loop-level: `train()` over per-host SubsetIO slices + checkpoint,
     then multi-host `inference()` with write-back gathered on process 0.
Results are printed as one JSON line prefixed RESULT: .
"""

import json
import os
import sys

pid, nproc, port, workdir = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)
mode = sys.argv[5] if len(sys.argv) > 5 else "all"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc and jax.device_count() == 4 * nproc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dgcnn_tpu.config import Config
from dgcnn_tpu.io import BucketBatcher, SyntheticIO
from dgcnn_tpu.train.loop import _local_batch_rows, inference, train
from dgcnn_tpu.train.trainval import Trainval

SMALL = dict(
    io_type="synthetic",
    num_class=2,
    kvalue=6,
    edge_filters=(8, 8),
    head_feat_dim=16,
    head_mlp=(16,),
    minibatch_size=8,
    num_point=256,
    use_pallas=False,
    precision="highest",
    seed=11,
)

out = {"pid": pid}

if mode == "stoptest":
    # ---- C: one SIGTERM must stop EVERY process at the same iteration
    prefix = os.path.join(workdir, "w", "s")
    cfg_stop = Config(
        command="train", iteration=100000, report_step=2,
        checkpoint_step=0, weight_prefix=prefix,
        log_dir=os.path.join(workdir, f"log{pid}"), shuffle=False, **SMALL,
    )
    train(cfg_stop)
    print("RESULT:" + json.dumps({"pid": pid, "stopped": True}), flush=True)
    sys.exit(0)

if mode in ("cp", "banded_cp"):
    # ---- D: context parallelism ACROSS the process boundary -------------
    # (data=2, points=2) mesh whose points pairs interleave one device
    # from each process, so the ring kNN / ring gather / BN-psum
    # collectives cross hosts (VERDICT r2 #6). Global batches are built
    # with make_array_from_callback: the cross-process point shards are
    # not contiguous per-process rows, which is what
    # make_array_from_process_local_data assumes.
    # mode="banded_cp" runs the same topology through the banded halo
    # path (--knn_window): the global entry Morton sort and the W-row
    # halo ppermutes (kernels.halo_knn) cross the process boundary.
    from dgcnn_tpu.parallel.mesh import make_mesh

    devs = jax.devices()  # ordered proc0:0-3, proc1:4-7
    order = [devs[0], devs[4], devs[1], devs[5]]
    mesh = make_mesh(4, num_point_shards=2, devices=order)
    cfg_cp = Config(
        command="train", iteration=3, point_shards=2,
        knn_window=64 if mode == "banded_cp" else 0,
        **{**SMALL, "minibatch_size": 2},
    )
    tv = Trainval(cfg_cp, mesh=mesh)
    state = tv.initialize(in_dim=4)
    io = SyntheticIO(num_events=2, num_point=256, seed=3).initialize()
    batch = next(BucketBatcher(io, 2, num_point=256, shuffle=False).epoch())

    def put_global(x, dtype):
        x = np.asarray(x, dtype)
        return jax.make_array_from_callback(
            x.shape, tv._batch_sharding, lambda i: x[i]
        )

    dev_batch = (
        put_global(batch.points, np.float32),
        put_global(batch.labels, np.int32),
        put_global(np.ones(batch.labels.shape), np.float32),
        put_global(batch.mask, bool),
    )
    losses = []
    for _ in range(3):
        state, metrics = tv.train_step(state, dev_batch)
        losses.append(float(metrics["loss"]))
    print("RESULT:" + json.dumps({"pid": pid, "losses": losses}), flush=True)
    sys.exit(0)

# ---- A: fixed-global-batch trainval invariance ---------------------------
cfg = Config(command="train", iteration=3, **SMALL)
io = SyntheticIO(num_events=8, num_point=256, seed=3).initialize()
batch = next(BucketBatcher(io, 8, num_point=256, shuffle=False).epoch())
tv = Trainval(cfg)
state = tv.initialize(in_dim=4)
losses = []
for _ in range(3):
    state, metrics = tv.train_step(state, _local_batch_rows(batch, pid, nproc))
    losses.append(float(metrics["loss"]))
out["losses"] = losses
out["param_sum"] = float(
    sum(float(np.abs(np.asarray(x)).sum()) for x in jax.tree_util.tree_leaves(state.params))
)

# ---- B: loop-level train (SubsetIO) + multi-host inference write-back ----
prefix = os.path.join(workdir, "w", "s")
pred_path = os.path.join(workdir, "pred.npz")
cfg_train = Config(
    command="train", iteration=4, report_step=2, checkpoint_step=0,
    weight_prefix=prefix, log_dir=os.path.join(workdir, f"log{pid}"),
    shuffle=False, **SMALL,
)
m = train(cfg_train)
out["train_loss"] = m["loss"]

import jax.experimental.multihost_utils as mhu

mhu.sync_global_devices("after_train")  # proc 0 wrote the checkpoint
cfg_inf = Config(
    command="inference", iteration=0, model_path=prefix + "-4.ckpt",
    output_file=pred_path, log_dir=os.path.join(workdir, f"log{pid}"),
    shuffle=False, **SMALL,
)
inf = inference(cfg_inf)
out["inf_acc"] = inf["acc"]
out["inf_batches"] = inf["batches"]
print("RESULT:" + json.dumps(out), flush=True)
