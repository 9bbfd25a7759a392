"""Multi-host (2-process) training and inference — real jax.distributed
over gloo on CPU, exercising SubsetIO + host_event_range +
make_array_from_process_local_data + process-0 write-back (SURVEY.md §2.2
multi-host row; VERDICT round 1 next-step #4)."""

import json
import os
import subprocess
import sys
import time

import numpy as np
import pytest

from dgcnn_tpu.config import Config
from dgcnn_tpu.io import BucketBatcher, SyntheticIO
from dgcnn_tpu.train.trainval import Trainval

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multihost_worker.py")

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


@pytest.fixture(scope="module")
def two_proc_results(tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("mh"))
    # ask the OS for a free port (a pid-derived constant can collide
    # across concurrent pytest runs or other services)
    import socket

    with socket.socket() as _s:
        _s.bind(("127.0.0.1", 0))
        port = _s.getsockname()[1]
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), workdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=900)
        assert p.returncode == 0, (
            f"worker failed rc={p.returncode}\nstdout:\n{stdout}\nstderr:\n{stderr}"
        )
        line = [l for l in stdout.splitlines() if l.startswith("RESULT:")]
        assert line, f"no RESULT line in:\n{stdout}"
        outs.append(json.loads(line[0][len("RESULT:"):]))
    return workdir, outs


def test_two_process_matches_single_process(two_proc_results):
    """The fixed-global-batch loss trajectory of the 2-process run equals
    the single-process (8 local devices) run — process-count invariance
    of the global-mean loss and the gradient all-reduce."""
    _, outs = two_proc_results
    # both processes report identical global metrics
    np.testing.assert_allclose(outs[0]["losses"], outs[1]["losses"], rtol=1e-6)
    np.testing.assert_allclose(outs[0]["param_sum"], outs[1]["param_sum"], rtol=1e-6)

    # single-process reference on the same global batch (conftest gives
    # this process 8 CPU devices)
    cfg = Config(command="train", iteration=3, **SMALL)
    io = SyntheticIO(num_events=8, num_point=256, seed=3).initialize()
    batch = next(BucketBatcher(io, 8, num_point=256, shuffle=False).epoch())
    tv = Trainval(cfg)
    state = tv.initialize(in_dim=4)
    ref_losses = []
    for _ in range(3):
        state, metrics = tv.train_step(state, batch)
        ref_losses.append(float(metrics["loss"]))
    np.testing.assert_allclose(outs[0]["losses"], ref_losses, rtol=2e-5)


def test_multihost_inference_writeback_complete(two_proc_results):
    """Process 0's write-back file contains EVERY event of the input, with
    per-point predictions (multi-host inference gathers to process 0)."""
    workdir, outs = two_proc_results
    assert outs[0]["inf_batches"] == outs[1]["inf_batches"] > 0
    z = np.load(os.path.join(workdir, "pred.npz"), allow_pickle=True)
    offsets = z["offsets"]
    eids = z["event_ids"]
    # synthetic io for mb=8 generates max(8*8, 64) = 64 events
    assert len(eids) == 64 and set(eids.tolist()) == set(range(64))
    pred = z["prediction"]
    assert pred.shape[0] == offsets[-1] > 0
    assert np.isfinite(z["scores"]).all()


def test_multihost_train_loss_finite(two_proc_results):
    _, outs = two_proc_results
    assert np.isfinite(outs[0]["train_loss"])
    np.testing.assert_allclose(outs[0]["train_loss"], outs[1]["train_loss"], rtol=1e-6)


def test_sigterm_on_one_host_stops_the_pair(tmp_path):
    """Preemption signal lands on ONE process: the per-iteration
    agreed-stop allgather must bring BOTH processes out of the loop (a
    unilateral break would leave the other hanging in its next
    collective until the test timeout)."""
    import signal
    import socket

    with socket.socket() as _s:
        _s.bind(("127.0.0.1", 0))
        port = _s.getsockname()[1]
    workdir = str(tmp_path)
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", WORKER, str(i), "2", str(port), workdir,
             "stoptest"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    try:
        # wait until the PAIR is demonstrably inside the train loop —
        # report lines come from process 0 only (process 1 is silent by
        # design), so watch proc 0 but signal proc 1. The pipe is read
        # from a helper thread: a bare readline() blocks forever if the
        # worker goes silent, which would hang the suite instead of
        # failing with a message.
        import threading

        in_loop = threading.Event()

        def _watch():
            for line in procs[0].stdout:
                if line.startswith("iter "):
                    in_loop.set()
                    return

        watcher = threading.Thread(target=_watch, daemon=True)
        watcher.start()
        deadline = time.time() + 240
        while not in_loop.wait(timeout=2):
            assert procs[0].poll() is None, "worker 0 died before the loop"
            assert time.time() < deadline, "pair never reported iters"
        watcher.join(timeout=5)
        procs[1].send_signal(signal.SIGTERM)
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
        assert procs[0].returncode == 0, outs[0][-800:]
        assert procs[1].returncode == 0, outs[1][-800:]
        # process 0 never saw a signal yet exited cleanly via agreement,
        # saving the final checkpoint
        assert "saved final checkpoint" in outs[0], outs[0][-800:]
        assert '"stopped": true' in outs[0].lower(), outs[0][-300:]
        assert '"stopped": true' in outs[1].lower(), outs[1][-300:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()


def test_multihost_context_parallel_matches_single_process(tmp_path):
    """Ring collectives ACROSS the process boundary: a (data=2, points=2)
    mesh whose point pairs interleave devices from both processes must
    reproduce the single-process CP run's loss trajectory exactly
    (VERDICT r2 #6)."""
    import socket

    with socket.socket() as _s:
        _s.bind(("127.0.0.1", 0))
        port = _s.getsockname()[1]
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), str(tmp_path),
             "cp"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=900)
        assert p.returncode == 0, (
            f"worker failed rc={p.returncode}\nstdout:\n{stdout}\n"
            f"stderr:\n{stderr[-3000:]}"
        )
        line = [l for l in stdout.splitlines() if l.startswith("RESULT:")]
        assert line, f"no RESULT line in:\n{stdout}"
        outs.append(json.loads(line[0][len("RESULT:"):]))
    np.testing.assert_allclose(outs[0]["losses"], outs[1]["losses"], rtol=1e-6)

    # single-process reference: same (data=2, points=2) topology on this
    # process's own devices, same fixed batch
    from dgcnn_tpu.parallel.mesh import make_mesh

    cfg = Config(
        command="train", iteration=3, point_shards=2,
        **{**SMALL, "minibatch_size": 2},
    )
    tv = Trainval(cfg, mesh=make_mesh(4, num_point_shards=2))
    state = tv.initialize(in_dim=4)
    io = SyntheticIO(num_events=2, num_point=256, seed=3).initialize()
    batch = next(BucketBatcher(io, 2, num_point=256, shuffle=False).epoch())
    ref = []
    for _ in range(3):
        state, metrics = tv.train_step(state, batch)
        ref.append(float(metrics["loss"]))
    np.testing.assert_allclose(outs[0]["losses"], ref, rtol=2e-5)


def test_multihost_banded_cp_matches_single_process(tmp_path):
    """Banded halo exchange ACROSS the process boundary: the same
    interleaved (data=2, points=2) topology with --knn_window must
    reproduce the single-process banded-CP loss trajectory — the global
    entry Morton sort and the W-row halo ppermutes (kernels.halo_knn)
    cross hosts here."""
    import socket

    with socket.socket() as _s:
        _s.bind(("127.0.0.1", 0))
        port = _s.getsockname()[1]
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), str(tmp_path),
             "banded_cp"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=900)
        assert p.returncode == 0, (
            f"worker failed rc={p.returncode}\nstdout:\n{stdout}\n"
            f"stderr:\n{stderr[-3000:]}"
        )
        line = [l for l in stdout.splitlines() if l.startswith("RESULT:")]
        assert line, f"no RESULT line in:\n{stdout}"
        outs.append(json.loads(line[0][len("RESULT:"):]))
    np.testing.assert_allclose(outs[0]["losses"], outs[1]["losses"], rtol=1e-6)

    # single-process reference: same topology and window on this
    # process's own devices, same fixed batch
    from dgcnn_tpu.parallel.mesh import make_mesh

    cfg = Config(
        command="train", iteration=3, point_shards=2, knn_window=64,
        **{**SMALL, "minibatch_size": 2},
    )
    tv = Trainval(cfg, mesh=make_mesh(4, num_point_shards=2))
    state = tv.initialize(in_dim=4)
    io = SyntheticIO(num_events=2, num_point=256, seed=3).initialize()
    batch = next(BucketBatcher(io, 2, num_point=256, shuffle=False).epoch())
    ref = []
    for _ in range(3):
        state, metrics = tv.train_step(state, batch)
        ref.append(float(metrics["loss"]))
    np.testing.assert_allclose(outs[0]["losses"], ref, rtol=2e-5)
