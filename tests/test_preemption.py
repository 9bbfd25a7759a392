"""SIGTERM during training checkpoints and exits cleanly; auto-resume
continues — the preemption round-trip."""

import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from dgcnn_tpu.config import Config
from dgcnn_tpu.train.loop import train
cfg = Config(
    command="train", io_type="synthetic", num_class=2, kvalue=6,
    edge_filters=(8,), head_feat_dim=16, head_mlp=(16,), minibatch_size=4,
    num_point=128, iteration=100000, report_step=5, checkpoint_step=0,
    use_pallas=False, num_devices=1, seed=7,
    weight_prefix={prefix!r}, log_dir={logdir!r}, auto_resume=True,
)
print("READY", flush=True)
train(cfg)
print("CLEAN-EXIT", flush=True)
"""


def test_sigterm_checkpoints_and_resumes(tmp_path):
    prefix = str(tmp_path / "w/s")
    script = SCRIPT.format(repo=REPO, prefix=prefix, logdir=str(tmp_path / "log"))
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""}
    proc = subprocess.Popen(
        [sys.executable, "-u", "-c", script],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=env,
    )
    # wait for a few report lines, then preempt
    deadline = time.time() + 180
    lines = []
    while True:
        if time.time() > deadline:
            proc.kill()
            raise AssertionError(f"never reached iter 10: {lines[-5:]}")
        line = proc.stdout.readline()
        if line == "":
            if proc.poll() is not None:  # child died before producing
                raise AssertionError(
                    f"subprocess exited rc={proc.returncode}: {lines[-10:]}"
                )
            time.sleep(0.1)
            continue
        lines.append(line)
        if line.startswith("iter 10 "):
            break
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=120)
    assert "checkpointing and stopping" in out
    assert "saved final checkpoint" in out
    assert "CLEAN-EXIT" in out
    assert proc.returncode == 0
    import glob

    ckpts = glob.glob(prefix + "-*.ckpt")
    assert ckpts, "no checkpoint written on SIGTERM"

    # the resume half: a fresh run with auto_resume must CONTINUE from
    # the preemption checkpoint, not restart from step 0
    import dataclasses

    from dgcnn_tpu.train import checkpoint as _ckpt
    from dgcnn_tpu.train.loop import train as _train
    from dgcnn_tpu.config import Config as _Config

    saved_step = max(
        int(p.rsplit("-", 1)[1].split(".")[0]) for p in ckpts
    )
    assert saved_step >= 10
    cfg2 = _Config(
        command="train", io_type="synthetic", num_class=2, kvalue=6,
        edge_filters=(8,), head_feat_dim=16, head_mlp=(16,),
        minibatch_size=4, num_point=128, iteration=saved_step + 4,
        report_step=2, checkpoint_step=0, use_pallas=False, num_devices=1,
        seed=7, weight_prefix=prefix, log_dir=str(tmp_path / "log"),
        auto_resume=True,
    )
    _train(cfg2)
    latest = _ckpt.latest(prefix)
    final_step = int(latest.rsplit("-", 1)[1].split(".")[0])
    assert final_step == saved_step + 4, (saved_step, latest)
