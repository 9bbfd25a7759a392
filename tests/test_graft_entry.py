"""The driver contract: entry() compiles; dryrun_multichip runs a dp x sp step."""

import importlib.util
import os

import jax

_spec = importlib.util.spec_from_file_location(
    "__graft_entry__",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__graft_entry__.py"),
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)


def test_entry_compiles_single_device():
    fn, args = _mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 1024, 2)


def test_dryrun_multichip_8():
    _mod.dryrun_multichip(8)


def test_dryrun_multichip_8_driver_conditions():
    """Run dryrun_multichip(8) in a FRESH subprocess, without this test
    suite's conftest pre-configuring jax_platforms=cpu.

    This is the driver's exact path: the axon sitecustomize is active
    (JAX_PLATFORMS=axon), so any jax device probe before the CPU
    reconfigure pins the single-TPU backend and the dryrun dies with
    "1 devices available, need 8" (the round-1 MULTICHIP gate failure).
    This test fails if that probe-before-configure ordering comes back.
    """
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # simulate the driver environment: axon is the default jax platform
    env["JAX_PLATFORMS"] = "axon"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) failed under driver conditions:\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "dryrun_multichip(8)" in proc.stdout and "ok" in proc.stdout
