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
