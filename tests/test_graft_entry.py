"""Driver entry points must compile and run (single-chip + 8-device mesh)."""
import importlib.util
import os

import pytest

jax = pytest.importorskip("jax")


def _load():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", os.path.join(repo, "__graft_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_entry_compiles():
    m = _load()
    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (XLA_FLAGS host device count)")
    m = _load()
    m.dryrun_multichip(8)
