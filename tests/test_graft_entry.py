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


def test_sharded_phase_a_virtual_mesh():
    """parallel.mesh.sharded_phase_a over an 8-device virtual CPU mesh:
    the (data x seg) sharding must compile and execute with XLA-inserted
    collectives only at the gather."""
    import os
    import numpy as np
    import pytest
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    jax = pytest.importorskip("jax")
    if len(jax.devices("cpu")) < 8:
        pytest.skip("virtual device mesh unavailable in this process")
    import jax.numpy as jnp
    from lepton_tpu.parallel import mesh as M
    from lepton_tpu.model.context import ColorTables
    from lepton_tpu.kernels.contexts import phase_a

    qt = np.arange(1, 65, dtype=np.int64)
    colors = ColorTables(qt)
    quant = jnp.asarray(colors.quant, dtype=jnp.int32)
    icx = jnp.asarray(colors.icos_idct_edge_8192_dequantized_x,
                      dtype=jnp.int32)
    icy = jnp.asarray(colors.icos_idct_edge_8192_dequantized_y,
                      dtype=jnp.int32)
    rng = np.random.default_rng(5)
    coefs = rng.integers(-32, 33, size=(2, 4, 8, 16, 64)).astype(np.int16)
    m = M.make_mesh(8)
    out = M.sharded_phase_a(jnp.asarray(coefs), quant, icx, icy, m)
    ref = jax.vmap(jax.vmap(lambda x: phase_a(x, quant, icx, icy)))(
        jnp.asarray(coefs))
    for k in ref:
        assert np.array_equal(np.asarray(out[k]), np.asarray(ref[k])), k
