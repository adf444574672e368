"""Pallas VMEM-resident coder kernel vs the scalar coder (interpret mode)."""
import random

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from lepton_tpu.coder.vpx import BoolWriter  # noqa: E402
from lepton_tpu.kernels import pallas_coder, vpx_scan  # noqa: E402
from lepton_tpu.model.branch import update_branch  # noqa: E402
from lepton_tpu.model.tables import ARENA_SIZE  # noqa: E402


def _scalar_encode(idx, bits):
    state = {}
    w = BoolWriter()
    for i, b in zip(idx, bits):
        fc, tc, prob = state.get(i, (1, 1, 128))
        w.put_bit(int(b), prob)
        state[i] = update_branch(fc, tc, prob, bool(b))
    return w.finish()


def test_pallas_coder_matches_scalar():
    rng = random.Random(9)
    segments = []
    refs = []
    for s in range(2):
        n = 900 - 100 * s
        idx = [rng.randrange(ARENA_SIZE) for _ in range(n)]
        for k in range(1, n):
            if rng.random() < 0.7:
                idx[k] = idx[rng.randrange(k)]
        bit = [rng.randrange(2) for _ in range(n)]
        segments.append((np.asarray(idx, np.int32),
                         np.asarray(bit, np.uint8)))
        refs.append(_scalar_encode(idx, bit))
    idxs, bits = vpx_scan.build_symbol_streams(segments)
    out, nb = pallas_coder.encode_streams_pallas(idxs, bits, interpret=True)
    streams = pallas_coder.finalize(out, nb)
    for s in range(2):
        assert streams[s] == refs[s], f"segment {s}"


def test_pallas_coder_carry_chain():
    # force long runs of near-1 probabilities to exercise carries
    rng = random.Random(4)
    idx = []
    bit = []
    for _ in range(1500):
        idx.append(7)          # hammer one branch into extreme probability
        bit.append(1)
    for _ in range(64):
        idx.append(rng.randrange(ARENA_SIZE))
        bit.append(rng.randrange(2))
    ref = _scalar_encode(idx, bit)
    idxs, bits = vpx_scan.build_symbol_streams(
        [(np.asarray(idx, np.int32), np.asarray(bit, np.uint8))])
    out, nb = pallas_coder.encode_streams_pallas(idxs, bits, interpret=True)
    assert pallas_coder.finalize(out, nb)[0] == ref


def test_pallas_coder_on_device():
    """When a real TPU is attached, the Mosaic-compiled kernel (not the
    interpreter) must stay bit-exact -- interpret-only CI would let
    Mosaic regressions through (r1 review finding)."""
    import os
    if True:
        # the suite itself runs on forced CPU (conftest); probe the real
        # backend in a clean subprocess so this gate runs exactly when
        # hardware is present
        import subprocess
        import sys
        import time as _time
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        # the axon tunnel FLAPS (down for minutes, then back) and a dead
        # relay makes jax.devices() block forever -- bound the probe and
        # retry once, and treat an unreachable tunnel as an environment
        # outage (skip), not a code failure (mirrors bench.tpu_reachable)
        env = {k: v for k, v in os.environ.items()
               if k not in ("JAX_PLATFORMS",)}
        probe = None
        for attempt in range(2):
            try:
                probe = subprocess.run(
                    [sys.executable, "-c",
                     "import jax; print(jax.devices()[0].platform)"],
                    capture_output=True, text=True, timeout=300, env=env)
            except subprocess.TimeoutExpired:
                probe = None
            if probe is not None:
                break
            if not attempt:
                _time.sleep(60)
        if probe is None:
            pytest.skip("TPU tunnel unreachable (probe timeout)")
        if probe.returncode != 0 or "tpu" not in probe.stdout:
            pytest.skip("no TPU attached")
        r = subprocess.run(
            [sys.executable, "-c", f"""
import sys
sys.path.insert(0, {repo!r})
import random
import numpy as np
from lepton_tpu.coder.vpx import BoolWriter
from lepton_tpu.kernels import pallas_coder, vpx_scan
from lepton_tpu.model.branch import update_branch
from lepton_tpu.model.tables import ARENA_SIZE
rng = random.Random(9)
n = 600
idx = [rng.randrange(ARENA_SIZE) for _ in range(n)]
for k in range(1, n):
    if rng.random() < 0.7:
        idx[k] = idx[rng.randrange(k)]
bit = [rng.randrange(2) for _ in range(n)]
state = {{}}
w = BoolWriter()
for i, b in zip(idx, bit):
    fc, tc, prob = state.get(i, (1, 1, 128))
    w.put_bit(int(b), prob)
    state[i] = update_branch(fc, tc, prob, bool(b))
ref = w.finish()
idxs, bits = vpx_scan.build_symbol_streams(
    [(np.asarray(idx, np.int32), np.asarray(bit, np.uint8))])
out, nb = pallas_coder.encode_streams_pallas(idxs, bits, interpret=False)
assert pallas_coder.finalize(out, nb)[0] == ref, 'mosaic mismatch'
print('PALLAS-DEVICE-OK')
"""],
            capture_output=True, text=True, timeout=560,
            env={k: v for k, v in os.environ.items()
                 if k not in ("JAX_PLATFORMS",)})
        assert r.returncode == 0, r.stderr[-2000:]
        assert "PALLAS-DEVICE-OK" in r.stdout
