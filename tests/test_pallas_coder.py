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
