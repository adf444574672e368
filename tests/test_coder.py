"""Unit tests for the bit-exact nucleus: branch update + VPX bool coder."""
import random

import numpy as np
import pytest

from lepton_tpu.coder.vpx import BoolReader, BoolWriter
from lepton_tpu.model.branch import (fast_divide18bit_by_10bit, next_state_lut,
                                     update_branch)


def test_fast_divide_matches_exact_division():
    # the model only divides (false_count << 8) / total with
    # false_count in [1, 255+] and total in [2, 511]
    rng = np.random.default_rng(0)
    nums = rng.integers(0, 1 << 18, size=20000)
    denoms = rng.integers(1, 1026, size=20000)
    for n, d in zip(nums.tolist(), denoms.tolist()):
        assert fast_divide18bit_by_10bit(n, d) == n // d


def test_branch_update_lut_matches_scalar():
    lut = next_state_lut()
    rng = random.Random(1)
    for _ in range(5000):
        fc = rng.randrange(1, 256)
        tc = rng.randrange(1, 256)
        for obs in (False, True):
            sf, st, sp = update_branch(fc, tc, 0, obs)
            lf, lt, lp = lut[fc, tc, int(obs)]
            assert (sf, st, sp) == (lf, lt, lp), (fc, tc, obs)


def test_branch_update_identity_start():
    # first observation from identity: prob splits the count space
    assert update_branch(1, 1, 128, False) == (2, 1, (2 << 8) // 3)
    assert update_branch(1, 1, 128, True) == (1, 2, (1 << 8) // 3)


def test_branch_overflow_neverseen():
    assert update_branch(255, 1, 255, False) == (255, 1, 255)
    assert update_branch(1, 255, 0, True) == (1, 255, 0)


def test_branch_overflow_halving():
    fc, tc, prob = update_branch(255, 100, 0, False)
    assert fc == 129 and tc == (1 + 100) >> 1
    assert prob == (129 << 8) // (129 + tc)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bool_coder_roundtrip_random(seed):
    rng = random.Random(seed)
    n = 5000
    bits = [rng.randrange(2) for _ in range(n)]
    probs = [rng.randrange(1, 256) for _ in range(n)]
    w = BoolWriter()
    for b, p in zip(bits, probs):
        w.put_bit(b, p)
    data = w.finish()
    r = BoolReader(data)
    out = [r.get_bit(p) for p in probs]
    assert out == bits


def test_bool_coder_roundtrip_extreme_probs():
    # long runs at extreme probabilities exercise carry propagation
    w = BoolWriter()
    pattern = [(0, 255)] * 300 + [(1, 255)] + [(1, 1)] * 300 + [(0, 1)] + \
        [(1, 128), (0, 128)] * 50
    for b, p in pattern:
        w.put_bit(b, p)
    data = w.finish()
    r = BoolReader(data)
    for b, p in pattern:
        assert r.get_bit(p) == b


def test_bool_coder_adaptive_roundtrip():
    # drive coder through adaptive branch updates like the real codec
    rng = random.Random(7)
    bits = [1 if rng.random() < 0.8 else 0 for _ in range(20000)]
    fc = tc = 1
    prob = 128
    w = BoolWriter()
    for b in bits:
        w.put_bit(b, prob)
        fc, tc, prob = update_branch(fc, tc, prob, bool(b))
    data = w.finish()
    fc = tc = 1
    prob = 128
    r = BoolReader(data)
    for b in bits:
        got = r.get_bit(prob)
        assert got == b
        fc, tc, prob = update_branch(fc, tc, prob, bool(got))
