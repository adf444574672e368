"""Batched phase-B coder scan kernel vs the scalar coder (small sizes)."""
import random

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from lepton_tpu.coder.vpx import BoolWriter  # noqa: E402
from lepton_tpu.kernels import vpx_scan  # noqa: E402
from lepton_tpu.kernels import vpx_scan as V  # noqa: E402
from lepton_tpu.model.branch import update_branch  # noqa: E402
from lepton_tpu.model.tables import ARENA_SIZE  # noqa: E402


def _scalar_encode(idx, bits):
    """Scalar reference: adaptive coding, identity-initialized branches.
    BoolWriter emits the marker bit itself; finish() adds the stop bits --
    matching what build_symbol_streams adds around the raw stream."""
    state = {}
    w = BoolWriter()
    for i, b in zip(idx, bits):
        fc, tc, prob = state.get(i, (1, 1, 128))
        w.put_bit(int(b), prob)
        state[i] = update_branch(fc, tc, prob, bool(b))
    return w.finish()


def test_scan_kernel_matches_scalar_coder():
    rng = random.Random(3)
    S = 3
    segments = []
    refs = []
    for s in range(S):
        n = 300 - s * 40  # varying lengths exercise lane padding
        idx = [rng.randrange(ARENA_SIZE) for _ in range(n)]
        for k in range(1, n):
            if rng.random() < 0.7:
                idx[k] = idx[rng.randrange(k)]  # repeat -> adaptation
        bit = [rng.randrange(2) for _ in range(n)]
        segments.append((np.asarray(idx, dtype=np.int32),
                         np.asarray(bit, dtype=np.uint8)))
        refs.append(_scalar_encode(idx, bit))

    idxs, bits = vpx_scan.build_symbol_streams(segments)
    emit, byte, carry, nbytes = vpx_scan.encode_streams(idxs, bits)
    out = vpx_scan.finalize_streams(emit, byte, carry, nbytes)
    for s in range(S):
        assert out[s] == refs[s], f"segment {s}"


def test_windowed_scan_matches_per_symbol():
    """encode_streams_windowed (coalesced gather/scatter, in-window state
    forwarding) must be bit-identical to the per-symbol scan."""
    import random
    import numpy as np
    from lepton_tpu.kernels import vpx_scan as V
    from lepton_tpu.model.tables import ARENA_SIZE
    rng = random.Random(9)
    segs = []
    for s in range(3):
        n = 500 + 77 * s
        idx = [rng.randrange(ARENA_SIZE) for _ in range(n)]
        for k in range(2, n):
            if rng.random() < 0.8:
                idx[k] = idx[rng.randrange(max(1, k - 6), k)]
        bit = [rng.randrange(2) for _ in range(n)]
        segs.append((np.asarray(idx, np.int32), np.asarray(bit, np.uint8)))
    idxs, bits = V.build_symbol_streams(segs)
    o1 = V.encode_streams(idxs, bits)
    o2 = V.encode_streams_windowed(idxs, bits)
    for a, b in zip(o1, o2):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_compress_tpu_byte_identical(ref_images=None):
    """compress_tpu (phase-B entropy coding on accelerator lanes) must
    produce byte-identical .lep files to the host encoder."""
    import os
    from lepton_tpu.api import compress, compress_tpu, decompress
    data = open("/root/reference/images/nofsync.jpg", "rb").read()
    t = compress_tpu(data, num_segments=8)
    assert t == compress(data)
    assert decompress(t) == data
    pdata = open("/root/reference/images/iphoneprogressive.jpg", "rb").read()
    tp = compress_tpu(pdata, num_segments=8, allow_progressive=True)
    assert tp == compress(pdata, allow_progressive=True)
    assert decompress(tp) == pdata


def test_twopass_matches_reference_scan():
    """Sort-based two-pass encoder == the reference lockstep scan on
    adversarial streams: heavy same-branch repeats (sort segments +
    count-overflow paths), fixed-prob markers, trailing PAD."""
    rng = random.Random(11)
    segs = []
    for s in range(4):
        n = 700 + 131 * s
        # clustered indices force long per-branch runs and overflows
        idx = [rng.randrange(8) if rng.random() < 0.7
               else rng.randrange(ARENA_SIZE) for _ in range(n)]
        bit = [rng.randrange(2) for _ in range(n)]
        # sprinkle fixed-prob symbols mid-stream
        for k in range(0, n, 97):
            idx[k] = V.FIXED_PROB
        segs.append((np.asarray(idx, np.int32), np.asarray(bit, np.uint8)))
    idxs, bits = V.build_symbol_streams(segs)
    o1 = V.encode_streams(idxs, bits)
    for W in (8, 32):
        o2 = V.encode_streams_twopass(idxs, bits, window=W)
        for a, b in zip(o1, o2):
            assert np.array_equal(np.asarray(a), np.asarray(b)), W


def test_exact_div_f32_branch_domain():
    """The gather-free branch update's f32 divider is exact over the
    full domain the model uses (numer = c<<8, c<=256; denom <= 512)."""
    import jax.numpy as jnp
    c = np.repeat(np.arange(257), 512)
    d = np.tile(np.arange(1, 513), 257)
    q = np.asarray(V._exact_div_f32(jnp.asarray(c << 8, jnp.int32),
                                    jnp.asarray(d, jnp.int32)))
    assert np.array_equal(q, (c << 8) // d)


def test_branch_updates_full_domain():
    """The gather-free vector branch updates match the host's uint8
    transition LUTs over the FULL (fc, tc) in [0,255]^2 domain -- not
    just identity-reachable states.  Trained-model templates start
    branches at load-normalized counts (including 0), where the host LUT
    wraps the prob byte mod 256; kernel parity must hold there too."""
    import jax.numpy as jnp
    from lepton_tpu.model.branch import next_state_lut, next_state_lut_adv
    fc = np.repeat(np.arange(256), 256).astype(np.int32)
    tc = np.tile(np.arange(256), 256).astype(np.int32)
    for bit in (0, 1):
        b = np.full(fc.shape, bit, np.int32)
        for fn, lut in ((V._branch_update_arith, next_state_lut()),
                        (V._branch_update_adv, next_state_lut_adv())):
            nfc, ntc, npr = [np.asarray(v) for v in
                             fn(jnp.asarray(fc), jnp.asarray(tc),
                                jnp.asarray(b))]
            want = lut[fc, tc, bit]
            assert np.array_equal(nfc & 0xFF, want[:, 0]), fn
            assert np.array_equal(ntc & 0xFF, want[:, 1]), fn
            assert np.array_equal(npr, want[:, 2]), fn


def test_div64_small_wide_domain():
    """The rANS put-step divider is exact over its REAL domain: hi up to
    2^31 (inexact in f32!) with the put-step invariant hi < freq<<23.
    A single +-1 fixup is NOT enough there -- the TPU's uncorrectly-
    rounded divide plus the f32 numerator rounding produced off-by-2
    quotients (one-bit corpus mismatch, round 4); the wide=True second
    division must recover floor exactly on every backend."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    N = 1 << 18
    f = rng.integers(1, 257, N, dtype=np.int64)
    hi = rng.integers(0, 1 << 31, N, dtype=np.int64)
    hi = np.minimum(hi, (f << 23) - 1)
    # adversarial tail: exact multiples +-1 near the top of the domain
    f[:512] = np.arange(512) % 256 + 1
    hi[:512] = (f[:512] << 23) - 1
    lo = rng.integers(0, 1 << 32, N, dtype=np.uint64)
    qh, ql, rem = jax.jit(V._div64_small)(
        jnp.asarray(hi, jnp.int32), jnp.asarray(lo, jnp.uint32),
        jnp.asarray(f, jnp.int32))
    x = (hi << 32) | lo.astype(np.int64)
    got_q = (np.asarray(qh).astype(np.int64) << 32) \
        | np.asarray(ql).astype(np.uint64).astype(np.int64)
    assert np.array_equal(got_q, x // f)
    assert np.array_equal(np.asarray(rem).astype(np.int64), x % f)


def test_ans_pass_matches_scalar_writer():
    """On-device rANS (adv model pass + reverse 64-bit register chain in
    uint32 pieces) == coder.ans.ANSWriter byte-for-byte, odd and even
    symbol counts, overflow-heavy branch reuse."""
    from lepton_tpu.coder.ans import ANSWriter
    from lepton_tpu.codec.blocks import Coder
    from lepton_tpu.model.tables import Model
    import numpy as np
    rng = np.random.default_rng(6)
    segs, want = [], []
    for s in range(4):
        n = 300 + 111 * s + (s % 2)
        idx = rng.integers(0, 30, n).astype(np.int32)
        idx[rng.random(n) < 0.25] = rng.integers(0, ARENA_SIZE)
        bit = rng.integers(0, 2, n).astype(np.uint8)
        segs.append((idx, bit))
        w = ANSWriter()
        coder = Coder(arena=Model().raw, writer=w, ans=True)
        for i, b in zip(idx, bit):
            coder.put(int(b), int(i))
        want.append(w.finish())
    got = V.encode_streams_ans(segs)
    assert got == want
