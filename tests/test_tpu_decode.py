"""TPU decode kernel gates: the lane-parallel VPX token decoder
(kernels/vpx_decode) must be bit-exact with the host decoder.

Mirrors the reference's decode-side test strategy: golden md5s for
multi-segment files (test_16threads.sh) and roundtrip identity.
"""
import hashlib
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lepton_tpu.api import compress, decompress, decompress_tpu  # noqa: E402
from lepton_tpu.coder.vpx import BoolReader, BoolWriter  # noqa: E402
from lepton_tpu.kernels import vpx_decode as VD  # noqa: E402

IMAGES = "/root/reference/images"
SLOW = os.environ.get("LEPTON_SLOW_TESTS") == "1"


def test_reader_parity_predicated():
    """The packed-state vpx_read (32-bit window) matches BoolReader
    bit-for-bit under a randomized per-lane activity schedule, with the
    adaptive branch updates matching the scalar LUT."""
    rng = np.random.default_rng(7)
    S, N = 4, 400
    from lepton_tpu.codec.blocks import Coder
    from lepton_tpu.model.tables import Model

    streams, idx_l = [], []
    models = []
    for _ in range(S):
        w = BoolWriter()
        m = Model()
        coder = Coder(arena=m.raw, writer=w)
        idxs = rng.integers(0, 1000, N)
        bits = rng.integers(0, 2, N)
        for ix, b in zip(idxs, bits):
            coder.put(int(b), int(ix))
        streams.append(w.finish())
        idx_l.append((idxs, bits))
        models.append(m)
    Lmax = max(len(b) for b in streams)
    data = np.zeros((S, Lmax), np.uint8)
    dlen = np.zeros(S, np.int32)
    for s, b in enumerate(streams):
        data[s, :len(b)] = np.frombuffer(b, np.uint8)
        dlen[s] = len(b)
    data, dlen = jnp.asarray(data), jnp.asarray(dlen)
    lanes = jnp.arange(S)
    read = VD.make_read(lanes, data, dlen,
                        jnp.asarray(VD._packed_lut()),
                        jnp.asarray(VD._VPX_NORM_NP))
    read_j = jax.jit(read, static_argnames=("adaptive",))

    buf = VD.state_init(S)
    buf, _ = read_j(buf, jnp.full(S, VD.FIXED128, jnp.int32),
                    jnp.ones(S, bool), adaptive=False)
    pos = [0] * S
    while any(p < N for p in pos):
        act = np.array([p < N and rng.random() < 0.8 for p in pos])
        if not act.any():
            act = np.array([p < N for p in pos])
        ixv = np.array([idx_l[s][0][pos[s]] if act[s] else 0
                        for s in range(S)], np.int32)
        buf, bit = read_j(buf, jnp.asarray(ixv), jnp.asarray(act))
        bit = np.asarray(bit)
        for s in range(S):
            if act[s]:
                assert int(bit[s]) == idx_l[s][1][pos[s]], (s, pos[s])
                pos[s] += 1
    # final model arenas must match the scalar coder's
    bufn = np.asarray(buf)
    from lepton_tpu.model.tables import ARENA_SIZE
    for s in range(S):
        packed = bufn[s, :ARENA_SIZE]
        a = np.asarray(models[s].arena)
        want = ((a[:, 0].astype(np.uint32) << 16)
                | (a[:, 1].astype(np.uint32) << 8) | a[:, 2])
        assert np.array_equal(packed, want)


def test_decompress_tpu_truncated():
    """Single-segment truncated (early EOF) container decodes bit-exact
    on the TPU kernel."""
    data = open(os.path.join(IMAGES, "nofsync.jpg"), "rb").read()
    lep = compress(data)
    assert decompress_tpu(lep) == data


def test_decompress_tpu_multisegment():
    """Multi-segment color container: independent lane-parallel streams."""
    data = open(os.path.join(IMAGES, "androidcrop.jpg"), "rb").read()
    lep = compress(data, min_threads=4)
    assert lep[4] == 4  # really 4 segments
    assert decompress_tpu(lep) == data
    assert decompress_tpu(lep) == decompress(lep)


def test_decompress_tpu_progressive():
    """Mode-X container: identical token layer on the kernel, host
    progressive re-emit (vp8_decoder.cc:388 + recode_jpeg)."""
    data = open(os.path.join(IMAGES, "androidprogressive.jpg"),
                "rb").read()
    lep = compress(data, allow_progressive=True, min_threads=2)
    assert decompress_tpu(lep) == data
    assert decompress_tpu(lep) == decompress(lep)


def test_ans_reader_parity_predicated():
    """The (hi, lo)-pair rANS forward reader (make_read_ans) matches
    coder.ans.ANSReader bit-for-bit under a randomized per-lane activity
    schedule, with adv-model branch updates matching the scalar LUT
    (ans_bool_reader.hh + branch.hh:66-80)."""
    rng = np.random.default_rng(11)
    S, N = 4, 400
    from lepton_tpu.coder.ans import ANSWriter
    from lepton_tpu.codec.blocks import Coder
    from lepton_tpu.model.tables import ARENA_SIZE, Model

    streams, idx_l, models = [], [], []
    for _ in range(S):
        w = ANSWriter()
        m = Model()
        coder = Coder(arena=m.raw, writer=w, ans=True)
        idxs = rng.integers(0, 1000, N)
        bits = rng.integers(0, 2, N)
        for ix, b in zip(idxs, bits):
            coder.put(int(b), int(ix))
        streams.append(w.finish())
        idx_l.append((idxs, bits))
        models.append(m)
    word_lists = []
    for b in streams:
        if len(b) % 4:
            b = b + b"\x00" * (4 - len(b) % 4)
        word_lists.append(np.frombuffer(b, np.uint32))
    Lmax = max(4, max(len(w) for w in word_lists))
    data = np.zeros((S, Lmax), np.uint32)
    dlen = np.zeros(S, np.int32)
    for s, w in enumerate(word_lists):
        data[s, :len(w)] = w
        dlen[s] = len(w)
    data, dlen = jnp.asarray(data), jnp.asarray(dlen)
    lanes = jnp.arange(S)
    read = VD.make_read_ans(lanes, data, dlen,
                            jnp.asarray(VD._packed_lut_adv()))
    read_j = jax.jit(read, static_argnames=("adaptive",))
    buf = VD.state_init_ans(data)
    pos = [0] * S
    while any(p < N for p in pos):
        act = np.array([p < N and rng.random() < 0.8 for p in pos])
        if not act.any():
            act = np.array([p < N for p in pos])
        ixv = np.array([idx_l[s][0][pos[s]] if act[s] else 0
                        for s in range(S)], np.int32)
        buf, bit = read_j(buf, jnp.asarray(ixv), jnp.asarray(act))
        bit = np.asarray(bit)
        for s in range(S):
            if act[s]:
                assert int(bit[s]) == idx_l[s][1][pos[s]], (s, pos[s])
                pos[s] += 1
    bufn = np.asarray(buf)
    for s in range(S):
        packed = bufn[s, :ARENA_SIZE]
        a = np.asarray(models[s].arena)
        want = ((a[:, 0].astype(np.uint32) << 16)
                | (a[:, 1].astype(np.uint32) << 8) | a[:, 2])
        assert np.array_equal(packed, want)


def test_decompress_tpu_ans_v3():
    """v3 (rANS) containers decode on the kernel: same token state
    machine over the forward rANS reader (ans_bool_reader.hh)."""
    data = open(os.path.join(IMAGES, "androidcrop.jpg"), "rb").read()
    lep = compress(data, version=3, min_threads=4)
    assert decompress_tpu(lep) == data
    assert decompress_tpu(lep) == decompress(lep)


def test_decompress_tpu_ans_v3_progressive():
    """v3 + mode X: ANS token layer, host progressive re-emit."""
    data = open(os.path.join(IMAGES, "androidprogressive.jpg"),
                "rb").read()
    lep = compress(data, version=3, allow_progressive=True, min_threads=2)
    assert decompress_tpu(lep) == data


def test_decompress_tpu_ans_reference_interop():
    """A container produced by the reference's ANS build decodes
    bit-exact through the TPU kernel (bidirectional v3 interop)."""
    import subprocess
    ref = "/tmp/refbuild-ans/lepton"
    if not os.path.exists(ref):
        pytest.skip("reference ANS oracle not built")
    src = os.path.join(IMAGES, "androidcrop.jpg")
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        reflep = os.path.join(td, "r.lep")
        subprocess.run([ref, "-ans", "-singlethread", src, reflep],
                       check=True, capture_output=True, timeout=120)
        rl = open(reflep, "rb").read()
    assert decompress_tpu(rl) == open(src, "rb").read()


@pytest.mark.skipif(not SLOW, reason="set LEPTON_SLOW_TESTS=1 (about "
                    "3 min on 1 vCPU; the round driver runs it on TPU)")
def test_iphone16_golden_tpu():
    """The reference's own 16-segment golden gate (test_16threads.sh)
    decoded by the TPU kernel: 16 lanes, golden md5 after host re-emit."""
    lep = open(os.path.join(IMAGES, "iphone16.lep"), "rb").read()
    out = decompress_tpu(lep)
    assert hashlib.md5(out).hexdigest() == \
        "8ea9fcf1b2c24877aa838dd6ac1df413"


@pytest.mark.skipif(not SLOW, reason="second ~2-min compile of the same "
                    "kernel under sharding; set LEPTON_SLOW_TESTS=1")
def test_decompress_tpu_virtual_mesh():
    """Lane-sharded decode over a virtual device mesh: segments are
    independent streams, so the whole scan shards on a 'seg' axis."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices (XLA_FLAGS host device count)")
    from jax.sharding import Mesh
    data = open(os.path.join(IMAGES, "androidcrop.jpg"), "rb").read()
    lep = compress(data, min_threads=4)
    mesh = Mesh(np.array(jax.devices()[:4]), ("seg",))
    assert decompress_tpu(lep, mesh=mesh) == data
