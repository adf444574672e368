"""T.81 QM coder (the reference's dormant third entropy backend).

Roundtrip + adaptation tests for lepton_tpu.coder.jpeg_arith, plus
byte-level cross-validation against the reference's own implementation
(src/vp8/model/JpegArithmeticCoder.cc, adapted there from libjpeg-turbo)
compiled on the fly as an oracle shared library.
"""
import ctypes
import math
import os
import random
import shutil
import subprocess

import numpy as np
import pytest

from lepton_tpu.coder.jpeg_arith import (
    JpegBoolReader, JpegBoolWriter, initial_states)

REF_SRC = "/root/reference/src"
ORACLE = "/tmp/ref_arith_oracle.so"

_SHIM = r"""
#include <cstring>
#include <vector>
#include "io/Reader.hh"
#include "vp8/model/JpegArithmeticCoder.hh"
using namespace Sirikata;
namespace {
struct VecWriter : public DecoderWriter {
    std::vector<unsigned char> bytes;
    std::pair<Sirikata::uint32, JpegError> Write(const Sirikata::uint8 *d,
                                                 unsigned int n) override {
        bytes.insert(bytes.end(), d, d + n);
        return std::make_pair(n, JpegError::nil());
    }
    void Close() override {}
};
struct BufReader : public DecoderReader {
    const unsigned char *p; size_t n, pos = 0;
    std::pair<Sirikata::uint32, JpegError> Read(Sirikata::uint8 *d,
                                                unsigned int size) override {
        unsigned int take = 0;
        while (take < size && pos < n) d[take++] = p[pos++];
        return std::make_pair(take,
                              take ? JpegError::nil() : JpegError::errEOF());
    }
};
}
extern "C" long ref_arith_encode(const unsigned char *bits, const int *ctx,
                                 long nbits, int nctx,
                                 unsigned char *out, long cap) {
    VecWriter w;
    ArithmeticCoder enc(true);
    std::vector<unsigned char> states(nctx, 0);
    for (long i = 0; i < nbits; ++i)
        enc.arith_encode(&w, &states[ctx[i]], bits[i] != 0);
    enc.finish_encode(&w);
    if ((long)w.bytes.size() > cap) return -1;
    std::memcpy(out, w.bytes.data(), w.bytes.size());
    return (long)w.bytes.size();
}
extern "C" void ref_arith_decode(const unsigned char *data, long len,
                                 const int *ctx, long nbits, int nctx,
                                 unsigned char *bits_out) {
    BufReader r; r.p = data; r.n = (size_t)len;
    ArithmeticCoder dec(false);
    std::vector<unsigned char> states(nctx, 0);
    for (long i = 0; i < nbits; ++i)
        bits_out[i] = dec.arith_decode(&r, &states[ctx[i]]) ? 1 : 0;
}
"""


@pytest.fixture(scope="module")
def oracle():
    src = os.path.join(REF_SRC, "vp8/model/JpegArithmeticCoder.cc")
    if not (os.path.exists(src) and shutil.which("g++")):
        pytest.skip("reference sources or g++ unavailable")
    if not os.path.exists(ORACLE):
        shim = "/tmp/ref_arith_shim.cc"
        with open(shim, "w") as f:
            f.write(_SHIM)
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", "-I", REF_SRC,
             "-o", ORACLE, shim, src],
            check=True, capture_output=True, timeout=300)
    lib = ctypes.CDLL(ORACLE)
    lib.ref_arith_encode.restype = ctypes.c_long
    return lib


def _random_case(seed):
    rng = random.Random(seed)
    n_ctx = rng.choice([1, 3, 64, 300])
    nbits = rng.choice([0, 1, 7, 500, 30000])
    skew = rng.choice([0.01, 0.35, 0.5, 0.97])
    bits = [int(rng.random() < skew) for _ in range(nbits)]
    idxs = [rng.randrange(n_ctx) for _ in range(nbits)]
    return n_ctx, bits, idxs


def _encode(bits, idxs, n_ctx):
    w = JpegBoolWriter()
    st = initial_states(n_ctx)
    for b, i in zip(bits, idxs):
        w.put_bit(b, st, i)
    return w.finish(), st


def test_roundtrip_random():
    for seed in range(25):
        n_ctx, bits, idxs = _random_case(seed)
        stream, enc_states = _encode(bits, idxs, n_ctx)
        r = JpegBoolReader(stream)
        st = initial_states(n_ctx)
        assert [r.get_bit(st, i) for i in idxs] == bits, f"seed {seed}"
        assert st == enc_states, f"seed {seed}: state divergence"


def test_compression_near_entropy():
    rng = random.Random(7)
    p = 0.05
    bits = [int(rng.random() < p) for _ in range(100000)]
    stream, _ = _encode(bits, [0] * len(bits), 1)
    entropy = -(p * math.log2(p) + (1 - p) * math.log2(1 - p))
    rate = len(stream) * 8 / len(bits)
    assert rate < entropy * 1.10, f"{rate:.4f} bits/bit vs H={entropy:.4f}"


def test_all_zero_stream_is_tiny():
    # Pacman termination: a constant-MPS stream collapses to a few bytes
    stream, _ = _encode([0] * 50000, [0] * 50000, 1)
    assert len(stream) < 16


def test_cross_validation_vs_reference(oracle):
    """Our encoder's bytes == the reference coder's bytes, and each
    decoder accepts the other's stream, across randomized cases."""
    for seed in range(40):
        n_ctx, bits, idxs = _random_case(1000 + seed)
        nbits = len(bits)
        bits_np = np.array(bits, dtype=np.uint8)
        idxs_np = np.array(idxs, dtype=np.int32)
        ours, _ = _encode(bits, idxs, n_ctx)
        cap = nbits + 1024
        out = np.zeros(cap, dtype=np.uint8)
        n = oracle.ref_arith_encode(
            bits_np.ctypes.data_as(ctypes.c_void_p),
            idxs_np.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_long(nbits), n_ctx,
            out.ctypes.data_as(ctypes.c_void_p), ctypes.c_long(cap))
        assert ours == out[:n].tobytes(), f"seed {seed}: encode mismatch"
        # our decoder over the reference stream
        r = JpegBoolReader(ours)
        st = initial_states(n_ctx)
        assert [r.get_bit(st, i) for i in idxs] == bits, f"seed {seed}"
        # reference decoder over our stream
        buf = np.frombuffer(ours, dtype=np.uint8) if ours else out[:0]
        dbits = np.zeros(max(nbits, 1), dtype=np.uint8)
        oracle.ref_arith_decode(
            buf.ctypes.data_as(ctypes.c_void_p), ctypes.c_long(len(ours)),
            idxs_np.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_long(nbits), n_ctx,
            dbits.ctypes.data_as(ctypes.c_void_p))
        assert dbits[:nbits].tolist() == bits, f"seed {seed}: ref decode"


def test_truncated_stream_supplies_zero_data():
    # T.81 marker convention: decoding past the end must not raise
    n_ctx, bits, idxs = _random_case(3)
    stream, _ = _encode(bits, idxs, n_ctx)
    r = JpegBoolReader(stream[: len(stream) // 2])
    st = initial_states(n_ctx)
    for i in idxs:  # decodes garbage, but must terminate cleanly
        assert r.get_bit(st, i) in (0, 1)
