"""Container, mux framing and handoff serialization invariants
(reference test_invariants.cc equivalents)."""
import random

import pytest

from lepton_tpu.container.format import (LeptonHeader, build_header_block,
                                         read_container, write_container)
from lepton_tpu.container.handoff import (deserialize_handoffs,
                                          serialize_handoffs)
from lepton_tpu.container.mux import MuxReader, MuxWriter, mux_streams
from lepton_tpu.jpeg.decoder import ThreadHandoff


def _rand_handoffs(rng, n):
    out = []
    for _ in range(n):
        th = ThreadHandoff(
            luma_y_start=rng.randrange(65536),
            segment_size=rng.randrange(1 << 32),
            overhang_byte=rng.randrange(256),
            num_overhang_bits=rng.randrange(8),
            last_dc=[rng.randrange(-32768, 32768) for _ in range(4)])
        out.append(th)
    return out


def test_handoff_serialize_roundtrip():
    # reference test_thread_handoff (test_invariants.cc:283)
    rng = random.Random(5)
    ths = _rand_handoffs(rng, 8)
    data = serialize_handoffs(ths)
    back = deserialize_handoffs(data)
    for a, b in zip(ths, back):
        assert a.luma_y_start == b.luma_y_start
        assert a.segment_size == b.segment_size
        assert a.overhang_byte == b.overhang_byte
        assert a.num_overhang_bits == b.num_overhang_bits
        assert a.last_dc == b.last_dc


@pytest.mark.parametrize("sizes", [
    [10], [0, 10], [300, 5000, 70000], [65536, 65536],
    [1, 256, 4096, 65537, 131073],
])
def test_mux_roundtrip(sizes):
    # reference testRoundtrip (test_invariants.cc:264)
    rng = random.Random(42)
    streams = [bytes(rng.randrange(256) for _ in range(n)) for n in sizes]
    data = mux_streams(streams)
    rd = MuxReader(data)
    for i, s in enumerate(streams):
        assert bytes(rd.buffers[i]) == s


def test_mux_eof_marker_v2():
    streams = [b"hello world"]
    data = mux_streams(streams, version=2)
    assert data.endswith(bytes([0xFF, 0xFE, 0xFF]))
    rd = MuxReader(data)
    assert bytes(rd.buffers[0]) == b"hello world"


def test_container_roundtrip():
    rng = random.Random(7)
    hdr = LeptonHeader()
    hdr.hdrdata = bytes([0xFF, 0xC0, 0x00, 0x0B]) + bytes(9)
    hdr.padbit = 0x7F
    hdr.handoffs = _rand_handoffs(rng, 4)
    hdr.rst_err = [3]
    hdr.garbage = b"\xff\xd9extra"
    hdr.original_size = 12345
    hdr.num_threads = 4
    mux = mux_streams([b"abc" * 100, b"def" * 50, b"x", b"y"])
    blob = write_container(hdr, mux)
    hdr2, mux2 = read_container(blob)
    assert hdr2.hdrdata == hdr.hdrdata
    assert hdr2.padbit == hdr.padbit
    assert hdr2.rst_err == hdr.rst_err
    assert hdr2.garbage == hdr.garbage
    assert hdr2.original_size == 12345
    assert len(hdr2.handoffs) == 4
    assert mux2 == mux
    # trailing size field == total length
    assert int.from_bytes(blob[-4:], "little") == len(blob)
