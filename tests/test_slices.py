"""Byte-sliced encodes (-startbyte/-trunc) and embedded JPEGs (-embedding).

Mirrors the reference's test_2nd_block.sh / test_last_block.sh /
test_embedded.sh: a file split into [0,T) / [S,T') / [S',end) slices must
reassemble bit-exactly, and an embedded JPEG with random prefix/trailer must
roundtrip whole.
"""
import os
import subprocess
import sys
import threading

import pytest

from lepton_tpu.api import compress, compress_any, decompress


def _jpg(ref_images, name):
    return open(os.path.join(ref_images, name), "rb").read()


def test_slices_reassemble(ref_images):
    jpg = _jpg(ref_images, "iphonecrop.jpg")
    s1, s2 = 50000, 120000
    parts = [
        decompress(compress(jpg[:s1])),
        decompress(compress(jpg[:s2], start_byte=s1)),
        decompress(compress(jpg, start_byte=s2)),
    ]
    assert parts[1] == jpg[s1:s2]
    assert b"".join(parts) == jpg


def test_slice_verify_gate(ref_images):
    jpg = _jpg(ref_images, "androidcrop.jpg")
    lep = compress_any(jpg, verify=True, start_byte=20000)
    assert decompress(lep) == jpg[20000:]


def test_slice_near_eof(ref_images):
    # the final handoff's one-based stream position reaches past EOF; the
    # zero-padded prefix plus the decode size bound still yield the exact
    # tail (the reference asserts on start_byte == size-1, jpgcoder.cc:3834)
    jpg = _jpg(ref_images, "nofsync.jpg")
    n = len(jpg)
    for sb in (n - 1, n - 5):
        assert decompress(compress(jpg, start_byte=sb)) == jpg[sb:]
    with pytest.raises(Exception):
        compress(jpg, start_byte=n + 100)


def test_embedding_roundtrip(ref_images):
    jpg = _jpg(ref_images, "androidcrop.jpg")
    rng = bytes((i * 197 + 13) & 0xFF for i in range(10001))
    trailer = bytes((i * 89 + 7) & 0xFF for i in range(10003))
    data = rng + jpg + trailer
    lep = compress(data, embedding=len(rng))
    assert decompress(lep) == data


def test_fork_server(ref_images):
    jpg = _jpg(ref_images, "nofsync.jpg")
    proc = subprocess.Popen(
        [sys.executable, "-m", "lepton_tpu.cli", "-fork", "-preload"],
        stdout=subprocess.PIPE, stdin=subprocess.PIPE,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        def roundtrip(payload):
            a = proc.stdout.readline().strip()
            b = proc.stdout.readline().strip()
            t = threading.Thread(
                target=lambda: open(a, "wb").write(payload))
            t.start()
            with open(b, "rb") as f:
                out = f.read()
            t.join()
            return out

        lep = roundtrip(jpg)
        assert lep[:2] == b"\xcf\x84"
        assert roundtrip(lep) == jpg
    finally:
        proc.stdin.close()
        assert proc.wait(timeout=10) == 0


def test_zlib0_output_and_zlepton_input(ref_images):
    import zlib
    from lepton_tpu.cli import _process
    from lepton_tpu.container.zlib0 import zlib0_wrap
    jpg = _jpg(ref_images, "androidcrop.jpg")
    lep = compress(jpg)
    # -zlib0 wraps decode output in a stored-mode zlib stream
    out, _ = _process(lep, {"zlib0": True, "permissive": False})
    assert zlib.decompress(out) == jpg
    assert out[:2] == b"\x78\x01" and out[-4:] == \
        (zlib.adler32(jpg) & 0xFFFFFFFF).to_bytes(4, "big")
    # a zlepton file is a magic-swapped container; output is auto-wrapped
    zlep = bytes([0xCE, 0xB6]) + lep[2:]
    out2, _ = _process(zlep, {"permissive": False})
    assert out2 == out
    # chunk framing: >64K payload uses multiple stored blocks
    big = bytes(range(256)) * 600
    assert zlib.decompress(zlib0_wrap(big)) == big
    assert zlib.decompress(zlib0_wrap(b"")) == b""


def test_lepcat_mega_header(ref_images):
    from lepton_tpu.api import decompress_all
    from lepton_tpu.cli import lepcat_merge
    from lepton_tpu.container import brotli_ffi
    if not brotli_ffi.available():
        pytest.skip("brotli unavailable")
    j1 = _jpg(ref_images, "androidcrop.jpg")
    j2 = _jpg(ref_images, "narrowrst.jpg")
    a = compress(j1, version=2)
    b = compress(j2, version=2)
    merged = lepcat_merge([a, b])
    # follower section carries a zero header-size field (concat.cc:70)
    assert decompress_all(merged) == j1 + j2
    # v1 files are rejected like the reference's version assert
    with pytest.raises(ValueError):
        lepcat_merge([compress(j1), compress(j2)])
