"""The -tpu product surface: CLI roundtrip through the accelerator path
and the batch serving mode.  Runs on the CPU backend (the kernels are
the same program; the silicon gates live in bench.py)."""
import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

jax = pytest.importorskip("jax")

IMAGES = "/root/reference/images"
LEPTON = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "lepton")
# share a persistent compile cache between the in-process tests and the
# server subprocess: the encode pipeline compiles once per machine
CACHE = "/tmp/lepton_tpu_jaxcache_tests"
ENV = dict(os.environ, JAX_PLATFORMS="cpu", LEPTON_TPU_JAX_CACHE="1",
           LEPTON_TPU_JAX_CACHE_DIR=CACHE)


def test_cli_tpu_roundtrip(tmp_path, monkeypatch):
    from lepton_tpu import cli
    monkeypatch.setenv("LEPTON_TPU_JAX_CACHE", "1")
    monkeypatch.setenv("LEPTON_TPU_JAX_CACHE_DIR", CACHE)
    src = os.path.join(IMAGES, "nofsync.jpg")
    data = open(src, "rb").read()
    lep = tmp_path / "out.lep"
    back = tmp_path / "back.jpg"
    assert cli.main(["-tpu", src, str(lep)]) == 0
    blob = lep.read_bytes()
    assert blob[:2] == b"\xcf\x84"
    assert cli.main(["-tpu", str(lep), str(back)]) == 0
    assert back.read_bytes() == data
    # the TPU encode is byte-identical to the host encoder at matching
    # segment counts
    from lepton_tpu.api import compress
    assert blob == compress(data, max_threads=16)


@pytest.mark.skipif(os.environ.get("LEPTON_SLOW_TESTS") != "1",
                    reason="server subprocess pays a cold JAX compile; "
                    "set LEPTON_SLOW_TESTS=1")
def test_serve_tpu_batch(tmp_path):
    """Two requests (one JPEG, one .lep) through the TPU batch server."""
    sock = str(tmp_path / "tpu.sock")
    proc = subprocess.Popen([LEPTON, "-tpu", f"-socket={sock}"],
                            env=ENV, stderr=subprocess.PIPE)
    try:
        for _ in range(600):
            if os.path.exists(sock):
                break
            time.sleep(0.1)
        else:
            raise AssertionError("server socket never appeared")

        jpeg = open(os.path.join(IMAGES, "nofsync.jpg"), "rb").read()
        from lepton_tpu.api import compress
        lep = compress(jpeg)

        def ask(payload):
            c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            c.settimeout(1200)
            c.connect(sock)
            c.sendall(payload)
            c.shutdown(socket.SHUT_WR)
            chunks = []
            while True:
                b = c.recv(65536)
                if not b:
                    break
                chunks.append(b)
            c.close()
            return b"".join(chunks)

        out_lep = ask(jpeg)
        assert out_lep[:2] == b"\xcf\x84"
        from lepton_tpu.api import decompress
        assert decompress(out_lep) == jpeg
        out_jpg = ask(lep)
        assert out_jpg == jpeg
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_jailed_parse_parity():
    """api._parse_jpeg_jailed: the jailed-child parse returns exactly what
    the in-process parse does (planes, handoffs, truncation bookkeeping),
    and compress_tpu(jailed_parse=True) stays byte-identical."""
    from lepton_tpu.api import _parse_jpeg_jailed
    from lepton_tpu.jpeg.parser import parse_jpeg
    from lepton_tpu.jpeg.imageinfo import image_info_from_header
    from lepton_tpu.jpeg.decoder import decode_scans
    data = open(os.path.join(IMAGES, "androidcrop.jpg"), "rb").read()
    parsed, info, dec = _parse_jpeg_jailed(data, False)
    ref_parsed = parse_jpeg(data)
    ref_info = image_info_from_header(ref_parsed.hdrdata)
    ref_dec = decode_scans(ref_parsed, ref_info)
    assert parsed.hdrdata == ref_parsed.hdrdata
    assert parsed.garbage == ref_parsed.garbage
    assert parsed.rst_cnt == ref_parsed.rst_cnt
    assert info.cmpc == ref_info.cmpc
    assert len(dec.planes) == len(ref_dec.planes)
    for a, b in zip(dec.planes, ref_dec.planes):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert dec.padbit == ref_dec.padbit
    assert [h.segment_size for h in dec.handoffs] == \
        [h.segment_size for h in ref_dec.handoffs]


def test_jailed_parse_hostile_input():
    """A corrupt JPEG fails CLEANLY through the jailed parse channel
    (typed exception in the parent, no partial state)."""
    from lepton_tpu.api import _parse_jpeg_jailed
    data = bytearray(open(os.path.join(IMAGES, "nofsync.jpg"), "rb").read())
    data[2:6] = b"\xff\xc4\x00\x01"     # DHT with an impossible length
    with pytest.raises(Exception):
        _parse_jpeg_jailed(bytes(data), False)


def test_jailed_parse_channel_refuses_foreign_pickles():
    """The return channel's allowlisted unpickler must reject classes a
    compromised child could try to smuggle (os.system et al.): a pickle
    that resolves anything off-list raises instead of importing it."""
    import pickle
    from lepton_tpu.api import _restricted_loads

    class Evil:
        def __reduce__(self):
            return (os.system, ("true",))

    blob = pickle.dumps((True, Evil()))
    with pytest.raises(pickle.UnpicklingError):
        _restricted_loads(blob)


def test_cli_tpu_encode_parses_in_jail(tmp_path, monkeypatch):
    """-tpu happy-path encode routes the untrusted JPEG parse through the
    jailed forked child (VERDICT r3 item 9): assert the CLI path passes
    jailed_parse and still produces byte-identical output."""
    from lepton_tpu import api, cli
    monkeypatch.setenv("LEPTON_TPU_JAX_CACHE", "1")
    monkeypatch.setenv("LEPTON_TPU_JAX_CACHE_DIR", CACHE)
    seen = {}
    real = api._parse_jpeg_jailed

    def spy(data, allow_progressive, allow_four_colors=False):
        seen["called"] = True
        return real(data, allow_progressive, allow_four_colors)

    monkeypatch.setattr(api, "_parse_jpeg_jailed", spy)
    src = os.path.join(IMAGES, "nofsync.jpg")
    lep = tmp_path / "out.lep"
    assert cli.main(["-tpu", src, str(lep)]) == 0
    assert seen.get("called"), "-tpu encode did not use the jailed parse"
    from lepton_tpu.api import compress
    assert lep.read_bytes() == compress(open(src, "rb").read(),
                                        max_threads=16)
