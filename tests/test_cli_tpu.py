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
