"""Server + verification-contract tests, mirroring the reference's
sockettester.py / test_roundtrip.sh / test_trunc.sh."""
import os
import signal
import socket
import subprocess
import time
import zlib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEPTON = os.path.join(REPO, "lepton")
IMAGES = "/root/reference/images"


def _pump(sock: socket.socket, payload: bytes) -> bytes:
    sock.sendall(payload)
    sock.shutdown(socket.SHUT_WR)
    chunks = []
    while True:
        b = sock.recv(65536)
        if not b:
            break
        chunks.append(b)
    sock.close()
    return b"".join(chunks)


def _wait_listening(check, timeout=60.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            return check()
        except OSError:
            time.sleep(0.2)
    raise TimeoutError("server did not come up")


@pytest.fixture
def server(tmp_path):
    """lepton serving UDS + TCP + zlib-TCP at once (socket_serve.cc
    binds all three, :288-310)."""
    sock_path = str(tmp_path / "lep.sock")
    import random
    port = random.randrange(20000, 40000)
    proc = subprocess.Popen(
        [LEPTON, f"-socket={sock_path}", f"-listen={port}",
         f"-zliblisten={port + 1}", "-maxchildren=4"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    def uds():
        s = socket.socket(socket.AF_UNIX)
        s.connect(sock_path)
        return s
    _wait_listening(uds).close()
    yield dict(sock=sock_path, port=port, zport=port + 1)
    proc.terminate()
    proc.wait(timeout=30)


def test_socket_serve_all_ports(server):
    data = open(os.path.join(IMAGES, "nofsync.jpg"), "rb").read()

    s = socket.socket(socket.AF_UNIX)
    s.connect(server["sock"])
    lep = _pump(s, data)
    assert lep[:2] == b"\xcf\x84"

    s = socket.create_connection(("127.0.0.1", server["port"]), timeout=60)
    lep2 = _pump(s, data)
    assert lep2 == lep

    # zlib port: request and reply both ride zlib streams
    s = socket.create_connection(("127.0.0.1", server["zport"]), timeout=60)
    zreply = _pump(s, zlib.compress(data))
    assert zlib.decompress(zreply) == lep

    # decode back over the UDS port
    s = socket.socket(socket.AF_UNIX)
    s.connect(server["sock"])
    back = _pump(s, lep)
    assert back == data


def test_roundtripfail_contract(tmp_path):
    """roundtripfail.jpg must fail (zero bytes, nonzero exit) with the
    default verify gate but encode with -skipverify (test_roundtrip.sh)."""
    src = os.path.join(IMAGES, "roundtripfail.jpg")
    out = str(tmp_path / "f.lep")
    r = subprocess.run([LEPTON, "-verify", src, out], capture_output=True,
                       timeout=300)
    assert r.returncode == 41  # ROUNDTRIP_FAILURE
    assert not os.path.exists(out) or os.path.getsize(out) == 0
    r = subprocess.run([LEPTON, "-skipverify", src, str(tmp_path / "g.lep")],
                       capture_output=True, timeout=300)
    assert r.returncode == 0
    assert os.path.getsize(str(tmp_path / "g.lep")) > 0


@pytest.mark.parametrize("frac", [0.25, 0.5, 0.75, 0.9, 0.99, 1.0])
def test_trunc_points(tmp_path, frac):
    """-trunc=N encode then decode equals head -c N (test_trunc.sh)."""
    src = os.path.join(IMAGES, "androidcrop.jpg")
    data = open(src, "rb").read()
    n = max(1024, int(len(data) * frac))
    lep = str(tmp_path / "t.lep")
    jpg = str(tmp_path / "t.jpg")
    r = subprocess.run([LEPTON, f"-trunc={n}", "-skipverify", src, lep],
                       capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr
    r = subprocess.run([LEPTON, lep, jpg], capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr
    assert open(jpg, "rb").read() == data[:n]


def test_timebound_kills_slow_request(tmp_path):
    """-timebound= must kill a request that exceeds its budget
    (sockettester.py's 10ms timeout case)."""
    sock_path = str(tmp_path / "tb.sock")
    proc = subprocess.Popen(
        [LEPTON, f"-socket={sock_path}", "-timebound=10ms"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    def uds():
        s = socket.socket(socket.AF_UNIX)
        s.connect(sock_path)
        return s
    _wait_listening(uds).close()
    try:
        data = open(os.path.join(IMAGES, "slrhills.jpg"), "rb").read()
        s = socket.socket(socket.AF_UNIX)
        s.connect(sock_path)
        try:
            out = _pump(s, data)
        except BrokenPipeError:
            out = b""   # child died while we were still uploading
        assert out == b""   # no reply: the request was killed
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_concurrent_connections(server):
    """sockettester.py-style concurrency: several interleaved connections
    served by forked children under back-pressure."""
    import threading
    data1 = open(os.path.join(IMAGES, "nofsync.jpg"), "rb").read()
    data2 = open(os.path.join(IMAGES, "androidcropoptions.jpg"), "rb").read()
    results = {}

    def worker(i, payload):
        s = socket.socket(socket.AF_UNIX)
        s.connect(server["sock"])
        results[i] = _pump(s, payload)

    threads = [threading.Thread(target=worker, args=(i, data1 if i % 2
                                else data2)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(results) == 6
    for i, lep in results.items():
        assert lep[:2] == b"\xcf\x84", i
    # identical inputs must give identical outputs
    assert results[1] == results[3] == results[5]
    assert results[0] == results[2] == results[4]


def test_tpu_batch_bounded_degrades_to_host(monkeypatch):
    """A HUNG accelerator runtime (dead TPU tunnel) never raises, so the
    batch must run under a wall-clock budget: on timeout every request
    degrades to the host codec (valid reply, not zero-byte), a cooldown
    routes later batches straight to the host, and failures keep the
    zero-byte contract."""
    import time
    from lepton_tpu import serve
    with open(os.path.join(IMAGES, "nofsync.jpg"), "rb") as f:
        jpeg = f.read()
    opts = dict(singlethread=False, allow_progressive=False, verify=True,
                permissive=False, even_split=False, max_threads=8,
                min_threads=1, version=1, lepcat=False, verbosity=0,
                overwrite=False, tpu=True)

    def hung_batch(reqs, o):
        time.sleep(60)
    monkeypatch.setattr(serve, "_process_tpu_batch", hung_batch)
    monkeypatch.setenv("LEPTON_TPU_BATCH_TIMEOUT_S", "1")
    monkeypatch.setattr(serve, "_tpu_down_until", 0.0)

    reqs = [[None, False, jpeg, b""], [None, False, b"not a jpeg", b""]]
    t0 = time.time()
    serve._process_batch_bounded(reqs, opts)
    elapsed = time.time() - t0
    assert elapsed < 30, "budget not enforced"
    from lepton_tpu.api import decompress
    assert decompress(reqs[0][3]) == jpeg     # host-path reply, valid
    assert reqs[1][3] == b""                  # zero-byte failure contract
    assert serve._tpu_down_until > time.monotonic()  # cooldown armed

    # while the cooldown holds, the batch path is never tried at all
    called = []
    monkeypatch.setattr(serve, "_process_tpu_batch",
                        lambda r, o: called.append(1))
    reqs2 = [[None, False, jpeg, b""]]
    serve._process_batch_bounded(reqs2, opts)
    assert not called and decompress(reqs2[0][3]) == jpeg


def test_serving_decode_defaults_to_streaming(monkeypatch):
    """Serving decodes O(width) by default: the lepton branch of
    cli._process must route single containers through
    decompress_streaming when opts carry the serving marker (and the
    bytes must match the full-framebuffer decode)."""
    from lepton_tpu import api, cli
    with open(os.path.join(IMAGES, "nofsync.jpg"), "rb") as f:
        jpeg = f.read()
    lep = api.compress(jpeg)
    calls = []
    real = api.decompress_streaming
    def spy(data):
        calls.append(1)
        return real(data)
    monkeypatch.setattr(api, "decompress_streaming", spy)
    out, kind = cli._process(lep, {"serving": True})
    assert kind == "lepton"
    assert out == jpeg
    assert calls, "serving decode did not take the streaming path"
    # without the marker the default remains the full decode
    calls.clear()
    out2, _ = cli._process(lep, {})
    assert out2 == jpeg and not calls
