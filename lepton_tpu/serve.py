"""Socket serving: unix-domain + TCP + zlib-TCP, fork-per-connection.

Mirror of the reference's socket_serve.cc: each accepted connection forks a
worker that reads the full request (until the peer half-closes), transcodes
it (JPEG -> .lep with verification, .lep -> JPEG), writes the response and
exits.  max_children provides back-pressure; children are reaped in the
accept loop.
"""
from __future__ import annotations

import os
import signal
import socket
import sys
import zlib


def _handle(conn: socket.socket, opts, zlib_wrap: bool) -> None:
    if opts.get("timebound_ms"):
        # kill this child if the request exceeds its time budget
        # (socket_serve children arm setitimer, jpgcoder.cc:1744-1760)
        import signal as _signal
        _signal.setitimer(_signal.ITIMER_REAL,
                          opts["timebound_ms"] / 1000.0)
    # jail the per-connection child before touching request bytes: only
    # the already-open connection fd is reachable afterwards
    # (socket_serve.cc children run inside seccomp the same way)
    if not opts.get("unjailed"):
        from .cli import _prepare_for_jail
        from .util.sandbox import install_jail
        _prepare_for_jail(opts)
        install_jail()
    chunks = []
    while True:
        b = conn.recv(65536)
        if not b:
            break
        chunks.append(b)
    data = b"".join(chunks)
    from .cli import _process
    try:
        if zlib_wrap:
            data = zlib.decompress(data)
        out, _ = _process(data, opts)
        if zlib_wrap:
            out = zlib.compress(out)
    except Exception:
        if opts.get("permissive"):
            from .api import generic_compress
            try:
                out = generic_compress(data)
            except Exception:
                out = b""
        else:
            out = b""
    try:
        conn.sendall(out)
        conn.shutdown(socket.SHUT_WR)
    except OSError:
        pass
    conn.close()


def _host_fallback(data: bytes, opts) -> bytes:
    """Degrade one request to the host codec in a JAILED forked child
    (the -tpu serving process itself cannot be jailed -- the JAX runtime
    needs its sockets -- but the fallback parses untrusted input, the
    exact surface the jail confines; the fork server gets the same
    isolation via its per-connection children).  A request that still
    fails gets the zero-byte reply, which also absorbs SystemExit (the
    -recodememory exit-38 path) inside the child."""
    from .cli import _host_fallback_jailed
    try:
        out = _host_fallback_jailed(data, opts)
        if out:
            return out
    except (Exception, SystemExit):
        pass
    if opts.get("permissive"):
        from .api import generic_compress
        try:
            return generic_compress(data)
        except Exception:
            pass
    return b""


def _process_tpu_batch(reqs, opts) -> None:
    """Transcode a batch of drained requests through the accelerator:
    all JPEG requests' segments become coder lanes of ONE
    batch_compress_tpu invocation (the serving-throughput design point);
    lepton requests decode via the TPU token parser.  Verify-by-default
    runs the independent host decoder per request; any failure degrades
    that request to the HOST path (tpu off, so a flapping tunnel or a
    batch-poisoning input cannot re-fail the fallback), and a request
    that still fails gets the zero-byte reply.

    reqs: list of [conn, zlib_wrap, data, out] (out filled in place).
    """
    from .api import batch_compress_tpu, batch_decompress_tpu, decompress
    from .cli import _process, sniff

    jpegs = [r for r in reqs if sniff(r[2]) == "jpeg"]
    leps = [r for r in reqs if sniff(r[2]) == "lepton"]
    others = [r for r in reqs
              if sniff(r[2]) not in ("jpeg", "lepton")]
    outs = None
    if jpegs:
        try:
            outs = batch_compress_tpu(
                [r[2] for r in jpegs],
                num_segments=opts.get("max_threads", 16),
                allow_progressive=opts.get("allow_progressive", False),
                jailed_parse=not opts.get("user_unjailed"))
        except (Exception, SystemExit):
            outs = None
    for i, r in enumerate(jpegs):
        out = b""
        if outs is not None:
            out = outs[i]
            if opts.get("verify", True):
                try:
                    if decompress(out) != r[2]:
                        out = b""
                except Exception:
                    out = b""
        if not out:
            out = _host_fallback(r[2], opts)
        r[3] = out
    if leps:
        # lepton -> JPEG rides one batched device-decode wave too
        # (socket_serve.cc serves both directions through the same
        # loop); per-request host fallback on any failure
        try:
            decs = batch_decompress_tpu([r[2] for r in leps])
        except (Exception, SystemExit):
            decs = [None] * len(leps)
        for r, out in zip(leps, decs):
            r[3] = out if out else _host_fallback(r[2], opts)
    for r in others:
        try:
            out, _ = _process(r[2], opts)   # accelerated decode path
        except (Exception, SystemExit):
            out = _host_fallback(r[2], opts)
        r[3] = out


_tpu_down_until = 0.0


def _process_batch_bounded(reqs, opts) -> None:
    """Run the accelerator batch under a deadline.  A HUNG device
    runtime (e.g. a dead TPU tunnel) never raises, so exception-based
    fallback alone would block the whole server on the first batch:
    the batch runs in a daemon thread with a wall-clock budget
    (LEPTON_TPU_BATCH_TIMEOUT_S, default 180 -- cold compiles are slow)
    and on timeout every request degrades to the host codec while a
    cooldown (LEPTON_TPU_COOLDOWN_S, default 300) routes subsequent
    batches straight to the host before the accelerator is retried."""
    global _tpu_down_until
    import threading
    import time

    now = time.monotonic()
    if now < _tpu_down_until:
        for r in reqs:
            r[3] = _host_fallback(r[2], opts)
        return
    # the worker gets its own result slots: if it wakes up after the
    # deadline it must not scribble over replies already sent
    work = [[None, r[1], r[2], b""] for r in reqs]

    def _run():
        try:
            _process_tpu_batch(work, opts)
        except (Exception, SystemExit) as e:
            sys.stderr.write(f"tpu batch failed: {e!r}\n")
            for w in work:
                if not w[3]:
                    w[3] = _host_fallback(w[2], opts)

    t = threading.Thread(target=_run, daemon=True)
    t.start()
    t.join(float(os.environ.get("LEPTON_TPU_BATCH_TIMEOUT_S", 180)))
    if t.is_alive():
        cooldown = float(os.environ.get("LEPTON_TPU_COOLDOWN_S", 300))
        _tpu_down_until = time.monotonic() + cooldown
        sys.stderr.write(f"tpu batch timed out; serving from the host "
                         f"path for {cooldown:.0f}s\n")
        for r in reqs:
            r[3] = _host_fallback(r[2], opts)
    else:
        for r, w in zip(reqs, work):
            r[3] = w[3]


def _serve_tpu(socks, opts) -> int:
    """Single-process accelerator serving loop, WAVE-pipelined (VERDICT
    r4 item 5): drained requests queue up and are transcoded in waves of
    LEPTON_TPU_SERVE_WAVE (default 8), each wave replied to as soon as
    it completes -- p50 latency tracks one wave, not the whole drain,
    and new connections accepted between waves join the next wave
    instead of the next drain.  No per-connection fork (the JAX runtime
    does not survive fork); isolation still holds per wave via the
    zero-byte contract."""
    import select
    import zlib as _zlib
    # pre-import the transcode modules so fallback forks never take the
    # import lock a hung device thread could hold (_host_fallback_jailed)
    from .cli import _prepare_for_jail
    _prepare_for_jail(dict(opts))
    wave_n = max(1, int(os.environ.get("LEPTON_TPU_SERVE_WAVE", 8)))
    sys.stderr.write("tpu batch serving enabled\n")
    import time as _time
    read_timeout = (opts["timebound_ms"] / 1000.0
                    if opts.get("timebound_ms") else 10.0)

    def read_request(conn, zw):
        # a stalled peer must not freeze the whole single-process loop:
        # bound each request read by WALL CLOCK, not per-recv -- a client
        # trickling one byte per 9s would never trip a per-recv timeout
        # (the fork path bounds children via -timebound= setitimer)
        chunks = []
        deadline = _time.monotonic() + read_timeout
        try:
            while True:
                left = deadline - _time.monotonic()
                if left <= 0:
                    chunks = []     # over budget: drop the request
                    break
                conn.settimeout(left)
                b = conn.recv(65536)
                if not b:
                    break
                chunks.append(b)
        except OSError:     # includes socket.timeout: drop request
            chunks = []
        data = b"".join(chunks)
        if zw:
            try:
                data = _zlib.decompress(data)
            except Exception:
                data = b""
        return data

    pending = []
    while True:
        # accept everything currently queued; block only when idle
        try:
            ready, _, _ = select.select(
                [s for s, _ in socks], [], [],
                0.005 if pending else None)
        except InterruptedError:
            continue
        while ready:
            for s in ready:
                zw = next(z for ss, z in socks if ss is s)
                try:
                    conn, _ = s.accept()
                except OSError:
                    continue
                pending.append([conn, zw, read_request(conn, zw), b""])
            try:
                ready, _, _ = select.select([s for s, _ in socks], [], [],
                                            0.005)
            except InterruptedError:
                ready = []
        if not pending:
            continue
        reqs = pending[:wave_n]
        del pending[:wave_n]
        try:
            _process_batch_bounded(reqs, opts)
            # observable wave fill (socket_serve.cc logs per-request;
            # the wave size is THE serving-efficiency statistic here)
            sys.stderr.write(
                f"tpu batch served n={len(reqs)} "
                f"bytes={sum(len(r[2]) for r in reqs)} "
                f"queued={len(pending)}\n")
            sys.stderr.flush()
        except (Exception, SystemExit) as e:   # keep the server alive
            sys.stderr.write(f"tpu batch failed: {e!r}\n")
        for conn, zw, _, out in reqs:
            if zw and out:
                # failures stay zero-byte on the zlib port too: an empty
                # reply is the failure contract, zlib.compress(b"") isn't
                out = _zlib.compress(out)
            try:
                conn.sendall(out)
                conn.shutdown(socket.SHUT_WR)
            except OSError:
                pass
            conn.close()
    return 0


def serve(socket_path, listen_port, zlib_port, max_children, opts) -> int:
    socks = []
    if socket_path:
        try:
            os.unlink(socket_path)
        except OSError:
            pass
        s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        s.bind(socket_path)
        s.listen(128)
        socks.append((s, False))
        sys.stderr.write(f"listening on {socket_path}\n")
    if listen_port:
        s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind(("0.0.0.0", listen_port))
        s.listen(128)
        socks.append((s, False))
        sys.stderr.write(f"listening on tcp {listen_port}\n")
    if zlib_port:
        s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind(("0.0.0.0", zlib_port))
        s.listen(128)
        socks.append((s, True))
        sys.stderr.write(f"listening on zlib tcp {zlib_port}\n")
    if not socks:
        return 1

    if opts.get("tpu"):
        return _serve_tpu(socks, opts)

    children = set()
    import select

    def reap():
        while children:
            try:
                pid, _ = os.waitpid(-1, os.WNOHANG)
            except ChildProcessError:
                children.clear()
                break
            if pid == 0:
                break
            children.discard(pid)

    while True:
        reap()
        timeout = 0.03 if children else None
        try:
            ready, _, _ = select.select([s for s, _ in socks], [], [],
                                        timeout)
        except InterruptedError:
            continue
        for s in ready:
            zlib_wrap = next(z for ss, z in socks if ss is s)
            if max_children and len(children) >= max_children:
                reap()
                if len(children) >= max_children:
                    continue
            try:
                conn, _ = s.accept()
            except OSError:
                continue
            pid = os.fork()
            if pid == 0:
                for ss, _ in socks:
                    ss.close()
                try:
                    _handle(conn, opts, zlib_wrap)
                finally:
                    os._exit(0)
            children.add(pid)
            conn.close()
    return 0


def fork_serve(opts) -> int:
    """Named-FIFO pre-fork server (reference fork_serve.cc:78-132).

    For each request: announce a fresh (input, output) FIFO pair on stdout,
    fork a worker that transcodes input -> output, repeat.  Compatible with
    the reference's forktester.py protocol.
    """
    import threading
    import uuid

    def _exit_on_stdin():
        # Parent lifetime is tied to the controlling process: when the
        # client closes our stdin, terminate (reference fork_serve.cc:40-55).
        try:
            while os.read(0, 4096):
                pass
        except OSError:
            pass
        os._exit(0)

    threading.Thread(target=_exit_on_stdin, daemon=True).start()

    while True:
        base = f"/tmp/{uuid.uuid4()}"
        in_path = base + ".in"
        out_path = base + ".out"
        os.mkfifo(in_path, 0o600)
        os.mkfifo(out_path, 0o600)
        sys.stdout.write(in_path + "\n" + out_path + "\n")
        sys.stdout.flush()
        rfd = os.open(in_path, os.O_RDONLY)
        wfd = os.open(out_path, os.O_WRONLY)
        os.unlink(in_path)
        os.unlink(out_path)
        pid = os.fork()
        if pid == 0:
            try:
                # jail the worker before touching request bytes, like the
                # socket children (only the open FIFOs remain reachable)
                if not opts.get("unjailed"):
                    from .cli import _prepare_for_jail
                    from .util.sandbox import install_jail
                    _prepare_for_jail(opts)
                    install_jail()
                chunks = []
                while True:
                    b = os.read(rfd, 65536)
                    if not b:
                        break
                    chunks.append(b)
                data = b"".join(chunks)
                from .cli import _process
                try:
                    out, _ = _process(data, opts)
                except Exception:
                    out = b""
                off = 0
                while off < len(out):
                    off += os.write(wfd, out[off:off + 65536])
            finally:
                os.close(rfd)
                os.close(wfd)
                os._exit(0)
        os.close(rfd)
        os.close(wfd)
        try:
            while os.waitpid(-1, os.WNOHANG)[0] > 0:
                pass
        except ChildProcessError:
            pass
