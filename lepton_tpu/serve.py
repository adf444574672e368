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


def serve(socket_path, listen_port, zlib_port, max_children, opts) -> int:
    socks = []
    if socket_path:
        try:
            os.unlink(socket_path)
        except OSError:
            pass
        s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        s.bind(socket_path)
        s.listen(16)
        socks.append((s, False))
        sys.stderr.write(f"listening on {socket_path}\n")
    if listen_port:
        s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind(("0.0.0.0", listen_port))
        s.listen(16)
        socks.append((s, False))
        sys.stderr.write(f"listening on tcp {listen_port}\n")
    if zlib_port:
        s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind(("0.0.0.0", zlib_port))
        s.listen(16)
        socks.append((s, True))
        sys.stderr.write(f"listening on zlib tcp {zlib_port}\n")
    if not socks:
        return 1

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
