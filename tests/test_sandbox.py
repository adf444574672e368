"""Sandbox (seccomp-BPF jail) + exit-code contract tests.

Mirrors the reference's security test strategy (Makefile.am:261-275:
INJECT_SYSCALL variants must die under the jail; exit codes from
memory.hh:13-40; zero-byte output on failure, README.md:62-64).
"""
import os
import signal
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEPTON = os.path.join(REPO, "lepton")
IMAGES = "/root/reference/images"


def _run(args, **kw):
    env = dict(os.environ)
    env.pop("LEPTON_JAIL_MODE", None)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run([LEPTON] + args, capture_output=True, env=env,
                          timeout=300, **kw)


def _jail_supported():
    sys.path.insert(0, REPO)
    from lepton_tpu._native import get_lib
    return bool(get_lib().lepton_jail_supported())


jail = pytest.mark.skipif(not _jail_supported(),
                          reason="seccomp jail unsupported on this arch")


@jail
def test_jailed_roundtrip(tmp_path):
    src = os.path.join(IMAGES, "nofsync.jpg")
    lep = str(tmp_path / "x.lep")
    jpg = str(tmp_path / "x.jpg")
    assert _run([src, lep]).returncode == 0
    assert _run([lep, jpg]).returncode == 0
    assert open(jpg, "rb").read() == open(src, "rb").read()


@jail
@pytest.mark.parametrize("point", [1, 2, 3, 4])
def test_injectsyscall_killed(tmp_path, point):
    """A banned syscall from main thread or worker must kill the process
    with SIGSYS (jpgcoder.cc:1324 test_syscall_injection)."""
    src = os.path.join(IMAGES, "nofsync.jpg")
    lep = str(tmp_path / "x.lep")
    if point in (3, 4):
        assert _run([src, lep]).returncode == 0
        r = _run([f"-injectsyscall={point}", lep, str(tmp_path / "x.jpg")])
    else:
        r = _run([f"-injectsyscall={point}", src, lep])
    assert r.returncode == -signal.SIGSYS or r.returncode == 159
    if point in (1, 2):
        # zero-byte output contract holds even on SIGSYS death
        assert os.path.getsize(lep) == 0


@jail
def test_injectsyscall_mmap_killed_stage2(tmp_path):
    """The stage-2 memory filter (brk/mmap/mremap -> KILL after the heap
    is pre-grown) must kill a direct mmap (-injectsyscall=5): the
    preallocate-then-strict-filter shape of MemMgrAllocator.cc:159 +
    Seccomp.cc:67-138."""
    src = os.path.join(IMAGES, "nofsync.jpg")
    lep = str(tmp_path / "x.lep")
    r = _run(["-injectsyscall=5", src, lep])
    assert r.returncode == -signal.SIGSYS or r.returncode == 159
    assert os.path.getsize(lep) == 0
    # and without injection the stage-2-jailed transcode still works
    assert _run([src, lep]).returncode == 0


@jail
def test_jail_covers_preexisting_threads():
    """The filter must bind threads spawned BEFORE install_jail: the
    pre-jail warm pool (api._warm_pool) runs the segment codecs over
    untrusted input, and prctl(PR_SET_SECCOMP) binds only the calling
    thread.  install_jail uses seccomp(2)+TSYNC so a banned syscall
    from a pre-existing thread still kills the process (the reference
    spawns GenericWorkers pre-seccomp and relies on the same per-thread
    coverage, generic_worker.cc:97-100 + Seccomp.cc)."""
    code = (
        "import sys, threading\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "from lepton_tpu.util import sandbox\n"
        "ready = threading.Event(); go = threading.Event()\n"
        "def worker():\n"
        "    ready.set()\n"
        "    go.wait(10)\n"
        "    sandbox.inject_syscall()  # banned: must kill the process\n"
        "t = threading.Thread(target=worker); t.start()\n"
        "ready.wait(10)\n"
        "assert sandbox.install_jail()\n"
        "go.set(); t.join(10)\n"
        "print('survived')  # only reachable if the thread escaped\n"
    )
    env = dict(os.environ)
    env.pop("LEPTON_JAIL_MODE", None)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       env=env, timeout=120)
    assert r.returncode in (-signal.SIGSYS, 159), (r.returncode, r.stdout,
                                                   r.stderr)
    assert b"survived" not in r.stdout


@jail
def test_injectsyscall_survives_unjailed(tmp_path):
    src = os.path.join(IMAGES, "nofsync.jpg")
    r = _run(["-unjailed", "-injectsyscall=1", src, str(tmp_path / "x.lep")])
    assert r.returncode == 0


def test_membound_calibrated():
    """The decompression memory-bound oracle must bound the decode's
    actual peak allocation (measured via tracemalloc, which traces
    numpy buffers) -- the constants are calibrated, not guessed
    (reference decompression_memory_bound, jpgcoder.cc:1236-1316)."""
    import tracemalloc
    from lepton_tpu.api import (compress, decompress_streaming,
                                image_info_from_header, read_container)
    from lepton_tpu.util.membound import decompression_memory_bound

    for name in ("androidcrop.jpg", "narrowrst.jpg"):
        data = open(os.path.join(IMAGES, name), "rb").read()
        lep = compress(data, min_threads=2)
        hdr, _ = read_container(lep)
        info = image_info_from_header(hdr.hdrdata, allow_34=True)
        bound = decompression_memory_bound(
            info, hdr.num_threads, hdr.original_size, streaming=True)
        decompress_streaming(lep)            # warm lazy inits
        tracemalloc.start()
        out = decompress_streaming(lep)
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        assert out == data
        assert peak <= bound, (name, peak, bound)


def test_exit_code_parity(tmp_path):
    """Exit codes match the reference vocabulary (memory.hh:13-40)."""
    out = str(tmp_path / "o.lep")
    cases = [
        (["/nonexistent/in.jpg", out], 9),                       # FILE_NOT_FOUND
        ([os.path.join(IMAGES, "arithmetic.jpg"), out], 42),     # UNSUPPORTED_JPEG
        (["-rejectprogressive",
          os.path.join(IMAGES, "iphoneprogressive.jpg"), out], 8),
    ]
    for args, code in cases:
        r = _run(args)
        assert r.returncode == code, (args, r.returncode, r.stderr)
        assert not os.path.exists(out) or os.path.getsize(out) == 0
        if os.path.exists(out):
            os.unlink(out)


def test_memory_bound_exit_code(tmp_path):
    src = os.path.join(IMAGES, "nofsync.jpg")
    lep = str(tmp_path / "m.lep")
    assert _run([src, lep]).returncode == 0
    r = _run(["-recodememory=1k", lep, str(tmp_path / "m.jpg")])
    assert r.returncode == 38  # TOO_MUCH_MEMORY_NEEDED


def test_memory_envelope(tmp_path):
    """-memory= is a hard RLIMIT_AS ceiling (jpgcoder.cc:829-894): ample
    limits succeed, tiny limits fail cleanly with nonzero exit and zero
    output bytes."""
    src = os.path.join(IMAGES, "androidcrop.jpg")
    lep = str(tmp_path / "m.lep")
    r = _run(["-memory=2048M", "-unjailed", src, lep])
    assert r.returncode == 0, r.stderr
    assert os.path.getsize(lep) > 0
    out2 = str(tmp_path / "m2.lep")
    r = _run(["-memory=48M", "-unjailed", src, out2])
    assert r.returncode != 0
    assert not os.path.exists(out2) or os.path.getsize(out2) == 0


@jail
def test_timing_log_survives_jail(tmp_path):
    """-timing= must not die under the jail: the log fd is opened in
    _prepare_for_jail (pre-seccomp), so the transcode completes and the
    log is written (ADVICE r1: openat under SECCOMP_RET_KILL_PROCESS
    raises SIGSYS, not OSError)."""
    src = os.path.join(IMAGES, "androidcrop.jpg")
    lep = str(tmp_path / "t.lep")
    log = str(tmp_path / "timing.log")
    r = _run([f"-timing={log}", src, lep])
    assert r.returncode == 0, (r.returncode, r.stderr)
    assert os.path.getsize(lep) > 0
    assert os.path.exists(log) and os.path.getsize(log) > 0


def test_timing_matrix_per_thread(tmp_path):
    """-timing= emits the reference's per-(stage, thread) timestamp
    matrix (jpgcoder.hh:25-56 TimingHarness::print_results): each
    worker's ARITH span appears under its own thread index."""
    src = os.path.join(IMAGES, "iphone.jpg")  # 8-segment encode
    lep = str(tmp_path / "t.lep")
    log = str(tmp_path / "timing.log")
    r = _run([f"-timing={log}", "-unjailed", src, lep])
    assert r.returncode == 0, (r.returncode, r.stderr)
    text = open(log).read()
    rows = [ln.split("\t") for ln in text.splitlines() if "\t" in ln]
    cells = {(name, th) for name, th, _ in rows}
    assert ("TS_ARITH_STARTED", "(0)") in cells, text
    assert ("TS_ARITH_FINISHED", "(0)") in cells, text
    # multi-segment encode: at least one worker beyond thread 0
    threads = {th for name, th in cells if name == "TS_ARITH_STARTED"}
    assert len(threads) >= 2, text


def test_cli_benchmark_reference_semantics(tmp_path):
    """-benchmark honors -benchreps/-benchthreads (benchmark.cc:66-263):
    forked codecs each roundtrip the input reps times behind an md5
    gate and an aggregate bytes/sec line is reported."""
    src = os.path.join(IMAGES, "nofsync.jpg")
    r = _run(["-benchmark", "-benchreps=2", "-benchthreads=2", src])
    assert r.returncode == 0, (r.returncode, r.stderr)
    err = r.stderr.decode()
    assert "throughput:" in err and "bytes/sec" in err, err
    # no input file: embedded tiny JPEG is used (smalljpg.hh equivalent)
    r = _run(["-benchmark", "-benchreps=1"])
    assert r.returncode == 0, (r.returncode, r.stderr)


@jail
def test_stdin_mode_is_jailed(tmp_path):
    """Piped transcodes (no file operands) run under the same default-on
    jail: -injectsyscall=1 must die with SIGSYS in stdin/stdout mode too
    (ADVICE r1: the no-files branch used to return before jailing)."""
    src = open(os.path.join(IMAGES, "androidcrop.jpg"), "rb").read()
    r = _run(["-injectsyscall=1"], input=src)
    assert r.returncode in (-signal.SIGSYS, 128 + signal.SIGSYS, 159), \
        (r.returncode, r.stderr)
    # and a clean piped roundtrip still works under the jail
    r = _run([], input=src)
    assert r.returncode == 0, r.stderr
    r2 = _run([], input=r.stdout)
    assert r2.returncode == 0 and r2.stdout == src


def test_recodememory_checks_fallback_bound(tmp_path):
    """-recodememory on a v3 (ANS) container must check the bound of the
    decode that actually runs: decompress_streaming falls back to the
    full-framebuffer decode for v3, which needs more memory (ADVICE r1).
    A limit that only covers the streaming footprint must exit 38."""
    sys.path.insert(0, REPO)
    from lepton_tpu.api import read_container, image_info_from_header
    from lepton_tpu.util.membound import decompression_memory_bound

    src = os.path.join(IMAGES, "androidcrop.jpg")
    lep = str(tmp_path / "a.lep")
    r = _run(["-ans", "-unjailed", src, lep])
    assert r.returncode == 0, r.stderr
    hdr, _ = read_container(open(lep, "rb").read())
    assert hdr.version == 3
    info = image_info_from_header(hdr.hdrdata, allow_34=True)
    lo = decompression_memory_bound(info, hdr.num_threads,
                                    hdr.original_size, streaming=True)
    hi = decompression_memory_bound(info, hdr.num_threads,
                                    hdr.original_size, streaming=False)
    assert lo < hi
    mid = (lo + hi) // 2
    r = _run([f"-recodememory={mid}", "-unjailed", lep,
              str(tmp_path / "a.jpg")])
    assert r.returncode == 38, (r.returncode, r.stderr)
    r = _run([f"-recodememory={hi + 1}", "-unjailed", lep,
              str(tmp_path / "a2.jpg")])
    assert r.returncode == 0, (r.returncode, r.stderr)
    assert open(tmp_path / "a2.jpg", "rb").read() == \
        open(src, "rb").read()
