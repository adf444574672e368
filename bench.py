#!/usr/bin/env python3
"""Benchmark driver: encode+decode MB/s on the reference images/ corpus.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N, ...}

- Host path: native C segment codec + Huffman layers (the production host
  runtime), with bit-exact roundtrip verification on every file.
- TPU path: phase-A context kernels (IDCT/summaries/aavrg/Lakhani/DC
  prediction) throughput on the largest corpus image, reported as a
  sub-metric.

vs_baseline divides by the reference binary's measured roundtrip aggregate
on this host (BASELINE.md: 4.45 MB/s); the reference publishes no absolute
numbers upstream.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CORPUS = [
    "colorswap.jpg", "nofsync.jpg", "narrowrst.jpg", "androidcrop.jpg",
    "gray2sf.jpg", "androidtrail.jpg", "android.jpg", "iphonecrop2.jpg",
    "grayscale.jpg", "trailingrst.jpg", "trailingrst2.jpg", "iphonecrop.jpg",
    "androidcropoptions.jpg", "iphone.jpg", "iphonecity.jpg", "slrhills.jpg",
    "slrindoor.jpg", "singlerowtrunc.jpg", "truncatedzerorun.jpg",
    "iphoneprogressive.jpg", "iphoneprogressive2.jpg",
    "androidprogressive.jpg",
]
IMAGES_DIR = "/root/reference/images"

# Reference binary (cmake Release build of /root/reference) measured on this
# host over this exact corpus: per-file subprocess encode (-skipverify
# -unjailed -allowprogressive) + decode, aggregate 2*bytes/(t_enc+t_dec).
# Measured 2026-08-16: enc 4.11 MB/s, dec 4.86 MB/s, roundtrip 4.45 MB/s.
#
# Ratio bookkeeping (resolved r2): per-file .lep sizes are byte-count
# IDENTICAL to the reference binary's on all 22 corpus files (verified
# live; measure_reference_live asserts it every run).  The r1 "0.6949 vs
# 0.7567" discrepancy was two different statistics: mean-of-per-file
# ratios including the gray2sf.jpg outlier (0.0121) vs a bytes-weighted
# aggregate over a slightly different file set.  Both are reported below.
REFERENCE_ROUNDTRIP_MBPS = 4.45

_TPU_PROBE = None


def tpu_reachable(timeout_s: int = 240) -> bool:
    """Probe the TPU backend in a SUBPROCESS with a timeout.

    The axon tunnel relay can die host-side (observed r3: the relay
    exits on stdin EOF); jax.devices() then blocks forever in backend
    init rather than erroring, which would hang the whole bench.  A
    killed subprocess keeps the probe bounded; the result is cached.
    The tunnel also FLAPS (observed r3: down for minutes, then back), so
    a failed probe is retried once after a pause before giving up."""
    global _TPU_PROBE
    if _TPU_PROBE is None:
        import subprocess
        timeout_s = int(os.environ.get("LEPTON_TPU_PROBE_TIMEOUT",
                                       timeout_s))
        for attempt in range(2):
            try:
                r = subprocess.run(
                    [sys.executable, "-c",
                     "import jax; d = jax.devices(); "
                     "print(d[0].platform)"],
                    capture_output=True, timeout=timeout_s, text=True)
                _TPU_PROBE = r.returncode == 0 and "tpu" in r.stdout
            except subprocess.TimeoutExpired:
                _TPU_PROBE = False
            if _TPU_PROBE or attempt:
                break
            time.sleep(60)
    return _TPU_PROBE


def bench_host():
    from lepton_tpu.api import compress, decompress
    # warm-up: exclude one-time costs (imports, .so load, lazy inits)
    # from the first timed file
    warm = open(os.path.join(IMAGES_DIR, "nofsync.jpg"), "rb").read()
    decompress(compress(warm))
    total_bytes = 0
    total_lep = 0
    lep_sizes = {}
    enc_time = 0.0
    dec_time = 0.0
    ratios = []
    failures = []
    n_files = 0
    for name in CORPUS:
        path = os.path.join(IMAGES_DIR, name)
        if not os.path.exists(path):
            continue
        data = open(path, "rb").read()
        try:
            # best-of-2 per stage: the 1-vCPU host jitters +-15%, and a
            # single sample per file makes the aggregate noisy
            et = dt = 1e18
            for _ in range(2):
                t0 = time.perf_counter()
                lep = compress(data, allow_progressive=True)
                t1 = time.perf_counter()
                out = decompress(lep)
                t2 = time.perf_counter()
                et = min(et, t1 - t0)
                dt = min(dt, t2 - t1)
        except Exception as e:
            failures.append(f"{name}: {e!r}")
            continue
        if out != data:
            failures.append(f"{name}: roundtrip mismatch")
            continue
        n_files += 1
        total_bytes += len(data)
        total_lep += len(lep)
        enc_time += et
        dec_time += dt
        ratios.append(len(lep) / len(data))
        lep_sizes[name] = len(lep)
    mb = total_bytes / 1e6
    return dict(
        n_files=n_files,
        corpus_mb=round(mb, 2),
        encode_mbps=round(mb / enc_time, 2) if enc_time else 0.0,
        decode_mbps=round(mb / dec_time, 2) if dec_time else 0.0,
        roundtrip_mbps=round(2 * mb / (enc_time + dec_time), 2)
        if enc_time + dec_time else 0.0,
        avg_ratio=round(sum(ratios) / len(ratios), 4) if ratios else None,
        agg_ratio=round(total_lep / total_bytes, 4) if total_bytes else None,
        failures=failures,
        lep_sizes=lep_sizes,
    )


def measure_reference_live(our_sizes=None):
    """Measure the reference binary on the same corpus, same host, same
    moment: the stored constant below was taken during a fast phase of this
    noisy VM, so the honest vs_baseline divides by a live same-conditions
    number whenever the binary can be found or built.

    When our_sizes is given, also asserts per-file .lep size equality
    against our encoder's output (the byte-identity bookkeeping gate);
    returns (mbps, size_parity dict)."""
    import shutil
    import subprocess
    binpath = "/tmp/refbuild/lepton"
    if not os.path.exists(binpath):
        try:
            if not (os.path.isdir("/root/reference")
                    and shutil.which("cmake") and shutil.which("ninja")):
                return None, None
            os.makedirs("/tmp/refbuild", exist_ok=True)
            subprocess.run(["cmake", "/root/reference",
                            "-DCMAKE_BUILD_TYPE=Release", "-G", "Ninja"],
                           cwd="/tmp/refbuild", capture_output=True,
                           timeout=600, check=True)
            subprocess.run(["ninja", "lepton"], cwd="/tmp/refbuild",
                           capture_output=True, timeout=1200, check=True)
        except Exception:
            return None, None
    total = 0
    te = td = 0.0
    mismatches = []
    n_compared = 0
    try:
        for name in CORPUS:
            src = os.path.join(IMAGES_DIR, name)
            if not os.path.exists(src):
                continue
            n = os.path.getsize(src)
            lf = "/tmp/_benchref.lep"
            of = "/tmp/_benchref.jpg"
            et = dt = 1e18
            for _ in range(2):
                t0 = time.perf_counter()
                r = subprocess.run([binpath, "-skipverify", "-unjailed",
                                    "-allowprogressive", src, lf],
                                   capture_output=True, timeout=600)
                t1 = time.perf_counter()
                if r.returncode != 0:
                    raise RuntimeError(name)
                t2 = time.perf_counter()
                r = subprocess.run([binpath, "-unjailed", lf, of],
                                   capture_output=True, timeout=600)
                t3 = time.perf_counter()
                if r.returncode != 0:
                    raise RuntimeError(name)
                et = min(et, t1 - t0)
                dt = min(dt, t3 - t2)
            if our_sizes and name in our_sizes:
                n_compared += 1
                ref_sz = os.path.getsize(lf)
                if ref_sz != our_sizes[name]:
                    mismatches.append(
                        f"{name}: ours={our_sizes[name]} ref={ref_sz}")
            total += n
            te += et
            td += dt
    except Exception:
        return None, None
    if not total or not (te + td):
        return None, None
    parity = dict(files_compared=n_compared, mismatches=mismatches)
    return round(2 * (total / 1e6) / (te + td), 2), parity


def bench_ans_v3():
    """Native rANS backend (format v3) roundtrip on one mid-size image.
    slrhills (3.09MB) keeps per-call overhead out of the number; the tiny
    iphonecrop made this submetric swing ~30% run to run."""
    try:
        from lepton_tpu.api import compress, decompress
        path = os.path.join(IMAGES_DIR, "slrhills.jpg")
        data = open(path, "rb").read()
        lep = compress(data, version=3)
        assert decompress(lep) == data
        et = dt = 1e18
        for _ in range(2):
            t0 = time.perf_counter()
            lep = compress(data, version=3)
            t1 = time.perf_counter()
            out = decompress(lep)
            t2 = time.perf_counter()
            et = min(et, t1 - t0)
            dt = min(dt, t2 - t1)
        assert out == data
        mb = len(data) / 1e6
        res = dict(encode_mbps=round(mb / et, 2),
                   decode_mbps=round(mb / dt, 2),
                   ratio=round(len(lep) / len(data), 4))
        # live same-host comparison against the reference's own ANS
        # build (same subprocess methodology as the VPX baseline above);
        # rebuild it when missing (r4 silently dropped the ref fields
        # because the build was absent -- VERDICT r4 item 7).  NOTE: must
        # use the cmake OPTION, not CXX_FLAGS (CLAUDE.md: the flags-only
        # build produces a binary that asserts on encode).
        refbin = "/tmp/refbuild-ans/lepton"
        if not os.path.exists(refbin):
            import shutil
            import subprocess
            try:
                if os.path.isdir("/root/reference") and shutil.which("cmake") \
                        and shutil.which("ninja"):
                    os.makedirs("/tmp/refbuild-ans", exist_ok=True)
                    subprocess.run(
                        ["cmake", "/root/reference",
                         "-DCMAKE_BUILD_TYPE=Release", "-G", "Ninja",
                         "-DENABLE_ANS_EXPERIMENTAL=ON"],
                        cwd="/tmp/refbuild-ans", capture_output=True,
                        timeout=600, check=True)
                    subprocess.run(["ninja", "lepton"],
                                   cwd="/tmp/refbuild-ans",
                                   capture_output=True, timeout=1200,
                                   check=True)
            except Exception:
                pass
        if os.path.exists(refbin):
            import subprocess
            ret = rdt = 1e18
            try:
                for _ in range(2):
                    t0 = time.perf_counter()
                    subprocess.run([refbin, "-ans", "-skipverify",
                                    "-unjailed",
                                    path, "/tmp/_bench_ans.lep"],
                                   capture_output=True, timeout=600,
                                   check=True)
                    t1 = time.perf_counter()
                    subprocess.run([refbin, "-unjailed",
                                    "/tmp/_bench_ans.lep",
                                    "/tmp/_bench_ans.jpg"],
                                   capture_output=True, timeout=600,
                                   check=True)
                    t2 = time.perf_counter()
                    ret = min(ret, t1 - t0)
                    rdt = min(rdt, t2 - t1)
                res["ref_ans_encode_mbps"] = round(mb / ret, 2)
                res["ref_ans_decode_mbps"] = round(mb / rdt, 2)
                res["vs_ref_ans_roundtrip"] = round(
                    (2 * mb / (et + dt)) / (2 * mb / (ret + rdt)), 2)
            except Exception:
                pass
        return res
    except Exception as e:
        return dict(error=repr(e)[:200])


def bench_tpu_phase_a():
    try:
        import jax
        import jax.numpy as jnp
        import numpy as np
        from lepton_tpu.kernels import contexts as K
        from lepton_tpu.jpeg.parser import parse_jpeg
        from lepton_tpu.jpeg.imageinfo import image_info_from_header
        from lepton_tpu.jpeg.decoder import decode_scans
        from lepton_tpu.model.context import ColorTables

        path = os.path.join(IMAGES_DIR, "iphone.jpg")
        if not os.path.exists(path):
            return None
        data = open(path, "rb").read()
        parsed = parse_jpeg(data)
        info = image_info_from_header(parsed.hdrdata)
        dec = decode_scans(parsed, info)
        colors = ColorTables(info.qtables[info.cmpnfo[0].qtable_index])
        coefs = jnp.asarray(dec.planes[0])
        quant = jnp.asarray(colors.quant, dtype=jnp.int32)
        icx = jnp.asarray(colors.icos_idct_edge_8192_dequantized_x,
                          dtype=jnp.int32)
        icy = jnp.asarray(colors.icos_idct_edge_8192_dequantized_y,
                          dtype=jnp.int32)

        fn = jax.jit(lambda c: K.phase_a(c, quant, icx, icy))
        out = fn(coefs)
        np.asarray(out["dc_pred"][0, 0])   # forced fetch: block_until_
        # ready does NOT block through the axon tunnel (measured r3)
        # fresh device-resident inputs each rep: defeats any transport-level
        # result caching and excludes host->device transfer from the timing
        bump = jax.jit(lambda x, k: (x + k).astype(x.dtype))
        reps = 5
        xs = [bump(coefs, k + 1) for k in range(reps)]
        np.asarray(xs[-1][0, 0, 0])
        t0 = time.perf_counter()
        for x in xs:
            out = fn(x)
        np.asarray(out["dc_pred"][0, 0])
        dt = (time.perf_counter() - t0) / reps
        nblocks = coefs.shape[0] * coefs.shape[1]
        return dict(
            backend=jax.devices()[0].platform,
            blocks=int(nblocks),
            phase_a_mblocks_per_s=round(nblocks / dt / 1e6, 2),
            phase_a_coef_gbps=round(nblocks * 64 * 2 / dt / 1e9, 2),
        )
    except Exception as e:
        return dict(error=repr(e)[:200])


def bench_tpu_phase_b():
    """Sort-based two-pass phase-B coder (kernels/vpx_scan
    encode_streams_twopass): real symbol streams from a corpus image,
    many segments per lane, min-of-3 timing with on-device input
    variation (the tunnel memoizes identical executions)."""
    try:
        import jax
        import jax.numpy as jnp
        import numpy as np
        from lepton_tpu import _native
        from lepton_tpu.kernels import vpx_scan
        from lepton_tpu.jpeg.parser import parse_jpeg
        from lepton_tpu.jpeg.imageinfo import image_info_from_header
        from lepton_tpu.jpeg.decoder import decode_scans
        from lepton_tpu.api import _truncation_geometry, _native_image

        path = os.path.join(IMAGES_DIR, "androidcrop.jpg")
        data = open(path, "rb").read()
        parsed = parse_jpeg(data)
        info = image_info_from_header(parsed.hdrdata)
        dec = decode_scans(parsed, info)
        mh, cs = _truncation_geometry(info, dec)
        img = _native_image(info, dec.planes, mh, cs)
        bcv = info.cmpnfo[0].bcv
        nseg = min(64, bcv)
        bounds = [bcv * i // nseg for i in range(nseg + 1)]
        segs = [_native.native_symbolize_segment(
            img, bounds[i], bounds[i + 1], i == nseg - 1)
            for i in range(nseg)]
        total = sum(len(i) for i, _ in segs)
        idxs, bits = vpx_scan.build_symbol_streams(segs)
        # batch 8 copies on the lane axis: lanes are O(1) state in the
        # two-pass design, so segment count is free parallelism
        reps_axis = 8
        idxs = np.tile(idxs, (reps_axis, 1))
        bits = np.tile(bits, (reps_axis, 1))
        ij, bj = jax.device_put(idxs), jax.device_put(bits)
        out = vpx_scan.encode_streams_twopass(ij, bj)
        np.asarray(out[3])                   # compile + settle
        ibump = jax.jit(lambda i, k: jnp.where(
            (jnp.arange(i.shape[1]) + k) % 13 == 0,
            jnp.abs(i), i).astype(jnp.int32))
        best = 1e18
        for r in range(3):
            i2 = ibump(ij, r + 1)
            np.asarray(i2[-1, -1:])
            t0 = time.perf_counter()
            out = vpx_scan.encode_streams_twopass(i2, bj)
            np.asarray(out[3])
            best = min(best, time.perf_counter() - t0)
        nsym = int(total) * reps_axis
        return dict(
            backend=jax.devices()[0].platform,
            segments=nseg * reps_axis,
            symbols=nsym,
            phase_b_msym_per_s=round(nsym / best / 1e6, 2),
        )
    except Exception as e:
        return dict(error=repr(e)[:200])


def bench_tpu_e2e_encode():
    """Full on-device encode (api.compress_tpu): host JPEG parse, then
    symbolization + stream assembly + two-pass coding on the chip (only
    row counts and the compacted coder output cross the link).  Warm
    number excludes per-geometry compilation."""
    try:
        import jax
        from lepton_tpu.api import compress_tpu, compress, decompress

        path = os.path.join(IMAGES_DIR, "androidcrop.jpg")
        data = open(path, "rb").read()
        t0 = time.perf_counter()
        lep = compress_tpu(data, num_segments=8)
        cold = time.perf_counter() - t0
        assert decompress(lep) == data
        best = 1e18
        for _ in range(2):
            t0 = time.perf_counter()
            lep = compress_tpu(data, num_segments=8)
            best = min(best, time.perf_counter() - t0)
        return dict(
            backend=jax.devices()[0].platform,
            image="androidcrop.jpg",
            cold_s=round(cold, 1),
            warm_s=round(best, 2),
            encode_mbps=round(len(data) / 1e6 / best, 3),
            bit_exact=True,
        )
    except Exception as e:
        return dict(error=repr(e)[:200])


def bench_tpu_decode():
    """Token decode ON SILICON (kernels/pallas_decode: Mosaic block
    decoder, VMEM-resident model, one grid step per segment) -- decode a
    4-segment container on the real chip, verify bit-exactness against
    the host decoder, report honest throughput.

    Measured design envelope (r3 probes, tools + NEXT_STEPS): a
    dependent one-hot VMEM RMW chain sustains ~6M branch accesses/s and
    interleaving independent chains does not scale (K=4 -> 1.15x), so
    adaptive-arithmetic DECODE is latency-bound on the VPU and loses to
    the serial host C decoder by design; this submetric exists to keep
    the silicon path honest, not to win."""
    try:
        import jax
        from lepton_tpu.api import compress, decompress_tpu

        path = os.path.join(IMAGES_DIR, "androidcrop.jpg")
        data = open(path, "rb").read()
        lep = compress(data, min_threads=4)
        backend = jax.devices()[0].platform
        out = decompress_tpu(lep)          # backend="auto": pallas on tpu
        assert out == data
        best = 1e18
        for _ in range(2):
            t0 = time.perf_counter()
            out = decompress_tpu(lep)
            best = min(best, time.perf_counter() - t0)
        assert out == data
        nblocks = 126 * 86 + 2 * 63 * 43
        comp_bits = 8 * len(lep)
        res = dict(backend=backend,
                   kernel="pallas" if backend == "tpu" else "xla",
                   segments=4, blocks=nblocks,
                   decode_s=round(best, 2),
                   decode_kblocks_per_s=round(nblocks / best / 1e3, 2),
                   decode_kbit_per_s=round(comp_bits / best / 1e3, 1),
                   bit_exact=True)
        # the 16-segment golden decode ON SILICON, in the bench proper
        # (VERDICT r4 item 4: not hidden behind LEPTON_SLOW_TESTS): the
        # reference's own iphone16.lep artifact, md5-gated
        try:
            import hashlib
            gold = open("/root/reference/images/iphone16.lep",
                        "rb").read()
            t0 = time.perf_counter()
            jp = decompress_tpu(gold)
            res["iphone16_decode_s"] = round(time.perf_counter() - t0, 1)
            res["iphone16_md5_ok"] = hashlib.md5(jp).hexdigest() == \
                "8ea9fcf1b2c24877aa838dd6ac1df413"
        except Exception as e:
            res["iphone16_error"] = repr(e)[:120]
        return res
    except Exception as e:
        return dict(error=repr(e)[:200])


def bench_tpu_batch_encode():
    """THE chip-throughput headline (SURVEY.md section 6): the whole
    corpus batch-encoded in one batch_compress_tpu call -- every image's
    segments are coder lanes of one phase-B invocation.  Reports warm
    wall-clock MB/s/chip and verifies every container byte-identical to
    the host encoder and bit-exact on roundtrip."""
    try:
        import jax
        from lepton_tpu.api import batch_compress_tpu, compress, decompress

        blobs, names = [], []
        for name in CORPUS:
            path = os.path.join(IMAGES_DIR, name)
            if os.path.exists(path):
                blobs.append(open(path, "rb").read())
                names.append(name)
        mb = sum(len(b) for b in blobs) / 1e6
        t0 = time.perf_counter()
        outs = batch_compress_tpu(blobs, num_segments=16,
                                  allow_progressive=True)
        cold = time.perf_counter() - t0
        best = 1e18
        for _ in range(2):
            t0 = time.perf_counter()
            outs = batch_compress_tpu(blobs, num_segments=16,
                                      allow_progressive=True)
            best = min(best, time.perf_counter() - t0)
        # stage breakdown of the LAST warm run: where the wall-clock
        # goes (dispatch is async, so device compute surfaces inside
        # the blocking counts/nbytes/output fetches; over the tunnel
        # those fetches are round-trip-bound, not compute-bound)
        from lepton_tpu.kernels.encode_pipeline import LAST_PROFILE
        stages = {k: round(v, 2) for k, v in LAST_PROFILE.items()}
        mismatch = []
        for name, b, o in zip(names, blobs, outs):
            if decompress(o) != b:
                mismatch.append(name + ":roundtrip")
            if o != compress(b, max_threads=16, allow_progressive=True):
                mismatch.append(name + ":bytes")
        return dict(backend=jax.devices()[0].platform,
                    files=len(blobs), corpus_mb=round(mb, 1),
                    cold_s=round(cold, 1), warm_s=round(best, 1),
                    encode_mbps=round(mb / best, 2),
                    stages_last_run_s=stages,
                    byte_identical=not mismatch, mismatches=mismatch)
    except Exception as e:
        return dict(error=repr(e)[:200])


def _gen_knee_corpus(n: int = 128, side: int = 1024, seed: int = 7,
                     quality: int = 92):
    """n distinct synthetic JPEGs big enough that choose_num_threads
    assigns 16 segments each (scan >= 500KB, jpgcoder.cc:3898-3916), so
    n x 16 = 2048 coder lanes -- the measured phase-B knee
    (tools/phaseb_scaling.py: ~500 Msym/s marginal at 2048 lanes).

    The r4 version generated ~32KB images whose scans collapsed to ONE
    segment each (128 lanes, not 2048); side=1024 with sigma-20 noise at
    q92 measures a 572KB scan over 65 luma block rows (VERDICT r4 item 1).
    Distinct pixel content defeats the tunnel's identical-execution
    memoization.  Generation is cached on disk: ~10s of PIL work."""
    import io
    import numpy as np
    try:
        from PIL import Image
    except ImportError:
        return None
    cache = f"/tmp/lepton_knee_{n}x{side}q{quality}s{seed}"
    if os.path.isdir(cache):
        try:
            blobs = [open(os.path.join(cache, f"{i:03}.jpg"), "rb").read()
                     for i in range(n)]
            if all(blobs):
                return blobs
        except OSError:
            pass
    rng = np.random.default_rng(seed)
    blobs = []
    for i in range(n):
        yy, xx = np.mgrid[0:side, 0:side]
        base = (xx * (80 + i % 40) / side + yy * (60 + i % 23) / side)
        noise = rng.normal(0, 18 + (i % 5), size=(side, side))
        ch = np.clip(base + noise, 0, 255).astype(np.uint8)
        arr = np.stack([ch, np.roll(ch, 5 + i % 11, 0),
                        np.roll(ch, 9 + i % 7, 1)], axis=-1)
        buf = io.BytesIO()
        Image.fromarray(arr, "RGB").save(buf, "JPEG", quality=quality,
                                         subsampling=2)
        blobs.append(buf.getvalue())
    try:
        os.makedirs(cache, exist_ok=True)
        for i, b in enumerate(blobs):
            with open(os.path.join(cache, f"{i:03}.jpg"), "wb") as f:
                f.write(b)
    except OSError:
        pass
    return blobs


def bench_tpu_knee():
    """Phase-B at its lane knee INSIDE the product path (VERDICT r4 item
    2): a 128-image wave = 2048 coder lanes through batch_compress_tpu.
    Reports wall MB/s, then one instrumented run (LEPTON_TPU_PROFILE=2
    sync marks) attributing device seconds per stage, from which the
    chip-side coder rate is symbols / twopass-seconds."""
    try:
        import jax
        from lepton_tpu.api import batch_compress_tpu, compress, decompress
        from lepton_tpu.kernels.encode_pipeline import LAST_PROFILE

        blobs = _gen_knee_corpus()
        if blobs is None:
            return dict(error="PIL unavailable")
        mb = sum(len(b) for b in blobs) / 1e6
        outs = batch_compress_tpu(blobs, num_segments=16)     # compile
        best = 1e18
        for _ in range(2):
            t0 = time.perf_counter()
            outs = batch_compress_tpu(blobs, num_segments=16)
            best = min(best, time.perf_counter() - t0)
        mism = sum(decompress(o) != b for b, o in zip(blobs, outs))
        ident = all(outs[i] == compress(blobs[i], max_threads=16)
                    for i in (0, 17, 101))
        prev = os.environ.get("LEPTON_TPU_PROFILE")
        os.environ["LEPTON_TPU_PROFILE"] = "2"
        try:
            batch_compress_tpu(blobs, num_segments=16)
        finally:
            if prev is None:
                os.environ.pop("LEPTON_TPU_PROFILE", None)
            else:
                os.environ["LEPTON_TPU_PROFILE"] = prev
        prof = dict(LAST_PROFILE)
        syms = prof.get("symbols", 0)
        tp_s = prof.get("sync_twopass", 0.0)
        return dict(
            backend=jax.devices()[0].platform,
            files=len(blobs), corpus_mb=round(mb, 1),
            lanes=int(prof.get("lanes", 0)),
            warm_s=round(best, 1),
            encode_mbps=round(mb / best, 2),
            symbols=int(syms),
            padded_symbols=int(prof.get("padded_symbols", 0)),
            chip_twopass_s=round(tp_s, 2),
            chip_msym_per_s=round(syms / tp_s / 1e6, 1) if tp_s else None,
            device_stage_s={k[5:]: round(v, 2) for k, v in prof.items()
                            if k.startswith("sync_")},
            roundtrip_failures=int(mism),
            byte_identical_sample=bool(ident))
    except Exception as e:
        return dict(error=repr(e)[:200])


def bench_tpu_mesh():
    """shard_map ON REAL SILICON (VERDICT r4 item 6): a 1-device TPU
    mesh runs the same shard_map lane-decoder composition the virtual
    8-CPU mesh gates exercise (vp8_decoder.cc:388's thread fan-out as a
    mesh axis).  Small input: the XLA decode scan compiles O(steps), and
    the point is proving the composition executes on hardware, not
    decode throughput (kernels/pallas_decode owns that)."""
    try:
        import jax
        import numpy as np
        from jax.sharding import Mesh
        from lepton_tpu.api import compress, decompress_tpu

        path = os.path.join(IMAGES_DIR, "nofsync.jpg")
        data = open(path, "rb").read()
        lep = compress(data, min_threads=2)
        mesh = Mesh(np.array(jax.devices()[:1]), ("seg",))
        t0 = time.perf_counter()
        out = decompress_tpu(lep, mesh=mesh, backend="xla")
        cold = time.perf_counter() - t0
        ok = out == data
        t0 = time.perf_counter()
        out = decompress_tpu(lep, mesh=mesh, backend="xla")
        warm = time.perf_counter() - t0
        ok = ok and out == data
        return dict(backend=jax.devices()[0].platform,
                    mesh_devices=1, segments=2,
                    cold_s=round(cold, 1), warm_s=round(warm, 2),
                    bit_exact=bool(ok))
    except Exception as e:
        return dict(error=repr(e)[:200])


def bench_tpu_serving():
    """TPU batch serving end-to-end (VERDICT r4 item 4, matching
    socket_serve.cc:91-390 driven sockettester-style): the -tpu socket
    server takes the whole corpus as CONCURRENT connections; reports
    request throughput, per-request latency p50/p99, and the batch fill
    factor parsed from the server's own per-batch log line.  Replies are
    verified non-empty and one sample is roundtripped."""
    import socket
    import subprocess
    import threading

    repo = os.path.dirname(os.path.abspath(__file__))
    sock_path = "/tmp/lepton_tpu_bench_serve.sock"
    blobs = []
    for name in CORPUS:
        path = os.path.join(IMAGES_DIR, name)
        if os.path.exists(path):
            blobs.append(open(path, "rb").read())
    mb = sum(len(b) for b in blobs) / 1e6
    env = dict(os.environ)
    env.setdefault("LEPTON_TPU_BATCH_TIMEOUT_S", "2400")
    srv = subprocess.Popen(
        [sys.executable, os.path.join(repo, "lepton"),
         f"-socket={sock_path}", "-tpu", "-allowprogressive"],
        stderr=subprocess.PIPE, text=True, env=env)
    stderr_lines = []
    threading.Thread(
        target=lambda: stderr_lines.extend(iter(srv.stderr.readline, "")),
        daemon=True).start()
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if any("listening on" in ln for ln in stderr_lines):
                break
            if srv.poll() is not None:
                return dict(error="server exited: "
                            + "".join(stderr_lines)[-200:])
            time.sleep(0.2)
        else:
            return dict(error="server never listened")

        def run_round(timeout_s):
            lats = [None] * len(blobs)
            outs = [b""] * len(blobs)

            def one(i):
                t0 = time.perf_counter()
                s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
                s.settimeout(timeout_s)
                s.connect(sock_path)
                s.sendall(blobs[i])
                s.shutdown(socket.SHUT_WR)
                chunks = []
                while True:
                    b = s.recv(65536)
                    if not b:
                        break
                    chunks.append(b)
                s.close()
                outs[i] = b"".join(chunks)
                lats[i] = time.perf_counter() - t0

            t0 = time.perf_counter()
            ts = [threading.Thread(target=one, args=(i,))
                  for i in range(len(blobs))]
            for t in ts:
                t.start()
            for t in ts:
                t.join(timeout_s)
            return time.perf_counter() - t0, lats, outs

        # cold round carries the per-geometry compiles; two warm rounds
        cold_s, _, outs = run_round(3600)
        empty = sum(not o for o in outs)
        best, lats = 1e18, None
        for _ in range(2):
            w, ls, outs2 = run_round(1200)
            if w < best and all(ls):
                best, lats = w, sorted(ls)
        from lepton_tpu.api import decompress
        sample_ok = bool(outs2[0]) and decompress(outs2[0]) == blobs[0]
        fills = [int(ln.split("n=")[1].split()[0])
                 for ln in stderr_lines if "tpu batch served n=" in ln]
        import jax
        return dict(
            backend=jax.devices()[0].platform,
            requests=len(blobs), corpus_mb=round(mb, 1),
            cold_s=round(cold_s, 1), warm_s=round(best, 1),
            serve_mbps=round(mb / best, 2),
            req_per_s=round(len(blobs) / best, 2),
            p50_s=round(lats[len(lats) // 2], 2),
            p99_s=round(lats[min(len(lats) - 1,
                                 int(len(lats) * 0.99))], 2),
            batch_fill=fills[-3:],
            empty_replies_cold=empty,
            sample_roundtrip=sample_ok)
    except Exception as e:
        return dict(error=repr(e)[:200])
    finally:
        srv.terminate()
        try:
            srv.wait(10)
        except subprocess.TimeoutExpired:
            srv.kill()


LKG_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_TPU_LKG.json")


def _update_lkg(subs: dict) -> dict:
    """Persist every on-silicon submetric that succeeded to
    BENCH_TPU_LKG.json (last-known-good).  The axon tunnel FLAPS for
    minutes at a time (observed r3); if it is down when the round-end
    bench runs, the artifact would otherwise lose the silicon evidence
    this round measured.  Returns the merged LKG store."""
    lkg = {}
    try:
        with open(LKG_PATH) as f:
            lkg = json.load(f)
    except Exception:
        pass
    changed = False
    for k, v in subs.items():
        if isinstance(v, dict) and "error" not in v \
                and v.get("backend") == "tpu":
            lkg[k] = dict(v, measured_at=time.strftime("%Y-%m-%d %H:%M"))
            changed = True
    if changed:
        try:
            with open(LKG_PATH, "w") as f:
                json.dump(lkg, f, indent=1)
        except Exception:
            pass
    return lkg


def main():
    host = bench_host()
    lep_sizes = host.pop("lep_sizes", {})
    ref_live, size_parity = measure_reference_live(our_sizes=lep_sizes)
    ans = bench_ans_v3()
    if tpu_reachable():
        tpu = bench_tpu_phase_a()
        tpu_b = bench_tpu_phase_b()
        tpu_e = bench_tpu_e2e_encode()
        tpu_be = bench_tpu_batch_encode()
        tpu_k = bench_tpu_knee()
        tpu_d = bench_tpu_decode()
        tpu_m = bench_tpu_mesh()
        tpu_s = bench_tpu_serving()
    else:
        err = dict(error="tpu tunnel unreachable (probe timeout); "
                   "host metrics above are unaffected")
        tpu = tpu_b = tpu_e = tpu_be = tpu_k = tpu_d = tpu_m = tpu_s = err
    value = host["roundtrip_mbps"]
    baseline = ref_live if ref_live else REFERENCE_ROUNDTRIP_MBPS
    result = {
        "metric": "corpus encode+decode roundtrip throughput (bit-exact)",
        "value": value,
        "unit": "MB/s",
        "vs_baseline": round(value / baseline, 3),
        "baseline_mbps": baseline,
        "baseline_source": "reference binary measured live on this host"
        if ref_live else "stored (BASELINE.md)",
        "host": host,
        "size_parity": size_parity,
        "ans_v3": ans,
        "tpu_phase_a": tpu,
        "tpu_phase_b": tpu_b,
        # lane-scaling study (tools/phaseb_scaling.py, measured on the
        # v5e 2026-08-17, marginal Msym/s at W=16..32): S=128 -> ~180,
        # S=512 -> ~300, S=2048 -> ~500, S=8192 -> ~620 (knee ~2-8k
        # lanes; the 1-vCPU C coder is ~140 Msym/s)
        "tpu_phase_b_scaling": {"S128": 182, "S512": 300, "S2048": 503,
                                "S8192": 622, "unit": "Msym/s marginal",
                                "source": "tools/phaseb_scaling.py"},
        "tpu_e2e_encode": tpu_e,
        "tpu_batch_encode": tpu_be,
        "tpu_knee": tpu_k,
        "tpu_decode": tpu_d,
        "tpu_mesh": tpu_m,
        "tpu_serving": tpu_s,
    }
    subs = {"tpu_phase_a": tpu, "tpu_phase_b": tpu_b,
            "tpu_e2e_encode": tpu_e, "tpu_batch_encode": tpu_be,
            "tpu_knee": tpu_k, "tpu_decode": tpu_d,
            "tpu_mesh": tpu_m, "tpu_serving": tpu_s}
    lkg = _update_lkg(subs)
    failed = [k for k, v in subs.items()
              if not isinstance(v, dict) or "error" in v
              or v.get("backend") != "tpu"]
    if failed and lkg:
        # the tunnel is down or flapped mid-run: carry the most recent
        # on-silicon measurements, clearly dated, for the failed slots
        result["tpu_last_known_good"] = {
            k: lkg[k] for k in failed if k in lkg}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
