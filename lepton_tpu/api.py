"""Top-level compress/decompress API (the `lepton in out` equivalent).

Pipeline (reference call stacks, SURVEY.md section 3):
  compress:   JPEG bytes -> parse -> Huffman-decode to coefficient planes +
              handoffs -> select thread splits -> per-segment model encode ->
              mux interleave -> .lep container
  decompress: .lep -> container parse -> per-segment model decode ->
              Huffman re-emit with handoff stitching -> original JPEG bytes
"""
from __future__ import annotations

import os
import time
from typing import List, Optional

import numpy as np

from .codec.driver import ImageData, decode_segment, encode_segment
from .container.format import (LeptonHeader, read_container,
                               write_container)
from .container.handoff import choose_num_threads, select_splits
from .container.mux import MuxReader, mux_streams
from .jpeg.decoder import ThreadHandoff, decode_scans
from .jpeg.imageinfo import ImageInfo, image_info_from_header
from .jpeg.parser import parse_jpeg
from .jpeg.recoder import recode_baseline_jpeg
from .model.context import ColorTables
from .util import timing


class LeptonError(Exception):
    pass


_model_env_state = {"cur": None, "out_f": None}


def _model_out_file():
    """Pre-opened LEPTON_COMPRESSION_MODEL_OUT handle (the reference opens
    this fd at startup, before the jail: vp8_encoder.cc:447-458)."""
    path = os.environ.get("LEPTON_COMPRESSION_MODEL_OUT")
    if not path:
        return None
    f = _model_env_state.get("out_f")
    if f is None or f.name != path:
        f = open(path, "wb")
        _model_env_state["out_f"] = f
    return f


def _apply_model_env() -> None:
    """Honor LEPTON_COMPRESSION_MODEL: preload a trained model as every
    segment's initial state (load_probability_tables, model.cc:386-397;
    on load each branch count is normalized to (1+c)>>1,
    branch.hh:101-104)."""
    try:
        from . import _native
        if not _native.available():
            return
    except Exception:
        return
    path = os.environ.get("LEPTON_COMPRESSION_MODEL")
    if path == _model_env_state["cur"]:
        return
    if path:
        from .model.tables import ARENA_SIZE
        raw = np.frombuffer(open(path, "rb").read(), dtype=np.uint8).copy()
        if raw.size != ARENA_SIZE * 3:
            raise LeptonError("unexpected model file size")
        arr = raw.reshape(-1, 3)
        arr[:, 0] = ((1 + arr[:, 0].astype(np.uint16)) >> 1).astype(np.uint8)
        arr[:, 1] = ((1 + arr[:, 1].astype(np.uint16)) >> 1).astype(np.uint8)
        _native.set_model_template(raw.tobytes())
    else:
        _native.set_model_template(None)
    _model_env_state["cur"] = path


def _model_template_packed():
    """Packed uint32 [ARENA_SIZE] start arena for the DEVICE kernels when
    LEPTON_COMPRESSION_MODEL is set, else None.  Counts load-normalize to
    (1+c)>>1 and the prob byte ships as stored, exactly the state the
    host coders start every segment from (load_probability_tables,
    model.cc:386-421; layout c0<<16 | c1<<8 | prob)."""
    path = os.environ.get("LEPTON_COMPRESSION_MODEL")
    if not path:
        return None
    if _model_env_state.get("packed_for") == path:
        return _model_env_state["packed"]
    from .model.tables import ARENA_SIZE
    raw = np.frombuffer(open(path, "rb").read(), dtype=np.uint8)
    if raw.size != ARENA_SIZE * 3:
        raise LeptonError("unexpected model file size")
    arr = raw.reshape(-1, 3).astype(np.uint32)
    packed = ((((1 + arr[:, 0]) >> 1) << 16)
              | (((1 + arr[:, 1]) >> 1) << 8) | arr[:, 2])
    _model_env_state["packed"] = packed
    _model_env_state["packed_for"] = path
    return packed


_MAX_WORKERS = None
_POOL = None


def _warm_pool() -> None:
    """Pre-spawn the worker pool with live stacks: thread creation
    mmaps a stack, which the stage-2 jail bans, so jailed transcodes
    must reuse threads spawned pre-jail (the reference likewise spawns
    its GenericWorkers before installing seccomp,
    generic_worker.cc:97-100)."""
    global _MAX_WORKERS, _POOL
    if _MAX_WORKERS is None:
        _MAX_WORKERS = min(8, os.cpu_count() or 1)
    if _MAX_WORKERS <= 1 or _POOL is not None:
        return
    import threading
    from concurrent.futures import ThreadPoolExecutor
    _POOL = ThreadPoolExecutor(max_workers=_MAX_WORKERS)
    barrier = threading.Barrier(_MAX_WORKERS + 1, timeout=10)

    def _spin():
        try:
            barrier.wait()
        except threading.BrokenBarrierError:
            pass

    futs = [_POOL.submit(_spin) for _ in range(_MAX_WORKERS)]
    try:
        barrier.wait()
    except threading.BrokenBarrierError:
        pass
    for f in futs:
        f.result()


def _mark_enc(i, enc, job):
    """Per-thread ARITH stage edges (the reference's 20-stage x 8-thread
    timing matrix records each worker's span, jpgcoder.hh:25-56)."""
    timing.mark("TS_ARITH_STARTED", thread=min(i, 7))
    r = enc(*job)
    timing.mark("TS_ARITH_FINISHED", thread=min(i, 7))
    return r


def _parallel_map(fn, jobs):
    """Thread-pool map for GIL-dropping native segment calls.

    On a single-CPU host the pool only adds context switches, so run
    serially (the reference likewise downgrades its worker count,
    jpgcoder.cc:3861-3945)."""
    global _MAX_WORKERS
    if _MAX_WORKERS is None:
        _MAX_WORKERS = min(8, os.cpu_count() or 1)
    if len(jobs) <= 1 or _MAX_WORKERS <= 1:
        return [fn(j) for j in jobs]
    if _POOL is not None:
        return list(_POOL.map(fn, jobs))
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=min(_MAX_WORKERS, len(jobs))) as ex:
        return list(ex.map(fn, jobs))


def _native_image(info: ImageInfo, planes, max_heights, comp_sizes):
    """Native (C) segment codec when available, else None."""
    try:
        from . import _native
        if not _native.available():
            return None
        from .constants import RASTER_TO_ZIGZAG
        qtables_raster = [
            np.asarray(info.qtables[info.cmpnfo[c].qtable_index])[
                RASTER_TO_ZIGZAG]
            for c in range(info.cmpc)]
        return _native.NativeImage(planes, qtables_raster, info.mcuv,
                                   max_heights, comp_sizes)
    except Exception:
        return None


def _color_tables(info: ImageInfo) -> List[ColorTables]:
    return [ColorTables(info.qtables[info.cmpnfo[c].qtable_index])
            for c in range(info.cmpc)]


def _truncation_geometry(info: ImageInfo, hdr_or_dec) -> tuple:
    """trunc_bcv / trunc_bc per component (set_block_count_dpos,
    uncompressed_components.hh:168-179)."""
    max_coded_heights = []
    component_sizes = []
    for c in range(info.cmpc):
        ci = info.cmpnfo[c]
        if hdr_or_dec.early_eof:
            trunc_bc = hdr_or_dec.max_dpos[c] + 1
            vertical = min(-(-trunc_bc // ci.bch), ci.bcv)
            ratio = ci.bcv // info.mcuv
            while vertical % ratio != 0 and vertical + 1 <= ci.bcv:
                vertical += 1
            max_coded_heights.append(vertical)
            component_sizes.append(trunc_bc)
        else:
            max_coded_heights.append(ci.bcv)
            component_sizes.append(ci.bc)
    return max_coded_heights, component_sizes


def _filter_header_second_block(hdrdata: bytes) -> bytes:
    """Keep only the header segments a mid-file slice needs to decode
    (is_needed_for_second_block, jpgcoder.cc:2242-2265): DHT/DQT/DRI/SOS/SOF
    plus anything malformed enough not to be understood."""
    out = bytearray()
    pos = 0
    n = len(hdrdata)
    while pos + 4 <= n:
        length = 2 + (hdrdata[pos + 2] << 8) + hdrdata[pos + 3]
        seg = hdrdata[pos:pos + length]
        if len(seg) <= 2 or seg[0] != 0xFF or \
                seg[1] in (0xC4, 0xDB, 0xDD, 0xDA, 0xC0, 0xC1, 0xC2):
            out += seg
        pos += length
    return bytes(out)


def compress(jpeg_data: bytes, max_threads: int = 8,
             min_threads: int = 1, even_split: bool = False,
             allow_progressive: bool = False, version: int = 1,
             start_byte: int = 0, embedding: int = 0,
             allow_four_colors: bool = False,
             allow_34_sampling: bool = False) -> bytes:
    ans = version == 3
    if start_byte:
        # a mid-file slice is always re-emitted sequentially (jpgcoder.cc:1205)
        allow_progressive = False
    timing.mark("TS_READ_FINISHED")
    parsed = parse_jpeg(jpeg_data, embedding=embedding)
    info = image_info_from_header(parsed.hdrdata,
                                  allow_34=allow_34_sampling)
    if info.cmpc > 3 and not allow_four_colors:
        # default parity with the reference's 3-slot build, which exits
        # UNSUPPORTED_4_COLORS=4; allow_four_colors engages the CMYK path
        # (the ALLOW_FOUR_COLORS build: 4th plane on the chroma model
        # class, BLOCK_TYPES stays 2 so the arena is unchanged)
        from .jpeg.imageinfo import UnsupportedJpeg
        raise UnsupportedJpeg("4 colors unsupported")
    timing.mark("TS_JPEG_DECODE_STARTED")
    dec = decode_scans(parsed, info, allow_progressive=allow_progressive)
    timing.mark("TS_JPEG_DECODE_FINISHED")

    row_handoffs = dec.handoffs
    prefix_garbage = None
    if embedding:
        prefix_garbage = jpeg_data[:embedding]
    if start_byte:
        # keep rows at/after the slice start; the final row survives
        # unconditionally (jpgcoder.cc:3801-3816)
        row_handoffs = [
            th for i, th in enumerate(dec.handoffs)
            if i == len(dec.handoffs) - 1 or th.segment_size >= start_byte]
        if row_handoffs[0].segment_size < start_byte:
            raise LeptonError("only garbage, no JPEG data after start byte")
        # the straddling row's raw bytes ride as prefix garbage; the final
        # in-progress byte is re-emitted from the overhang seed, hence the
        # -1 (jpgcoder.cc:3820-3845)
        prefix_grbs = row_handoffs[0].segment_size - start_byte
        if len(row_handoffs) > 1 and prefix_grbs:
            prefix_grbs -= 1
        # handoff positions are one-based in-progress-byte counts, so a
        # start byte near EOF can reach past the raw data; the reference
        # copies min(available) (jpgcoder.cc:3834-3838) and the decode size
        # bound trims the padding back off
        prefix_garbage = jpeg_data[start_byte:start_byte + prefix_grbs]
        prefix_garbage += b"\0" * (prefix_grbs - len(prefix_garbage))
    fb_size = row_handoffs[-1].segment_size - row_handoffs[0].segment_size
    num_threads = choose_num_threads(len(row_handoffs), fb_size,
                                     max_threads, min_threads)
    splits = select_splits(row_handoffs, num_threads, even_split)

    max_heights, comp_sizes = _truncation_geometry(info, dec)
    native = _native_image(info, dec.planes, max_heights, comp_sizes)
    if native is None:
        colors = _color_tables(info)
        image = ImageData([np.ascontiguousarray(p) for p in dec.planes],
                          colors, info.mcuv, max_heights, comp_sizes)

    jobs = []
    for i, th in enumerate(splits):
        is_last = i == len(splits) - 1
        end_y = (splits[i + 1].luma_y_start if not is_last
                 else info.cmpnfo[0].bcv)
        jobs.append((th.luma_y_start, end_y, is_last))
    timing.mark("TS_ARITH_STARTED")
    _apply_model_env()
    model_out = os.environ.get("LEPTON_COMPRESSION_MODEL_OUT")
    if native is not None:
        # segments are independent streams; the C calls drop the GIL
        enc = native.encode_segment_ans if ans else native.encode_segment
        if model_out:
            # dump thread 0's post-encode model (vp8_encoder.cc:616-622);
            # encode segment 0 on this thread and snapshot its arena
            from . import _native
            first = enc(*jobs[0])
            f = _model_out_file()
            f.seek(0)
            f.write(_native.thread_arena_snapshot().tobytes())
            f.flush()
            streams = [first] + _parallel_map(
                lambda ij: _mark_enc(ij[0] + 1, enc, ij[1]),
                list(enumerate(jobs[1:])))
        else:
            streams = _parallel_map(
                lambda ij: _mark_enc(ij[0], enc, ij[1]),
                list(enumerate(jobs)))
    else:
        streams = [encode_segment(image, *j, ans=ans) for j in jobs]
    timing.mark("TS_ARITH_FINISHED")

    hdr = LeptonHeader()
    hdr.version = version
    if start_byte:
        hdr.mode = ord("Y")
    else:
        hdr.mode = ord("Z") if dec.is_baseline else ord("X")
    hdr.num_threads = num_threads
    hdr.original_size = parsed.jpgfilesize - start_byte
    hdr.hdrdata = (_filter_header_second_block(parsed.hdrdata)
                   if start_byte else parsed.hdrdata)
    hdr.prefix_garbage = prefix_garbage
    hdr.embedded_jpeg = bool(embedding)
    hdr.padbit = dec.padbit
    hdr.handoffs = splits
    hdr.rst_cnt = parsed.rst_cnt
    hdr.rst_err = parsed.rst_err
    hdr.garbage = parsed.garbage if parsed.garbage else b"\xff\xd9"
    hdr.early_eof = dec.early_eof
    if dec.early_eof:
        hdr.max_cmp = dec.max_cmp
        hdr.max_bpos = dec.max_bpos
        hdr.max_sah = dec.max_sah
        hdr.max_dpos = dec.max_dpos
    timing.mark("TS_STREAM_MULTIPLEX_STARTED")
    out = write_container(hdr, mux_streams(streams, hdr.version))
    timing.mark("TS_STREAM_MULTIPLEX_FINISHED")
    return out


def decompress(lep_data: bytes, _state: Optional[dict] = None) -> bytes:
    hdr, mux_region = read_container(
        lep_data, pending_header=(_state or {}).get("pending_header"))
    if _state is not None:
        _state["pending_header"] = hdr.pending_header
    info = image_info_from_header(hdr.hdrdata, allow_34=True)
    max_heights, comp_sizes = _truncation_geometry(info, hdr)
    ans = hdr.version == 3
    # np.zeros is lazy (mmap zero pages), so full-size planes cost only
    # the pages the decode actually touches -- crucial for truncated files
    planes = [np.zeros((info.cmpnfo[c].bcv, info.cmpnfo[c].bch, 64),
                       dtype=np.int16) for c in range(info.cmpc)]
    native = _native_image(info, planes, max_heights, comp_sizes)
    if native is not None:
        planes = native.planes
    else:
        colors = _color_tables(info)
        image = ImageData(planes, colors, info.mcuv, max_heights, comp_sizes)

    handoffs = hdr.handoffs
    if not handoffs:
        # legacy file: no 'H' record -- a mark byte + (mark-1) LE16 luma
        # splits precede the mux data (vp8_decoder.cc:337-363); overhang
        # state is unknown, forcing continuous single-threaded re-emit
        mark = mux_region[0]
        if mark == 0:
            raise LeptonError("legacy file with zero threads")
        splits = [int.from_bytes(mux_region[1 + 2 * i:3 + 2 * i], "little")
                  for i in range(mark - 1)]
        mux_region = mux_region[1 + 2 * (mark - 1):]
        bounds = [0] + splits + [info.cmpnfo[0].bcv]
        handoffs = [
            ThreadHandoff(luma_y_start=bounds[i], luma_y_end=bounds[i + 1],
                          num_overhang_bits=ThreadHandoff.LEGACY_OVERHANG_BITS)
            for i in range(mark)]
    if handoffs:
        handoffs[-1].luma_y_end = info.cmpnfo[0].bcv
    demux = MuxReader(mux_region)
    jobs = []
    for i, th in enumerate(handoffs):
        is_last = i == len(handoffs) - 1
        end_y = handoffs[i + 1].luma_y_start if not is_last else \
            info.cmpnfo[0].bcv
        jobs.append((bytes(demux.buffers[i]), th.luma_y_start, end_y,
                     is_last))
    timing.mark("TS_ARITH_STARTED")
    _apply_model_env()
    if native is not None:
        # each segment decodes a disjoint row range of the shared planes
        dec_fn = native.decode_segment_ans if ans else native.decode_segment

        def _dec_one(ij):
            i, j = ij
            timing.mark("TS_ARITH_STARTED", thread=min(i, 7))
            r = dec_fn(*j)
            timing.mark("TS_ARITH_FINISHED", thread=min(i, 7))
            return r

        _parallel_map(_dec_one, list(enumerate(jobs)))
    else:
        for j in jobs:
            decode_segment(image, *j, ans=ans)
    timing.mark("TS_ARITH_FINISHED")
    timing.mark("TS_JPEG_RECODE_STARTED")

    info2 = image_info_from_header(hdr.hdrdata, allow_34=True)
    if hdr.mode == ord("X"):
        from .jpeg.recode_progressive import recode_progressive_jpeg
        return recode_progressive_jpeg(
            hdr.hdrdata, planes, info2, hdr.padbit, hdr.rst_cnt,
            hdr.rst_cnt_set, hdr.rst_err, hdr.garbage, hdr.original_size,
            hdr.prefix_garbage, hdr.embedded_jpeg,
            truncated=hdr.early_eof)
    out = recode_baseline_jpeg(
        hdr.hdrdata, planes, handoffs, info2, hdr.padbit,
        hdr.rst_cnt, hdr.rst_cnt_set, hdr.rst_err, hdr.garbage,
        hdr.original_size, hdr.prefix_garbage, hdr.embedded_jpeg)
    timing.mark("TS_JPEG_RECODE_FINISHED")
    return out


def _tpu_decode_request(lep_data: bytes):
    """Parse one mode-Z/X container into the device-decode request dict
    (segments, geometry, color tables) plus the host re-emit closure's
    inputs.  Shared by decompress_tpu and batch_decompress_tpu.
    Returns (req, hdr, handoffs, info) or raises LeptonError for
    containers the device path does not cover (mode Y)."""
    hdr, mux_region = read_container(lep_data)
    if hdr.mode not in (ord("Z"), ord("X")):
        raise LeptonError("mode-Y container: host decoder only")
    info = image_info_from_header(hdr.hdrdata, allow_34=True)
    max_heights, comp_sizes = _truncation_geometry(info, hdr)
    handoffs = hdr.handoffs
    if not handoffs:
        mark = mux_region[0]
        if mark == 0:
            raise LeptonError("legacy file with zero threads")
        splits = [int.from_bytes(mux_region[1 + 2 * i:3 + 2 * i], "little")
                  for i in range(mark - 1)]
        mux_region = mux_region[1 + 2 * (mark - 1):]
        bounds = [0] + splits + [info.cmpnfo[0].bcv]
        handoffs = [
            ThreadHandoff(luma_y_start=bounds[i], luma_y_end=bounds[i + 1],
                          num_overhang_bits=ThreadHandoff.LEGACY_OVERHANG_BITS)
            for i in range(mark)]
    handoffs[-1].luma_y_end = info.cmpnfo[0].bcv
    demux = MuxReader(mux_region)
    streams = [bytes(demux.buffers[i]) for i in range(len(handoffs))]
    colors = _color_tables(info)
    shapes = [(info.cmpnfo[c].bcv, info.cmpnfo[c].bch)
              for c in range(info.cmpc)]
    req = dict(streams=streams, plane_shapes=shapes, color_tables=colors,
               mcuv=info.mcuv, max_coded_heights=max_heights,
               component_sizes=comp_sizes,
               splits_y=[th.luma_y_start for th in handoffs],
               color_index=(lambda c: 0 if c == 0 else 1))
    return req, hdr, handoffs, info


def _tpu_decode_reemit(hdr, handoffs, planes) -> bytes:
    """Host re-emit of the Huffman scan from device-decoded planes."""
    info2 = image_info_from_header(hdr.hdrdata, allow_34=True)
    if hdr.mode == ord("X"):
        from .jpeg.recode_progressive import recode_progressive_jpeg
        return recode_progressive_jpeg(
            hdr.hdrdata, planes, info2, hdr.padbit, hdr.rst_cnt,
            hdr.rst_cnt_set, hdr.rst_err, hdr.garbage, hdr.original_size,
            hdr.prefix_garbage, hdr.embedded_jpeg,
            truncated=hdr.early_eof)
    return recode_baseline_jpeg(
        hdr.hdrdata, planes, handoffs, info2, hdr.padbit,
        hdr.rst_cnt, hdr.rst_cnt_set, hdr.rst_err, hdr.garbage,
        hdr.original_size, hdr.prefix_garbage, hdr.embedded_jpeg)


def batch_decompress_tpu(lep_list, backend: str = "auto") -> list:
    """Decode MANY .lep containers with the accelerator: all requests'
    segments become grid steps of shared Pallas kernel invocations (one
    per coder family), mirroring how batch_compress_tpu pools encode
    lanes -- the serving decode-batching path (VERDICT r4 item 5;
    socket_serve.cc:91-120 serves both directions through one loop).

    Containers the device path does not cover (mode Y) and any request
    whose device decode reports a stream inconsistency fall back to the
    host decoder individually; a request that still fails raises, so
    the caller's per-request error contract is preserved by catching
    around each element of the returned list of JPEG byte strings."""
    from . import _configure_jax_cache
    _configure_jax_cache()
    outs = [None] * len(lep_list)
    groups = {"vpx": [], "ans": []}
    for i, lep in enumerate(lep_list):
        try:
            req, hdr, handoffs, info = _tpu_decode_request(lep)
            coder = "ans" if hdr.version == 3 else "vpx"
            groups[coder].append((i, req, hdr, handoffs))
        except Exception:
            outs[i] = decompress(lep)
    if backend == "auto":
        import jax
        backend = "pallas" if jax.devices()[0].platform == "tpu" \
            else "xla"
    template = _model_template_packed()
    for coder, items in groups.items():
        if not items:
            continue
        if backend != "pallas":
            # the XLA formulation has no multi-request form; decode
            # sequentially through the single-container device path
            for i, req, hdr, handoffs in items:
                outs[i] = decompress_tpu(lep_list[i], backend=backend)
            continue
        from .kernels.pallas_decode import decode_segments_pallas_multi
        try:
            res = decode_segments_pallas_multi(
                [req for _, req, _, _ in items], coder=coder,
                template=template)
        except Exception:
            res = None
        for k, (i, req, hdr, handoffs) in enumerate(items):
            try:
                if res is None:
                    raise LeptonError("batched device decode failed")
                planes, err = res[k]
                if err.any():
                    raise LeptonError("lepton stream inconsistent "
                                      "(TPU decode)")
                outs[i] = _tpu_decode_reemit(hdr, handoffs, planes)
            except Exception:
                outs[i] = decompress(lep_list[i])
    return outs


def decompress_tpu(lep_data: bytes, mesh=None, backend: str = "auto") -> bytes:
    """TPU-path decode: the per-segment adaptive VPX token decoding runs
    on the accelerator, then the host re-emits the Huffman scan.  Output
    is bit-exact with decompress().

    backend: "pallas" (kernels.pallas_decode: Mosaic block decoder,
    VMEM-resident model, scalar while-loop control -- the silicon path),
    "xla" (kernels.vpx_decode: predicated lockstep scan -- fast under
    XLA:CPU, used by the virtual-mesh tests), or "auto" (pallas on a real
    TPU platform, xla elsewhere).

    Covers mode-Z/X containers in v1/v2 (VPX boolcoder) and v3 (rANS:
    the same token state machine over make_read_ans, the forward
    two-state rANS reader with the adv-model update rule).  Only mode Y
    (-startbyte slices) falls back to the host decoder.
    """
    from . import _configure_jax_cache
    _configure_jax_cache()
    try:
        req, hdr, handoffs, info = _tpu_decode_request(lep_data)
    except LeptonError as e:
        if "mode-Y" in str(e):
            # mode Y (-startbyte slices) keeps the host decoder
            return decompress(lep_data)
        raise
    coder = "ans" if hdr.version == 3 else "vpx"
    if backend == "auto":
        import jax
        backend = "pallas" if (mesh is None and
                               jax.devices()[0].platform == "tpu") \
            else "xla"
    template = _model_template_packed()
    if backend == "pallas":
        from .kernels.pallas_decode import decode_segments_pallas
        planes, err = decode_segments_pallas(
            req["streams"], req["plane_shapes"], req["color_tables"],
            req["mcuv"], req["max_coded_heights"],
            req["component_sizes"], req["splits_y"],
            color_index=req["color_index"],
            coder=coder, template=template)
    else:
        from .kernels.vpx_decode import decode_segments_tpu
        planes, err = decode_segments_tpu(
            req["streams"], req["plane_shapes"], req["color_tables"],
            req["mcuv"], req["max_coded_heights"],
            req["component_sizes"], req["splits_y"],
            color_index=req["color_index"],
            mesh=mesh, coder=coder, template=template)
    if err.any():
        raise LeptonError("lepton stream inconsistent (TPU decode)")
    return _tpu_decode_reemit(hdr, handoffs, planes)


# The fake 1x1 grayscale JPEG header used to wrap non-JPEG inputs
# (reference generic_compress.cc:38-53 basic_header)
_BASIC_HEADER = bytes([
    0xff, 0xe0, 0x00, 0x10, 0x4a, 0x46, 0x49, 0x46, 0x00, 0x01,
    0x01, 0x02, 0x00, 0x1c, 0x00, 0x1c, 0x00, 0x00, 0xff, 0xdb, 0x00, 0x43,
    0x00, 0x03, 0x02, 0x02, 0x02, 0x02, 0x02, 0x03, 0x02, 0x02, 0x02, 0x03,
    0x03, 0x03, 0x03, 0x04, 0x06, 0x04, 0x04, 0x04, 0x04, 0x04, 0x08, 0x06,
    0x06, 0x05, 0x06, 0x09, 0x08, 0x0a, 0x0a, 0x09, 0x08, 0x09, 0x09, 0x0a,
    0x0c, 0x0f, 0x0c, 0x0a, 0x0b, 0x0e, 0x0b, 0x09, 0x09, 0x0d, 0x11, 0x0d,
    0x0e, 0x0f, 0x10, 0x10, 0x11, 0x10, 0x0a, 0x0c, 0x12, 0x13, 0x12, 0x10,
    0x13, 0x0f, 0x10, 0x10, 0x10, 0xff, 0xc0, 0x00, 0x0b, 0x08, 0x00, 0x01,
    0x00, 0x01, 0x01, 0x01, 0x11, 0x00, 0xff, 0xc4, 0x00, 0x14, 0x00, 0x01,
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x09, 0xff, 0xc4, 0x00, 0x14, 0x10, 0x01, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0xff, 0xda, 0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 0x3f, 0x00,
    0x54, 0xdd,
])


def generic_compress(data: bytes, num_threads: int = 8) -> bytes:
    """Wrap arbitrary bytes as a decodable .lep (generic_compress.cc:60-223).

    The payload rides as embedded prefix garbage over a fake 1x1 JPEG; the
    decode byte-bound makes reconstruction exact.
    """
    if len(data) == 0:
        raise LeptonError("empty input unsupported")
    hdr = LeptonHeader()
    hdr.version = 1
    hdr.mode = ord("Y")
    hdr.num_threads = num_threads
    hdr.original_size = len(data)
    hdr.hdrdata = _BASIC_HEADER
    hdr.padbit = 0
    hdr.handoffs = [ThreadHandoff() for _ in range(num_threads)]
    hdr.garbage = b""          # explicit empty GRB
    hdr.prefix_garbage = data
    hdr.embedded_jpeg = True
    return write_container(hdr, b"")


def compress_any(data: bytes, permissive: bool = False, verify: bool = True,
                 engine: str = "host", **kw) -> bytes:
    """Compress with optional roundtrip validation and permissive fallback
    (the validateAndCompress contract, validation.cc:15-219).

    engine="tpu" routes the encode through the accelerator path
    (compress_tpu: on-device symbolization + lane-parallel phase-B);
    verification always decodes with the independent host decoder, so the
    roundtrip gate spans both implementations."""
    try:
        if engine == "tpu":
            lep = compress_tpu(
                data, num_segments=kw.get("max_threads", 16),
                allow_progressive=kw.get("allow_progressive", False),
                allow_four_colors=kw.get("allow_four_colors", False),
                version=kw.get("version", 1),
                jailed_parse=kw.get("jailed_parse", False))
        else:
            lep = compress(data, **kw)
        if verify:
            # a -startbyte slice reconstructs only data[start_byte:]
            # (the reference validates the md5 of that range, ioutil.cc:221)
            if decompress(lep) != data[kw.get("start_byte", 0):]:
                raise LeptonError("roundtrip verification failed")
        return lep
    except Exception:
        if permissive:
            return generic_compress(data)
        raise


def _container_end(data: bytes, pos: int) -> int:
    """Find the end of the container starting at `pos`.

    Containers carry their total size in a trailing LE32 (vp8_encoder.cc:
    602-614); for concatenated streams (the -lepcat decode loop,
    jpgcoder.cc:1884-1897) we scan candidate trailers whose declared size
    reaches either the stream end or the next magic.
    """
    n = len(data)
    hdr_block_size = int.from_bytes(data[pos + 24:pos + 28], "little")
    start = pos + 28 + hdr_block_size + 3
    # fast path: single container occupying the rest of the stream
    if int.from_bytes(data[n - 4:n], "little") == n - pos:
        return n
    for end in range(start, n - 3):
        declared = int.from_bytes(data[end:end + 4], "little")
        if declared == end + 4 - pos and \
                (end + 4 == n or
                 data[end + 4:end + 6] == bytes([0xCF, 0x84])):
            return end + 4
    raise LeptonError("cannot find container boundary")


def decompress_streaming(lep_data: bytes) -> bytes:
    """O(width)-memory decode: token-decode and Huffman re-emit alternate
    MCU row by MCU row over ring-indexed planes (the reference's 2-row
    memory-optimized decode, uncompressed_components.hh:90-108 +
    block_based_image.hh:52-121).  Byte-identical to decompress(); falls
    back to it for progressive / ANS / truncated containers."""
    hdr, mux_region = read_container(lep_data)
    info = image_info_from_header(hdr.hdrdata, allow_34=True)
    if hdr.version == 3 or hdr.mode != ord("Z") or hdr.early_eof:
        return decompress(lep_data)
    try:
        from . import _native
        if not _native.available():
            return decompress(lep_data)
    except Exception:
        return decompress(lep_data)
    max_heights, comp_sizes = _truncation_geometry(info, hdr)
    _apply_model_env()

    handoffs = hdr.handoffs
    if not handoffs:
        # legacy file (no 'H' record): mark byte + LE16 splits precede the
        # mux data (vp8_decoder.cc:337-363)
        mark = mux_region[0]
        if mark == 0:
            raise LeptonError("legacy file with zero threads")
        splits = [int.from_bytes(mux_region[1 + 2 * i:3 + 2 * i], "little")
                  for i in range(mark - 1)]
        mux_region = mux_region[1 + 2 * (mark - 1):]
        bounds = [0] + splits + [info.cmpnfo[0].bcv]
        handoffs = [
            ThreadHandoff(luma_y_start=bounds[i], luma_y_end=bounds[i + 1],
                          num_overhang_bits=ThreadHandoff.LEGACY_OVERHANG_BITS)
            for i in range(mark)]
    if handoffs:
        handoffs[-1].luma_y_end = info.cmpnfo[0].bcv

    mcuv = info.mcuv
    cm0 = info.cmpnfo[0].bcv // mcuv if mcuv else 1
    if cm0 == 0:
        return decompress(lep_data)
    planes = []
    masks = []
    for c in range(info.cmpc):
        ci = info.cmpnfo[c]
        cm = max(1, ci.bcv // mcuv) if mcuv else 1
        rr = 1
        while rr < cm + 1:
            rr <<= 1
        planes.append(np.zeros((rr, ci.bch, 64), dtype=np.int16))
        masks.append(rr - 1)
    from .constants import RASTER_TO_ZIGZAG
    qtables_raster = [
        np.asarray(info.qtables[info.cmpnfo[c].qtable_index])[
            RASTER_TO_ZIGZAG] for c in range(info.cmpc)]
    native = _native.NativeImage(
        planes, qtables_raster, mcuv, max_heights, comp_sizes,
        heights=[info.cmpnfo[c].bcv for c in range(info.cmpc)])

    demux = MuxReader(mux_region)
    seg_bounds = []
    for i, th in enumerate(handoffs):
        is_last = i == len(handoffs) - 1
        end_y = handoffs[i + 1].luma_y_start if not is_last else \
            info.cmpnfo[0].bcv
        seg_bounds.append((th.luma_y_start, end_y, is_last))

    state = {"seg": -1, "dec": None}

    def ensure_decoded(mcu_row: int) -> None:
        until = (mcu_row + 1) * cm0
        while True:
            if state["dec"] is None:
                state["seg"] += 1
                s_i = state["seg"]
                if s_i >= len(seg_bounds):
                    return
                start_y, end_y, is_last = seg_bounds[s_i]
                seg_data = bytes(demux.buffers[s_i])
                # each stream is consumed exactly once, in order: release
                # the demux copy so the whole mux region is never held
                # twice (keeps the streaming decode inside the declared
                # -recodememory envelope)
                demux.buffers[s_i] = None
                state["dec"] = _native.StreamDecoder(
                    native, masks, start_y, end_y, is_last, seg_data)
            start_y, end_y, is_last = seg_bounds[state["seg"]]
            r = state["dec"].run(until)
            if r == 1 and until > end_y and not is_last:
                state["dec"].close()
                state["dec"] = None
                continue
            return

    from .jpeg.recoder import recode_baseline_jpeg_streaming
    info2 = image_info_from_header(hdr.hdrdata, allow_34=True)
    try:
        return recode_baseline_jpeg_streaming(
            hdr.hdrdata, planes, masks, ensure_decoded, handoffs, info2,
            hdr.padbit, hdr.rst_cnt, hdr.rst_cnt_set, hdr.rst_err,
            hdr.garbage, hdr.original_size, hdr.prefix_garbage,
            hdr.embedded_jpeg)
    finally:
        if state["dec"] is not None:
            state["dec"].close()


def decompress_all(data: bytes) -> bytes:
    """Decode a (possibly concatenated) stream of .lep containers."""
    out = bytearray()
    pos = 0
    n = len(data)
    state = {}
    while pos + 2 <= n and data[pos:pos + 2] == bytes([0xCF, 0x84]):
        end = _container_end(data, pos)
        out += decompress(data[pos:end], _state=state)
        pos = end
    if not out:
        raise LeptonError("no decodable lepton container found")
    return bytes(out)


def ujg_compress(jpeg_data: bytes, allow_progressive: bool = False) -> bytes:
    """Raw-coefficient UJG output (the -ujg debug baseline)."""
    from .constants import UJG_HEADER
    from .container.ujg import encode_raw
    parsed = parse_jpeg(jpeg_data)
    info = image_info_from_header(parsed.hdrdata)
    dec = decode_scans(parsed, info, allow_progressive=allow_progressive)
    hdr = LeptonHeader()
    hdr.version = 1
    hdr.mode = ord("Z") if dec.is_baseline else ord("X")
    hdr.num_threads = 1
    hdr.original_size = parsed.jpgfilesize
    hdr.hdrdata = parsed.hdrdata
    hdr.padbit = dec.padbit
    hdr.handoffs = dec.handoffs[:1] or [ThreadHandoff()]
    hdr.rst_cnt = parsed.rst_cnt
    hdr.rst_err = parsed.rst_err
    hdr.garbage = parsed.garbage if parsed.garbage else b"\xff\xd9"
    hdr.early_eof = dec.early_eof
    if dec.early_eof:
        hdr.max_cmp, hdr.max_bpos, hdr.max_sah = \
            dec.max_cmp, dec.max_bpos, dec.max_sah
        hdr.max_dpos = dec.max_dpos
    return write_container(hdr, encode_raw(dec.planes), magic=UJG_HEADER)


def ujg_decompress(ujg_data: bytes) -> bytes:
    from .container.ujg import decode_raw
    hdr, payload = read_container(ujg_data)
    info = image_info_from_header(hdr.hdrdata)
    shapes = [(info.cmpnfo[c].bcv, info.cmpnfo[c].bch)
              for c in range(info.cmpc)]
    planes = decode_raw(payload, shapes)
    info2 = image_info_from_header(hdr.hdrdata, allow_34=True)
    if hdr.mode == ord("X"):
        from .jpeg.recode_progressive import recode_progressive_jpeg
        return recode_progressive_jpeg(
            hdr.hdrdata, planes, info2, hdr.padbit, hdr.rst_cnt,
            hdr.rst_cnt_set, hdr.rst_err, hdr.garbage, hdr.original_size,
            hdr.prefix_garbage, hdr.embedded_jpeg,
            truncated=hdr.early_eof)
    handoffs = hdr.handoffs or [ThreadHandoff()]
    handoffs[0].num_overhang_bits = ThreadHandoff.LEGACY_OVERHANG_BITS
    handoffs[-1].luma_y_end = info.cmpnfo[0].bcv
    return recode_baseline_jpeg(
        hdr.hdrdata, planes, handoffs, info2, hdr.padbit, hdr.rst_cnt,
        hdr.rst_cnt_set, hdr.rst_err, hdr.garbage, hdr.original_size,
        hdr.prefix_garbage, hdr.embedded_jpeg)


def _parse_jpeg_jailed(jpeg_data: bytes, allow_progressive: bool,
                       allow_four_colors: bool = False):
    """Parse + Huffman-decode untrusted JPEG bytes inside a JAILED forked
    child, returning (parsed, info, dec) over a pipe.

    The accelerator paths cannot jail their own process (the JAX runtime
    needs its sockets, see cli._host_fallback_jailed), but the JPEG parse
    is exactly the untrusted-input surface the reference never runs
    outside seccomp (Seccomp.cc:67-138 installs before read_jpeg,
    jpgcoder.cc:1766).  Forking confines it: the child installs the
    stage-1 allowlist jail (memory syscalls stay allowed -- the planes
    must grow), parses, and pickles the result back; any child death maps
    to a parse failure, never code execution in the device process.

    Callers must have pre-imported the parse modules (cli._prepare_for_jail)
    so the child never opens files.  Falls back to in-process parsing when
    fork or the jail is unavailable (non-Linux test hosts).

    The return channel is deserialized with a class-allowlisted Unpickler:
    a hostile input that fully compromised the jailed child must not be
    able to smuggle an arbitrary-code pickle into the unjailed parent --
    that would undo exactly the isolation the fork buys.

    Fork-vs-threads (VERDICT r4 item 9): the COLD accelerator paths now
    parse before the first jax import, matching the reference's order
    (Seccomp.cc:67-138 installs before read_jpeg, after worker spawn --
    jpgcoder.cc:1766).  A WARM device process (serving) necessarily forks
    with the JAX runtime's threads live; the child only runs our own
    parse code plus pickle/os.write, none of which takes runtime locks,
    and a child that deadlocks on an inherited lock anyway is bounded by
    the read watchdog below: the parent SIGKILLs the exact child pid
    after LEPTON_PARSE_TIMEOUT_S (default 300) and maps it to a parse
    failure, so no input can wedge the device process."""
    import pickle
    import select
    import signal
    import struct

    from .util.sandbox import install_jail

    def _inline():
        parsed = parse_jpeg(jpeg_data)
        info = image_info_from_header(parsed.hdrdata)
        if info.cmpc > 3 and not allow_four_colors:
            from .jpeg.imageinfo import UnsupportedJpeg
            raise UnsupportedJpeg("4 colors unsupported")
        dec = decode_scans(parsed, info,
                           allow_progressive=allow_progressive)
        return parsed, info, dec

    if not hasattr(os, "fork"):
        return _inline()
    r, w = os.pipe()
    pid = os.fork()
    if pid == 0:
        code = 1
        try:
            os.close(r)
            install_jail()
            try:
                payload = pickle.dumps((True, _inline()),
                                       protocol=pickle.HIGHEST_PROTOCOL)
            except BaseException as e:
                try:
                    payload = pickle.dumps((False, e),
                                           protocol=pickle.HIGHEST_PROTOCOL)
                except BaseException:
                    payload = pickle.dumps(
                        (False, LeptonError(f"{type(e).__name__}: {e}")),
                        protocol=pickle.HIGHEST_PROTOCOL)
            hdr = struct.pack("<Q", len(payload))
            for buf in (hdr, payload):
                off = 0
                while off < len(buf):
                    off += os.write(w, buf[off:off + (1 << 20)])
            code = 0
        except BaseException:
            pass
        os._exit(code)
    os.close(w)
    deadline = time.monotonic() + float(
        os.environ.get("LEPTON_PARSE_TIMEOUT_S", 300))
    chunks = []
    timed_out = False
    while True:
        wait = deadline - time.monotonic()
        if wait <= 0 or not select.select([r], [], [], wait)[0]:
            timed_out = True
            break
        b = os.read(r, 1 << 20)
        if not b:
            break
        chunks.append(b)
    os.close(r)
    if timed_out:
        os.kill(pid, signal.SIGKILL)
    os.waitpid(pid, 0)
    if timed_out:
        raise LeptonError("jailed parse child timed out")
    blob = b"".join(chunks)
    if len(blob) < 8:
        raise LeptonError("jailed parse child died (hostile input?)")
    n = struct.unpack("<Q", blob[:8])[0]
    ok, val = _restricted_loads(blob[8:8 + n])
    if not ok:
        raise val if isinstance(val, BaseException) \
            else LeptonError(str(val))
    return val


def _huffcodes():
    from .jpeg.huffman import HuffCodes
    return HuffCodes


def _restricted_loads(blob: bytes):
    """Unpickle only the classes the jailed parse child legitimately
    returns (our JPEG dataclasses, their exceptions, numpy arrays)."""
    import io
    import pickle

    import numpy as _np
    from .jpeg import decoder as _d
    from .jpeg import imageinfo as _ii
    from .jpeg import parser as _p

    _ALLOWED = {
        ("lepton_tpu.jpeg.parser", "ParsedJpeg"): _p.ParsedJpeg,
        ("lepton_tpu.jpeg.parser", "JpegParseError"): _p.JpegParseError,
        ("lepton_tpu.jpeg.imageinfo", "ComponentInfo"): _ii.ComponentInfo,
        ("lepton_tpu.jpeg.imageinfo", "ScanInfo"): _ii.ScanInfo,
        ("lepton_tpu.jpeg.imageinfo", "ImageInfo"): _ii.ImageInfo,
        ("lepton_tpu.jpeg.imageinfo", "UnsupportedJpeg"): _ii.UnsupportedJpeg,
        ("lepton_tpu.jpeg.decoder", "ThreadHandoff"): _d.ThreadHandoff,
        ("lepton_tpu.jpeg.huffman", "HuffCodes"): _huffcodes(),
        ("lepton_tpu.jpeg.decoder", "DecodedScanData"): _d.DecodedScanData,
        ("lepton_tpu.jpeg.decoder", "JpegDecodeError"): _d.JpegDecodeError,
        ("lepton_tpu.api", "LeptonError"): LeptonError,
        ("numpy._core.multiarray", "_reconstruct"):
            _np._core.multiarray._reconstruct,
        ("numpy.core.multiarray", "_reconstruct"):
            _np._core.multiarray._reconstruct,
        ("numpy._core.numeric", "_frombuffer"):
            _np._core.numeric._frombuffer,
        ("numpy.core.numeric", "_frombuffer"):
            _np._core.numeric._frombuffer,
        ("numpy", "ndarray"): _np.ndarray,
        ("numpy", "dtype"): _np.dtype,
        ("builtins", "ValueError"): ValueError,
        ("builtins", "MemoryError"): MemoryError,
    }

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return _ALLOWED[(module, name)]
            except KeyError:
                raise pickle.UnpicklingError(
                    f"jailed-parse channel refused {module}.{name}")

    return _Unpickler(io.BytesIO(blob)).load()


def compress_tpu(jpeg_data: bytes, num_segments: int = 16,
                 window: int = 32, allow_progressive: bool = False,
                 allow_four_colors: bool = False,
                 symbolizer: str = "jax", version: int = 1,
                 jailed_parse: bool = False) -> bytes:
    """TPU-path encode: symbolization AND entropy phase-B run on the
    accelerator.

    Pipeline (SURVEY.md section 7 two-phase design): host JPEG parse +
    Huffman decode, then phase A + symbolization as batched array programs
    (kernels.symbolize: contexts, token decomposition, branch indices),
    then the sort-based two-pass VPX coding of ALL segments on TPU lanes
    (kernels.vpx_scan.encode_streams_twopass: branch-sorted model pass +
    register-only arithmetic pass, no arena, no scatters), host carry
    resolution + container.  No native code runs between coefficients
    and the mux.
    Output decodes with decompress() and the reference binary alike; with
    matching segment counts it is byte-identical to the host encoder's.

    symbolizer: "jax" (default, on-device) or "native" (C host fallback,
    kept as the differential-testing oracle).
    version: 1/2 for the VPX coder, 3 for the rANS backend (the
    sorted-branch model pass with the adv update rule + the reverse
    rANS register chain, kernels.vpx_scan.encode_streams_ans).
    """
    # jailed parse FIRST: on the cold path this forks before the jax
    # import below initializes the runtime's threads (VERDICT r4 item 9;
    # the reference's Seccomp-before-read_jpeg ordering, jpgcoder.cc:1766)
    if jailed_parse:
        parsed, info, dec = _parse_jpeg_jailed(
            jpeg_data, allow_progressive, allow_four_colors)
    else:
        parsed = parse_jpeg(jpeg_data)
        info = image_info_from_header(parsed.hdrdata)
        if info.cmpc > 3 and not allow_four_colors:
            from .jpeg.imageinfo import UnsupportedJpeg
            raise UnsupportedJpeg("4 colors unsupported")
        dec = decode_scans(parsed, info,
                           allow_progressive=allow_progressive)

    from . import _configure_jax_cache
    _configure_jax_cache()
    import jax

    from .kernels import vpx_scan
    row_handoffs = dec.handoffs
    fb_size = row_handoffs[-1].segment_size - row_handoffs[0].segment_size
    num_threads = choose_num_threads(len(row_handoffs), fb_size,
                                     num_segments, 1)
    splits = select_splits(row_handoffs, num_threads, False)
    max_heights, comp_sizes = _truncation_geometry(info, dec)
    _apply_model_env()
    template = _model_template_packed()

    if symbolizer == "jax":
        # fully on-device: the batch pipeline with a one-image wave
        # (VERDICT r4 item 8: the batch path has fewer fetch points and
        # all the r5 alignment/pooling work; a single image is just its
        # degenerate batch).  Covers VPX (v1/v2) and rANS (v3) lanes.
        from .kernels.batch_encode import encode_images_device
        from .model.context import ColorTables
        colors = [ColorTables(info.qtables[info.cmpnfo[c].qtable_index])
                  for c in range(info.cmpc)]
        desc = dict(
            planes=list(dec.planes), color_tables=colors, mcuv=info.mcuv,
            max_coded_heights=max_heights, component_sizes=comp_sizes,
            splits_y=[th.luma_y_start for th in splits],
            color_index=(lambda c: 0 if c == 0 else 1))
        streams = encode_images_device([desc], window=window,
                                       version=version,
                                       template=template)[0]
        segs = None
    else:
        from . import _native
        native = _native_image(info, dec.planes, max_heights, comp_sizes)
        if native is None:
            raise LeptonError("native symbolizer unavailable")
        segs = []
        for i, th in enumerate(splits):
            is_last = i == len(splits) - 1
            end_y = (splits[i + 1].luma_y_start if not is_last
                     else info.cmpnfo[0].bcv)
            segs.append(_native.native_symbolize_segment(
                native, th.luma_y_start, end_y, is_last))

    if segs is not None and version == 3:
        # rANS framing has no marker/stop bits: raw per-segment streams
        streams = vpx_scan.encode_streams_ans(segs, window=window,
                                              template=template)
    elif segs is not None:
        idxs, bits = vpx_scan.build_symbol_streams(segs)
        import jax.numpy as jnp
        out = vpx_scan.encode_streams_twopass(
            jax.device_put(idxs), jax.device_put(bits), window=window,
            template=None if template is None
            else jnp.asarray(template, jnp.uint32))
        emit, byte, carry, nbytes = [np.asarray(x) for x in out]
        streams = vpx_scan.finalize_streams(emit, byte, carry, nbytes)

    hdr = LeptonHeader()
    hdr.version = version
    hdr.mode = ord("Z") if dec.is_baseline else ord("X")
    hdr.num_threads = num_threads
    hdr.original_size = parsed.jpgfilesize
    hdr.hdrdata = parsed.hdrdata
    hdr.padbit = dec.padbit
    hdr.handoffs = splits
    hdr.rst_cnt = parsed.rst_cnt
    hdr.rst_err = parsed.rst_err
    hdr.garbage = parsed.garbage if parsed.garbage else b"\xff\xd9"
    hdr.early_eof = dec.early_eof
    if dec.early_eof:
        hdr.max_cmp = dec.max_cmp
        hdr.max_bpos = dec.max_bpos
        hdr.max_sah = dec.max_sah
        hdr.max_dpos = dec.max_dpos
    return write_container(hdr, mux_streams(streams, hdr.version))


def batch_compress_tpu(jpeg_blobs, num_segments: int = 16,
                       window: int = 32,
                       allow_progressive: bool = False,
                       jailed_parse: bool = False,
                       version: int = 1) -> list:
    """Batch-encode many JPEGs on one chip: every image's segments become
    coder lanes in a single phase-B invocation (lanes carry O(1) state in
    the two-pass design, so batch size is free parallelism).  This is the
    TPU serving-throughput design point: per-image latency is bounded by
    a handful of kernel dispatches regardless of batch size.

    Returns a list of .lep containers, each byte-identical to
    compress_tpu on the same input.
    """
    legacy = os.environ.get("LEPTON_TPU_BATCH_V1") == "1"
    if legacy and (version == 3
                   or os.environ.get("LEPTON_COMPRESSION_MODEL")):
        # the retired r3 pipeline never grew rANS lanes or templates
        return [compress_tpu(b, num_segments=num_segments,
                             allow_progressive=allow_progressive,
                             version=version, jailed_parse=jailed_parse)
                for b in jpeg_blobs]

    # parse (and fork, when jailed) BEFORE any jax import: on the cold
    # path the children then precede the runtime's threads (VERDICT r4
    # item 9; jpgcoder.cc:1766 ordering)
    import time as _time
    _t0 = _time.time()
    descs = []
    metas = []
    for data in jpeg_blobs:
        if jailed_parse:
            parsed, info, dec = _parse_jpeg_jailed(data, allow_progressive)
        else:
            parsed = parse_jpeg(data)
            info = image_info_from_header(parsed.hdrdata)
            dec = decode_scans(parsed, info,
                               allow_progressive=allow_progressive)
        num_threads = choose_num_threads(
            len(dec.handoffs),
            dec.handoffs[-1].segment_size - dec.handoffs[0].segment_size,
            num_segments, 1)
        splits = select_splits(dec.handoffs, num_threads, False)
        mh, cs = _truncation_geometry(info, dec)
        colors = [ColorTables(info.qtables[info.cmpnfo[c].qtable_index])
                  for c in range(info.cmpc)]
        descs.append(dict(
            planes=list(dec.planes), color_tables=colors, mcuv=info.mcuv,
            max_coded_heights=mh, component_sizes=cs,
            splits_y=[th.luma_y_start for th in splits],
            color_index=(lambda c: 0 if c == 0 else 1)))
        metas.append((parsed, dec, splits, num_threads))
    _apply_model_env()
    _t_parse = _time.time() - _t0
    from . import _configure_jax_cache
    _configure_jax_cache()
    if legacy:
        from .kernels.encode_pipeline import encode_images_device
        all_streams = encode_images_device(descs, window=window)
    else:
        from .kernels.batch_encode import encode_images_device
        all_streams = encode_images_device(
            descs, window=window, version=version,
            template=_model_template_packed())
    from .kernels import encode_pipeline as _ep
    _ep.LAST_PROFILE["host_jpeg_parse"] = _t_parse

    out = []
    for (parsed, dec, splits, num_threads), streams in zip(metas,
                                                           all_streams):
        hdr = LeptonHeader()
        hdr.version = version
        hdr.mode = ord("Z") if dec.is_baseline else ord("X")
        hdr.num_threads = num_threads
        hdr.original_size = parsed.jpgfilesize
        hdr.hdrdata = parsed.hdrdata
        hdr.padbit = dec.padbit
        hdr.handoffs = splits
        hdr.rst_cnt = parsed.rst_cnt
        hdr.rst_err = parsed.rst_err
        hdr.garbage = parsed.garbage if parsed.garbage else b"\xff\xd9"
        hdr.early_eof = dec.early_eof
        if dec.early_eof:
            hdr.max_cmp, hdr.max_bpos = dec.max_cmp, dec.max_bpos
            hdr.max_sah, hdr.max_dpos = dec.max_sah, dec.max_dpos
        out.append(write_container(hdr, mux_streams(streams, hdr.version)))
    return out
