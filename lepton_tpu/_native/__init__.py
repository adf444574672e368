"""ctypes bridge to the native hot-loop library (leptonc.c).

Builds the shared library on first use (gcc -O2); falls back cleanly when a
toolchain is unavailable so the pure-Python path keeps working.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "leptonc.c")
# LEPTONC_SO overrides the library (e.g. a sanitizer build for test runs)
_SO = os.environ.get("LEPTONC_SO", os.path.join(_HERE, "libleptonc.so"))

_lib = None
_lock = threading.Lock()

# -injectsyscall= fault-injection points 2/4: issue a jail-banned syscall
# from inside the next segment encode/decode (jpgcoder.cc:1324)
inject_on_encode = False
inject_on_decode = False


class NativeUnavailable(Exception):
    pass


def _build() -> None:
    cmd = ["gcc", "-O3", "-march=native", "-fPIC", "-shared",
           "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except subprocess.CalledProcessError:
        cmd = ["gcc", "-O2", "-fPIC", "-shared", "-o", _SO, _SRC]
        subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        if "LEPTONC_SO" not in os.environ and (
                not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            try:
                _build()
            except Exception as e:  # pragma: no cover
                raise NativeUnavailable(f"cannot build leptonc: {e}")
        lib = ctypes.CDLL(_SO)
        lib.lepton_arena_size.restype = ctypes.c_int
        lib.lepton_color_tables_size.restype = ctypes.c_int
        lib.lepton_init_color.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.lepton_encode_segment.restype = ctypes.c_int64
        lib.lepton_decode_segment.restype = ctypes.c_int
        # sanity: arena layout must match the Python model tables
        from ..model.tables import ARENA_SIZE
        if lib.lepton_arena_size() != ARENA_SIZE:
            raise NativeUnavailable("arena layout mismatch C vs Python")
        _lib = lib
        return _lib


def available() -> bool:
    try:
        get_lib()
        return True
    except Exception:
        return False




_tls = threading.local()


def _thread_arena() -> "np.ndarray":
    """Reused per-thread model arena (the C codec re-initializes it to the
    identity at every segment start, so reuse is safe)."""
    arena = getattr(_tls, "arena", None)
    if arena is None:
        from ..model.tables import ARENA_SIZE
        arena = np.empty(ARENA_SIZE * 3, dtype=np.uint8)
        _tls.arena = arena
    return arena


class NativeImage:
    """Prepared ctypes arguments for one image's planes + color tables."""

    def __init__(self, planes: List[np.ndarray], qtables_raster, mcuv: int,
                 max_coded_heights, comp_sizes, heights=None):
        # `heights` overrides the logical component heights when `planes`
        # are ring-sized sliding windows (streaming decode)
        lib = get_lib()
        self.lib = lib
        self.planes = [np.ascontiguousarray(p, dtype=np.int16)
                       for p in planes]
        n = len(self.planes)
        self.plane_ptrs = (ctypes.POINTER(ctypes.c_int16) * n)(*[
            p.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))
            for p in self.planes])
        self.widths = (ctypes.c_int32 * n)(*[p.shape[1] for p in self.planes])
        if heights is None:
            heights = [p.shape[0] for p in self.planes]
        self.heights = (ctypes.c_int32 * n)(*heights)
        self.comp_sizes = (ctypes.c_int32 * n)(*comp_sizes)
        self.max_heights = (ctypes.c_int32 * n)(*max_coded_heights)
        self.ncomp = n
        self.mcuv = mcuv
        ct_size = lib.lepton_color_tables_size()
        self.color_bufs = [ctypes.create_string_buffer(ct_size)
                           for _ in range(n)]
        for i, q in enumerate(qtables_raster):
            qarr = np.ascontiguousarray(q, dtype=np.uint16)
            lib.lepton_init_color(self.color_bufs[i],
                                  qarr.ctypes.data_as(ctypes.c_void_p))
        self.color_ptrs = (ctypes.c_void_p * n)(*[
            ctypes.cast(b, ctypes.c_void_p) for b in self.color_bufs])
        from ..model.tables import ARENA_SIZE
        self.arena = np.empty(ARENA_SIZE * 3, dtype=np.uint8)

    def encode_segment_ans(self, min_y: int, max_y: int,
                           is_last: bool) -> bytes:
        arena = _thread_arena()
        cap = sum(p.nbytes for p in self.planes) + (1 << 20)
        out = np.empty(cap, dtype=np.uint8)
        self.lib.lepton_encode_segment_ans.restype = ctypes.c_int64
        n = self.lib.lepton_encode_segment_ans(
            self.plane_ptrs, self.widths, self.heights, self.comp_sizes,
            self.max_heights, self.ncomp, self.mcuv, self.color_ptrs,
            arena.ctypes.data_as(ctypes.c_void_p),
            min_y, max_y, int(is_last),
            out.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(cap))
        if n == -3:
            raise ValueError("coefficient out of range")
        if n < 0:
            raise RuntimeError(f"native ans encode failed: {n}")
        return out[:n].tobytes()

    def decode_segment_ans(self, data: bytes, min_y: int, max_y: int,
                           is_last: bool) -> None:
        arena = _thread_arena()
        buf = np.frombuffer(data, dtype=np.uint8)
        self.lib.lepton_decode_segment_ans.restype = ctypes.c_int
        err = self.lib.lepton_decode_segment_ans(
            self.plane_ptrs, self.widths, self.heights, self.comp_sizes,
            self.max_heights, self.ncomp, self.mcuv, self.color_ptrs,
            arena.ctypes.data_as(ctypes.c_void_p),
            min_y, max_y, int(is_last),
            buf.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(len(data)))
        if err:
            raise RuntimeError("native ans decode: stream inconsistent")

    def encode_segment(self, min_y: int, max_y: int, is_last: bool) -> bytes:
        global inject_on_encode
        if inject_on_encode:
            inject_on_encode = False
            self.lib.lepton_inject_syscall()
        arena = _thread_arena()
        cap = sum(p.nbytes for p in self.planes) + (1 << 20)
        out = np.empty(cap, dtype=np.uint8)
        n = self.lib.lepton_encode_segment(
            self.plane_ptrs, self.widths, self.heights, self.comp_sizes,
            self.max_heights, self.ncomp, self.mcuv, self.color_ptrs,
            arena.ctypes.data_as(ctypes.c_void_p),
            min_y, max_y, int(is_last),
            out.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(cap))
        if n == -3:
            raise ValueError("coefficient out of range")
        if n < 0:
            raise RuntimeError(f"native encode failed: {n}")
        return out[:n].tobytes()

    def decode_segment(self, data: bytes, min_y: int, max_y: int,
                       is_last: bool) -> None:
        global inject_on_decode
        if inject_on_decode:
            inject_on_decode = False
            self.lib.lepton_inject_syscall()
        arena = _thread_arena()
        buf = np.frombuffer(data, dtype=np.uint8)
        err = self.lib.lepton_decode_segment(
            self.plane_ptrs, self.widths, self.heights, self.comp_sizes,
            self.max_heights, self.ncomp, self.mcuv, self.color_ptrs,
            arena.ctypes.data_as(ctypes.c_void_p),
            min_y, max_y, int(is_last),
            buf.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(len(data)))
        if err:
            raise RuntimeError("native decode: stream inconsistent")


# ---------------------------------------------------------------------------
# JPEG Huffman layer bridge
# ---------------------------------------------------------------------------

class _HScan(ctypes.Structure):
    _fields_ = [
        ("comps", (ctypes.c_int32 * 11) * 4),
        ("ncomp", ctypes.c_int),
        ("cs_cmpc", ctypes.c_int),
        ("cs_cmp", ctypes.c_int * 4),
        ("rsti", ctypes.c_int),
        ("mcuh", ctypes.c_int),
        ("mcuv", ctypes.c_int),
        ("mcuc", ctypes.c_int),
    ]


def build_hscan(info, row_masks=None) -> "_HScan":
    sc = _HScan()
    sc.ncomp = info.cmpc
    sc.cs_cmpc = info.scan.cs_cmpc
    for i, c in enumerate(info.scan.cs_cmp):
        sc.cs_cmp[i] = c
    sc.rsti = info.rsti
    sc.mcuh = info.mcuh
    sc.mcuv = info.mcuv
    sc.mcuc = info.mcuc
    for c in range(info.cmpc):
        ci = info.cmpnfo[c]
        mask = row_masks[c] if row_masks else 0x7fffffff
        vals = [ci.bch, ci.bcv, ci.bc, ci.nch, ci.ncv, ci.mbs,
                ci.sfv, ci.sfh, ci.huffdc, ci.huffac, mask]
        for j, v in enumerate(vals):
            sc.comps[c][j] = v
    return sc


def build_huff_tables(info):
    """ctypes buffer of 8 HuffTables: [dc0..dc3, ac0..ac3]."""
    lib = get_lib()
    size = lib.lepton_huff_table_size()
    buf = ctypes.create_string_buffer(size * 8)
    for cls in range(2):
        for tid in range(4):
            hc = info.hcodes[cls][tid]
            if hc is None:
                continue
            counts = bytes(16)
            # rebuild from clen/cval: we stored originals in HuffCodes;
            # instead rebuild from clen directly
            cnt = [0] * 16
            syms_by_len = {}
            for sym in range(256):
                ln = hc.clen[sym]
                if ln:
                    syms_by_len.setdefault(ln, []).append(
                        (hc.cval[sym], sym))
            values = []
            for ln in range(1, 17):
                pairs = sorted(syms_by_len.get(ln, []))
                cnt[ln - 1] = len(pairs)
                values.extend(sym for _, sym in pairs)
            counts = bytes(cnt)
            vals = bytes(values)
            off = (cls * 4 + tid) * size
            lib.lepton_build_huff(
                ctypes.byref(buf, off), counts, vals, len(vals))
    return buf


def native_decode_baseline_scan(info, huffdata: bytes, bitpos: int,
                                offsets, planes, padbit: int):
    """Returns (status, new_bitpos, handoffs_list, padbit, max_dpos)."""
    lib = get_lib()
    sc = build_hscan(info)
    tables = build_huff_tables(info)
    n = len(planes)
    plane_ptrs = (ctypes.POINTER(ctypes.c_int16) * n)(*[
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)) for p in planes])
    hpos = np.ascontiguousarray([o[0] for o in offsets], dtype=np.uint32)
    fpos = np.ascontiguousarray([o[1] for o in offsets], dtype=np.uint32)
    max_handoffs = info.mcuv * max(1, info.cmpnfo[0].bcv // info.mcuv) + 16
    handoffs = np.zeros((max_handoffs, 8), dtype=np.int32)
    nhandoffs = ctypes.c_int32(0)
    padbit_c = ctypes.c_int32(padbit)
    bitpos_c = ctypes.c_int64(bitpos)
    max_dpos = np.zeros(4, dtype=np.int32)
    hbuf = np.frombuffer(huffdata, dtype=np.uint8)
    status = lib.lepton_decode_baseline_scan(
        hbuf.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(len(huffdata)),
        ctypes.byref(bitpos_c), ctypes.byref(sc), tables, plane_ptrs,
        hpos.ctypes.data_as(ctypes.c_void_p),
        fpos.ctypes.data_as(ctypes.c_void_p), len(offsets),
        handoffs.ctypes.data_as(ctypes.c_void_p), ctypes.byref(nhandoffs),
        ctypes.byref(padbit_c), max_dpos.ctypes.data_as(ctypes.c_void_p))
    return (status, bitpos_c.value, handoffs[:nhandoffs.value],
            padbit_c.value, max_dpos.tolist())


def native_recode_rows(info, planes, start_row: int, end_row: int,
                       overhang_byte: int, num_overhang_bits: int,
                       lastdc, padbit: int, rst_cnt, rst_cnt_set: bool,
                       out: np.ndarray, out_bound: int, out_pos: int,
                       tables=None, sc=None):
    """Returns (new_out_pos, overhang_byte, num_overhang_bits, lastdc)."""
    lib = get_lib()
    if sc is None:
        sc = build_hscan(info)
    if tables is None:
        tables = build_huff_tables(info)
    n = len(planes)
    plane_ptrs = (ctypes.POINTER(ctypes.c_int16) * n)(*[
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)) for p in planes])
    lastdc_c = np.asarray(list(lastdc) + [0] * (4 - len(lastdc)),
                          dtype=np.int32)
    rst = np.ascontiguousarray(rst_cnt or [0], dtype=np.uint32)
    overhang_out = np.zeros(2, dtype=np.int32)
    lib.lepton_recode_rows.restype = ctypes.c_int64
    newpos = lib.lepton_recode_rows(
        ctypes.byref(sc), tables, plane_ptrs, start_row, end_row,
        overhang_byte, num_overhang_bits,
        lastdc_c.ctypes.data_as(ctypes.c_void_p), padbit,
        rst.ctypes.data_as(ctypes.c_void_p), len(rst_cnt or []),
        int(rst_cnt_set),
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(out_bound), ctypes.c_int64(out_pos),
        overhang_out.ctypes.data_as(ctypes.c_void_p))
    if newpos < 0:
        raise RuntimeError("native recode failed")
    return (int(newpos), int(overhang_out[0]), int(overhang_out[1]),
            lastdc_c.tolist())


def native_symbolize_segment(img: "NativeImage", min_y: int, max_y: int,
                             is_last: bool):
    """(branch_idx, bit) symbol stream for one segment (phase-B input)."""
    lib = img.lib
    lib.lepton_symbolize_segment.restype = ctypes.c_int64
    cap = 1 << 20
    while True:
        idx = np.empty(cap, dtype=np.int32)
        bit = np.empty(cap, dtype=np.uint8)
        n = lib.lepton_symbolize_segment(
            img.plane_ptrs, img.widths, img.heights, img.comp_sizes,
            img.max_heights, img.ncomp, img.mcuv, img.color_ptrs,
            img.arena.ctypes.data_as(ctypes.c_void_p),
            min_y, max_y, int(is_last),
            idx.ctypes.data_as(ctypes.c_void_p),
            bit.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(cap))
        if n < 0:
            raise RuntimeError("symbolize failed")
        if n <= cap:
            return idx[:n].copy(), bit[:n].copy()
        cap = int(n) + 1024


class _HScanPrg(ctypes.Structure):
    _fields_ = [("cs_from", ctypes.c_int), ("cs_to", ctypes.c_int),
                ("cs_sah", ctypes.c_int), ("cs_sal", ctypes.c_int)]


def _prg_of(info) -> "_HScanPrg":
    sc = info.scan
    return _HScanPrg(sc.cs_from, sc.cs_to, sc.cs_sah, sc.cs_sal)


def native_decode_progressive_scan(info, huffdata: bytes, bitpos: int,
                                   offsets, planes, padbit: int, state,
                                   max_dpos, tables=None):
    """One progressive scan in C.  state: int32[5] = [mcu, dc0..3] (io).
    Returns (status, new_bitpos, handoff_records, padbit)."""
    lib = get_lib()
    sc = build_hscan(info)
    prg = _prg_of(info)
    if tables is None:
        tables = build_huff_tables(info)
    n = len(planes)
    plane_ptrs = (ctypes.POINTER(ctypes.c_int16) * n)(*[
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)) for p in planes])
    hpos = np.ascontiguousarray([o[0] for o in offsets], dtype=np.uint32)
    fpos = np.ascontiguousarray([o[1] for o in offsets], dtype=np.uint32)
    max_handoffs = info.cmpnfo[0].bcv + 16
    handoffs = np.zeros((max_handoffs, 8), dtype=np.int32)
    nhandoffs = ctypes.c_int32(0)
    padbit_c = ctypes.c_int32(padbit)
    bitpos_c = ctypes.c_int64(bitpos)
    md = np.asarray(max_dpos, dtype=np.int32)
    hbuf = np.frombuffer(huffdata, dtype=np.uint8)
    status = lib.lepton_decode_progressive_scan(
        hbuf.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(len(huffdata)),
        ctypes.byref(bitpos_c), ctypes.byref(sc), ctypes.byref(prg), tables,
        plane_ptrs,
        hpos.ctypes.data_as(ctypes.c_void_p),
        fpos.ctypes.data_as(ctypes.c_void_p), len(offsets),
        handoffs.ctypes.data_as(ctypes.c_void_p), ctypes.byref(nhandoffs),
        ctypes.byref(padbit_c), md.ctypes.data_as(ctypes.c_void_p),
        state.ctypes.data_as(ctypes.c_void_p))
    for i in range(4):
        max_dpos[i] = int(md[i])
    return status, bitpos_c.value, handoffs[:nhandoffs.value], padbit_c.value


def native_recode_any_scan(info, planes, jpegtype: int, padbit: int,
                           out_base: int, tables=None, sc=None):
    """Re-emit one scan; returns (scan_bytes, rstp_positions)."""
    lib = get_lib()
    lib.lepton_recode_any_scan.restype = ctypes.c_int64
    if sc is None:
        sc = build_hscan(info)
    prg = _prg_of(info)
    if tables is None:
        tables = build_huff_tables(info)
    n = len(planes)
    plane_ptrs = (ctypes.POINTER(ctypes.c_int16) * n)(*[
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)) for p in planes])
    cap = sum(p.nbytes for p in planes) + (1 << 20)
    out = np.empty(cap, dtype=np.uint8)
    rstp_cap = ctypes.c_int32(1 << 20)
    rstp = np.zeros(1 << 20, dtype=np.uint32)
    n_rstp = ctypes.c_int32(0)
    nbytes = lib.lepton_recode_any_scan(
        ctypes.byref(sc), ctypes.byref(prg), jpegtype, tables, plane_ptrs,
        padbit, out.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(cap),
        ctypes.c_int64(out_base),
        rstp.ctypes.data_as(ctypes.c_void_p), ctypes.byref(rstp_cap),
        ctypes.byref(n_rstp))
    if nbytes < 0:
        raise RuntimeError("native progressive recode failed")
    return out[:nbytes].tobytes(), rstp[:n_rstp.value].tolist()


# ---------------------------------------------------------------------------
# Streaming (O(width)-memory) decode bridge
# ---------------------------------------------------------------------------

class StreamDecoder:
    """Resumable per-segment token decoder over ring-indexed planes
    (reference 2-row memory-optimized decode, block_based_image.hh:52-121).

    The caller owns `planes` (ring-sized) and the compressed `data` bytes;
    both must stay alive for the decoder's lifetime."""

    def __init__(self, img: "NativeImage", row_masks, min_y: int, max_y: int,
                 is_last: bool, data: bytes):
        lib = get_lib()
        lib.lepton_stream_decoder_create.restype = ctypes.c_void_p
        self._destroy = lib.lepton_stream_decoder_destroy
        self._run = lib.lepton_stream_decoder_run
        self._run.argtypes = [ctypes.c_void_p, ctypes.c_int]
        self._data = np.frombuffer(data, dtype=np.uint8)  # keep alive
        masks = np.asarray(list(row_masks) + [0x7FFFFFFF] * 4,
                           dtype=np.int32)[:4]
        self._handle = lib.lepton_stream_decoder_create(
            img.plane_ptrs, img.widths, img.heights, img.comp_sizes,
            img.max_heights, img.ncomp, img.mcuv, img.color_ptrs,
            masks.ctypes.data_as(ctypes.c_void_p),
            min_y, max_y, int(is_last),
            self._data.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(len(data)))
        if not self._handle:
            raise MemoryError("stream decoder alloc failed")

    def run(self, until_luma_y: int) -> int:
        """0 = paused at until_luma_y, 1 = segment complete, raises on
        corrupt streams (STREAM_INCONSISTENT)."""
        r = self._run(self._handle, until_luma_y)
        if r < 0:
            raise RuntimeError("native decode: stream inconsistent")
        return r

    def close(self) -> None:
        if self._handle:
            self._destroy(ctypes.c_void_p(self._handle))
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def set_model_template(data) -> None:
    """Overwrite the initial-model template used by every segment codec
    (None restores the identity model).  Mirrors the process-global
    LEPTON_COMPRESSION_MODEL semantics of the reference."""
    lib = get_lib()
    lib.lepton_arena_template.restype = ctypes.POINTER(ctypes.c_uint8)
    ptr = lib.lepton_arena_template()
    from ..model.tables import ARENA_SIZE
    n = ARENA_SIZE * 3
    if data is None:
        ident = np.empty((ARENA_SIZE, 3), dtype=np.uint8)
        ident[:, 0] = 1
        ident[:, 1] = 1
        ident[:, 2] = 128
        data = ident.tobytes()
    assert len(data) == n
    ctypes.memmove(ptr, data, n)


def thread_arena_snapshot() -> "np.ndarray":
    """Copy of this thread's codec arena (post-encode model state)."""
    return _thread_arena().copy()
