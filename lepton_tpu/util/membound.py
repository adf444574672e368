"""Decompression memory bound oracle.

Equivalent of decompression_memory_bound (reference jpgcoder.cc:1236-1330):
computes the exact buffer footprint a decode will need so callers can
enforce a declared memory envelope (-recodememory=).
"""
from __future__ import annotations

from ..model.tables import ARENA_SIZE


def decompression_memory_bound(info, num_threads: int,
                               original_size: int,
                               streaming: bool = True) -> int:
    """Upper bound in bytes for decoding one .lep of this geometry.

    `streaming` reflects the O(width) ring-plane decode
    (api.decompress_streaming, the reference's 2-row memory-optimized mode
    chosen at jpgcoder.cc:4216): plane memory is a few rows per component,
    not the full framebuffer."""
    if streaming:
        planes = 0
        for c in range(info.cmpc):
            ci = info.cmpnfo[c]
            cm = max(1, ci.bcv // info.mcuv) if info.mcuv else 1
            rr = 1
            while rr < cm + 1:
                rr <<= 1
            planes += rr * ci.bch * 64 * 2
        # every segment's decoder state (model arena) is created up
        # front and lives for the whole decode, plus the image's own
        # template/working arena (NativeImage.arena) allocated per decode
        # (measured: tracemalloc peak tracks num_threads+1 arenas)
        models = (num_threads + 1) * ARENA_SIZE * 3
    else:
        planes = sum(info.cmpnfo[c].bc * 64 * 2 for c in range(info.cmpc))
        models = (num_threads + 1) * ARENA_SIZE * 3
    # neighbor rings: 2 rows x width x (nz + 16 edge pixels)
    rings = sum(2 * info.cmpnfo[c].bch * 40 for c in range(info.cmpc)) \
        * (1 if streaming else num_threads)
    # mux stream buffers + huffman re-emit output + header block.
    # Constants are calibrated, not guessed: tests/test_sandbox.py
    # (test_membound_calibrated) measures the decode's actual peak
    # allocation via tracemalloc across corpus geometries and asserts
    # this oracle bounds it; the reference instead derives its exact
    # per-buffer sum from its arena bookkeeping (jpgcoder.cc:1236-1316).
    # demuxed segment streams live twice (mux buffers + bytes() copies)
    streams = 2 * original_size + 65536 * num_threads
    # output bytearray growth: doubling transiently holds old + new(2x)
    output = 3 * original_size + 65536
    header = 1 << 20                     # container header block + zlib
    return planes + models + rings + streams + output + header


def check_memory_bound(info, num_threads: int, original_size: int,
                       limit_bytes: int) -> bool:
    return decompression_memory_bound(
        info, num_threads, original_size) <= limit_bytes
