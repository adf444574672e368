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
        models = ARENA_SIZE * 3  # one resident segment decoder at a time
    else:
        planes = sum(info.cmpnfo[c].bc * 64 * 2 for c in range(info.cmpc))
        models = num_threads * ARENA_SIZE * 3
    # neighbor rings: 2 rows x width x (nz + 16 edge pixels)
    rings = sum(2 * info.cmpnfo[c].bch * 40 for c in range(info.cmpc)) \
        * (1 if streaming else num_threads)
    # mux stream buffers + huffman re-emit output + header block
    streams = original_size + 65536 * num_threads
    output = original_size + 65536
    header = 1 << 20
    return planes + models + rings + streams + output + header


def check_memory_bound(info, num_threads: int, original_size: int,
                       limit_bytes: int) -> bool:
    return decompression_memory_bound(
        info, num_threads, original_size) <= limit_bytes
