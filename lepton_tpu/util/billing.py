"""Bit-level accounting: attribute every model decision to a category.

Equivalent of the reference's billing subsystem (src/vp8/util/billing.hh):
the compression-ratio debugging tool.  Because every adaptive decision is a
branch in one flat arena, attribution is a pure function of the branch
index -- a (branch_idx, bit) symbol stream (from the C symbolizer or the
Python coder) plus the compressed size yields the full breakdown without
instrumenting the hot loops.
"""
from __future__ import annotations

from typing import Dict, Iterable, Tuple

import numpy as np

from ..model.tables import TABLE_OFFSETS, TABLE_SHAPES

CATEGORY_OF_TABLE = {
    "nz_7x7": "NZ_7x7",
    "nz_1x8": "NZ_EDGE",
    "nz_8x1": "NZ_EDGE",
    "residual_noise": "RES_AC",
    "residual_noise_dc": "RES_DC",
    "residual_thresh": "RES_EDGE_THRESH",
    "exp_7x7": "EXP_7x7",
    "exp_x": "EXP_EDGE",
    "exp_dc": "EXP_DC",
    "sign": "SIGN",
}

_BOUNDS = []
for _name, _shape in TABLE_SHAPES:
    _start = TABLE_OFFSETS[_name]
    _BOUNDS.append((_start, _start + int(np.prod(_shape)), _name))
_BOUNDS.sort()


def bill_symbol_stream(idx: np.ndarray) -> Dict[str, int]:
    """Count uncompressed (decision) bits per category for one stream."""
    idx = np.asarray(idx)
    idx = idx[idx >= 0]
    counts: Dict[str, int] = {}
    edges = [b[0] for b in _BOUNDS] + [_BOUNDS[-1][1]]
    hist, _ = np.histogram(idx, bins=edges)
    for (start, end, name), n in zip(_BOUNDS, hist):
        cat = CATEGORY_OF_TABLE[name]
        counts[cat] = counts.get(cat, 0) + int(n)
    return counts


def print_bill(streams: Iterable[Tuple[np.ndarray, int]], file=None) -> None:
    """Billing table: decision bits per category + compressed bytes.

    streams: iterable of (branch_idx_array, compressed_len_bytes).
    """
    import sys
    file = file or sys.stderr
    total: Dict[str, int] = {}
    compressed = 0
    for idx, clen in streams:
        compressed += clen
        for k, v in bill_symbol_stream(idx).items():
            total[k] = total.get(k, 0) + v
    grand = sum(total.values())
    file.write(f"{'category':<18}{'decisions':>12}{'share':>9}\n")
    for k in sorted(total, key=total.get, reverse=True):
        file.write(f"{k:<18}{total[k]:>12}{100.0 * total[k] / max(grand, 1):>8.1f}%\n")
    file.write(f"{'TOTAL':<18}{grand:>12}  -> {compressed} compressed bytes "
               f"({8.0 * compressed / max(grand, 1):.3f} bits/decision)\n")
