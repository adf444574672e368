"""On-device encode pipeline: coefficient planes -> per-segment symbol
streams -> lane-parallel phase-B coding.

This is the production TPU encode path (SURVEY.md section 7): phase A +
symbolization (kernels/symbolize.py) emit every segment's (branch, bit)
stream as arrays on the accelerator; the host only orchestrates geometry
(segment splits, the row_spec interleave of lepton_codec.hh:41-100) and
assembles the already-computed streams.  No native code runs between
coefficients and the container mux.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..codec.driver import row_spec_from_index
from .symbolize import BLOCK_SLOTS, symbolize_slice
from .vpx_scan import PAD


def plan_rows(heights: Sequence[int], mcuv: int,
              max_coded_heights: Sequence[int],
              splits_y: Sequence[int]) -> List[List[Tuple[int, int]]]:
    """Per-segment (component, row) visit lists in row_spec order.

    splits_y: luma_y_start of each segment (ascending); the last segment
    runs to the end (is_last_thread semantics of _run_segment).
    """
    nseg = len(splits_y)
    bounds = list(splits_y) + [1 << 30]
    out = [[] for _ in range(nseg)]
    index = 0
    heights = list(heights) + [0] * max(0, 3 - len(heights))
    mh = list(max_coded_heights) + [0] * max(0, 3 - len(max_coded_heights))
    while True:
        spec = row_spec_from_index(index, heights, mcuv, mh)
        index += 1
        if spec.done:
            break
        if spec.skip:
            continue
        # the owning segment: largest s with bounds[s] <= luma_y
        s = 0
        for k in range(nseg):
            if bounds[k] <= spec.luma_y:
                s = k
        out[s].append((spec.component, spec.curr_y))
    return out


def segment_top_rows(plans: List[List[Tuple[int, int]]],
                     ncomp: int) -> List[set]:
    """Rows whose above-context is absent: the first processed row of
    each component within each segment (is_top_row reset,
    lepton_codec.hh:173-181)."""
    tops = [set() for _ in range(ncomp)]
    for plan in plans:
        seen = set()
        for comp, y in plan:
            if comp not in seen:
                seen.add(comp)
                tops[comp].add(y)
    return tops


def symbolize_image(planes: Sequence[np.ndarray], color_tables,
                    mcuv: int, max_coded_heights: Sequence[int],
                    component_sizes: Sequence[int],
                    splits_y: Sequence[int],
                    color_index=None):
    """Symbolize a whole image on-device for a given segmentation.

    planes[c]: int16 [H_c, W_c, 64]; color_tables[c]: ColorTables.
    Returns (segments, plans): segments[s] = (idx int32[np], bit uint8[np])
    ready for vpx_scan.build_symbol_streams.

    One symbolize_slice call per component covers every segment: the
    segment-top rows are masked via row_has_above, so the jit cache sees
    only ncomp shapes regardless of segment count.
    """
    import jax
    import jax.numpy as jnp

    ncomp = len(planes)
    heights = [p.shape[0] for p in planes]
    plans = plan_rows(heights, mcuv, max_coded_heights, splits_y)
    tops = segment_top_rows(plans, ncomp)

    slabs = []
    for c in range(ncomp):
        ct = color_tables[c]
        ci = (0 if c == 0 else 1) if color_index is None else color_index(c)
        H = planes[c].shape[0]
        has_above = np.ones(H, dtype=bool)
        has_above[0] = False
        for y in tops[c]:
            has_above[y] = False
        idx, bit = symbolize_slice(
            jnp.asarray(planes[c]), ci,
            jnp.asarray(ct.quant, dtype=jnp.int32),
            tuple(int(v) for v in ct.icos_idct_edge_8192_dequantized_x),
            tuple(int(v) for v in ct.icos_idct_edge_8192_dequantized_y),
            tuple(int(v) for v in ct.min_noise_threshold),
            jnp.int32(0), jnp.int32(component_sizes[c]),
            jnp.asarray(has_above))
        slabs.append((idx, bit))

    # host assembly: per-row masked extraction in visit order.  The slabs
    # come back as [H, W, BLOCK_SLOTS]; row extraction is numpy boolean
    # indexing over already-final data (no codec logic on the host).
    host_slabs = [(np.asarray(i), np.asarray(b)) for i, b in slabs]
    segments = []
    for plan in plans:
        parts_i, parts_b = [], []
        for comp, y in plan:
            i3, b3 = host_slabs[comp]
            row_i = i3[y].reshape(-1)
            row_b = b3[y].reshape(-1)
            m = row_i != PAD
            parts_i.append(row_i[m])
            parts_b.append(row_b[m])
        if parts_i:
            segments.append((np.concatenate(parts_i),
                             np.concatenate(parts_b)))
        else:
            segments.append((np.zeros(0, np.int32), np.zeros(0, np.uint8)))
    return segments, plans
