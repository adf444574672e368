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

# coarse stage seconds of the most recent encode_images_device call
# (bench.py reports this as the batch wall-clock breakdown; dispatch is
# async, so device compute surfaces inside the blocking fetch stages)
LAST_PROFILE: dict = {}


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
            jnp.asarray(ct.icos_idct_edge_8192_dequantized_x,
                        dtype=jnp.int32),
            jnp.asarray(ct.icos_idct_edge_8192_dequantized_y,
                        dtype=jnp.int32),
            jnp.asarray(ct.min_noise_threshold, dtype=jnp.int32),
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


# ---------------------------------------------------------------------------
# Device-side stream assembly: symbols never leave the chip.
#
# The padded symbolization slabs are ~450x the real symbol count; pulling
# them to the host costs minutes over a tunnel (measured 166s of a 230s
# slrhills encode).  Instead: compact each plane's slots on-device, then
# build the [S, Lmax] per-segment streams with a run-offset cumsum + one
# flat gather (the row_spec interleave is a permutation of contiguous row
# runs), add the marker/stop framing from a constant tail region, and
# feed phase-B directly.  The only device->host traffic is per-row counts
# (KBs) and the final compacted coder output (~the .lep payload size).
# ---------------------------------------------------------------------------


def _bucket(n: int, q: int = 1 << 18) -> int:
    return (n + q - 1) // q * q


from functools import lru_cache


@lru_cache(maxsize=8)
def _vmapped_symbolize(ci):
    """jit(vmap(symbolize_slice)) cached per color class; the color
    tables are traced operands (one compile per geometry, not per
    quant table)."""
    import jax
    import jax.numpy as jnp

    from .symbolize import symbolize_slice

    def f(cf, quant, icx, icy, mnt, ra, cl):
        return symbolize_slice(cf, ci, quant, icx, icy, mnt,
                               jnp.int32(0), cl, ra)

    return jax.jit(jax.vmap(f, in_axes=(0, None, None, None, None, 0, 0)))


def _assemble_jit():
    """Module-level jit for the stream assembly (a nested @jax.jit closure
    would be a fresh function object per call and recompile every time)."""
    global _ASSEMBLE
    if _ASSEMBLE is None:
        import jax
        import jax.numpy as jnp
        from .vpx_scan import PAD

        from functools import partial

        @partial(jax.jit, static_argnames=("Lmax",))
        def assemble(packed, run_dst, run_off, run_valid,
                     seg_total, Lmax):
            S = run_dst.shape[0]
            Svec = jnp.arange(S)
            deltas = jnp.zeros((S, Lmax), jnp.int32)
            prev = jnp.concatenate(
                [jnp.zeros((S, 1), jnp.int32), run_off[:, :-1]], axis=1)
            dvals = jnp.where(run_valid, run_off - prev, 0)
            deltas = deltas.at[Svec[:, None], run_dst].add(dvals)
            offs = jnp.cumsum(deltas, axis=1)
            src = jnp.arange(Lmax, dtype=jnp.int32)[None, :] + offs
            live = jnp.arange(Lmax)[None, :] < seg_total[:, None]
            src = jnp.clip(src, 0, packed.shape[0] - 1)
            pk = packed[src]
            oi = jnp.where(live, pk >> 1, PAD)
            ob = jnp.where(live, (pk & 1).astype(jnp.uint8), 0)
            return oi, ob

        _ASSEMBLE = assemble
    return _ASSEMBLE


_ASSEMBLE = None


def _compact_out_jit():
    global _COMPACT_OUT
    if _COMPACT_OUT is None:
        import jax
        import jax.numpy as jnp
        from jax import lax

        @jax.jit
        def compact_out(emit, byte, carry):
            # two sort keys (emitted-first, then position) rather than a
            # packed (emit<<24)+pos scalar: positions beyond 2^24 (~2MB of
            # output per lane) would overflow a packed discriminant and
            # silently interleave dead slots into the stream.
            L = emit.shape[0]
            dead = jnp.where(emit, 0, 1).astype(jnp.int32)
            pos = jnp.broadcast_to(
                jnp.arange(L, dtype=jnp.int32)[:, None], emit.shape)
            k1, k2, b2, c2 = lax.sort(
                (dead.T, pos.T, byte.T.astype(jnp.int32),
                 carry.T.astype(jnp.int32)),
                dimension=1, is_stable=False, num_keys=2)
            return b2, c2

        _COMPACT_OUT = compact_out
    return _COMPACT_OUT


_COMPACT_OUT = None


def _pack_u16_jit():
    """byte | carry<<8 as uint16: one fetch, 8x less link traffic than
    the two int32 sort outputs."""
    global _PACK_U16
    if _PACK_U16 is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def pack(b2, c2):
            return (b2 | (c2 << 8)).astype(jnp.uint16)

        _PACK_U16 = pack
    return _PACK_U16


_PACK_U16 = None


def _vcounts_jit():
    """Module-level jit(vmap(row_symbol_counts)) -- a fresh vmap object
    per call would retrace every batch."""
    global _VCOUNTS
    if _VCOUNTS is None:
        import jax
        from .symbolize import row_symbol_counts
        _VCOUNTS = jax.jit(jax.vmap(row_symbol_counts))
    return _VCOUNTS


_VCOUNTS = None


def symbolize_image_device(planes, color_tables, mcuv, max_coded_heights,
                           component_sizes, splits_y, color_index=None,
                           window: int = 32, segment_range=None,
                           template=None):
    """Whole-image on-device encode: symbolize + assemble + phase-B.

    Returns (streams list of bytes per segment) ready for mux_streams --
    the VPX v1/v2 path with marker/stop framing applied on-device.

    segment_range=(lo, hi): restrict assembly + phase-B to that
    contiguous slice of segments (the multi-host per-process share);
    symbolization still covers the whole plane (it is segment-agnostic
    except for the masked top rows, which depend only on splits_y).
    template: optional packed uint32 [ARENA_SIZE] trained-model start
    state (LEPTON_COMPRESSION_MODEL) for the phase-B model recurrence.
    """
    import os
    import time as _time

    import jax
    import jax.numpy as jnp

    from .symbolize import symbolize_slice
    from . import vpx_scan
    from .vpx_scan import FIXED_PROB, PAD

    prof = os.environ.get("LEPTON_TPU_PROFILE") == "1"
    _t = [_time.time()]

    def mark(label):
        if prof:
            now = _time.time()
            print(f"  [tpu-encode] {label}: {now - _t[0]:.2f}s", flush=True)
            _t[0] = now

    ncomp = len(planes)
    heights = [p.shape[0] for p in planes]
    widths = [p.shape[1] for p in planes]
    plans = plan_rows(heights, mcuv, max_coded_heights, splits_y)
    tops = segment_top_rows(plans, ncomp)
    S = len(plans)

    # 1. symbolize all components with no host synchronization, then ONE
    # counts fetch (each per-component blocking fetch was a full tunnel
    # round trip), then per-plane compaction on device
    from .symbolize import row_symbol_counts, compact_symbols_packed
    slabs = []                # (idx, bit, counts_dev) per comp
    for c in range(ncomp):
        ct = color_tables[c]
        ci = (0 if c == 0 else 1) if color_index is None else color_index(c)
        H = heights[c]
        rha = np.ones(H, dtype=bool)
        rha[0] = False
        for y in tops[c]:
            rha[y] = False
        idx, bit = symbolize_slice(
            jnp.asarray(planes[c]), ci,
            jnp.asarray(ct.quant, dtype=jnp.int32),
            jnp.asarray(ct.icos_idct_edge_8192_dequantized_x,
                        dtype=jnp.int32),
            jnp.asarray(ct.icos_idct_edge_8192_dequantized_y,
                        dtype=jnp.int32),
            jnp.asarray(ct.min_noise_threshold, dtype=jnp.int32),
            jnp.int32(0), jnp.int32(component_sizes[c]),
            jnp.asarray(rha))
        slabs.append((idx, bit, row_symbol_counts(idx)))
        mark(f"symbolize comp{c} dispatched")
    all_counts = np.asarray(jnp.concatenate([s[2] for s in slabs]))
    mark("counts-fetch")
    packed_parts = []
    row_offsets = []          # per comp: host offsets of each row's run
    base = 0
    coff = 0
    for c, (idx, bit, _) in enumerate(slabs):
        H = heights[c]
        counts = all_counts[coff:coff + H]
        coff += H
        total = int(counts.sum())
        pk, _ = compact_symbols_packed(idx.reshape(-1), bit.reshape(-1),
                                       _bucket(max(total, 1)))
        packed_parts.append((pk, total))
        offs = np.zeros(H + 1, np.int64)
        offs[1:] = np.cumsum(counts)
        row_offsets.append(base + offs)
        base += _bucket(max(total, 1))
        mark(f"compact comp{c}")

    # constant framing tail: 33 FIXED_PROB zero-bit slots (marker + stop)
    frame = jnp.full((64,), FIXED_PROB * 2, jnp.int32)
    packed = jnp.concatenate([p for p, _ in packed_parts] + [frame])
    frame_base = base

    # 2. host: run plan per segment (marker, rows in row_spec order, stop)
    seg_runs = []
    seg_total = np.zeros(S, np.int64)
    for s, plan in enumerate(plans):
        runs = [(0, frame_base, 1)]                        # marker bit
        dst = 1
        for comp, y in plan:
            src0 = int(row_offsets[comp][y])
            ln = int(row_offsets[comp][y + 1] - row_offsets[comp][y])
            if ln:
                runs.append((dst, src0, ln))
                dst += ln
        runs.append((dst, frame_base, 32))                 # stop bits
        dst += 32
        seg_runs.append(runs)
        seg_total[s] = dst
    if segment_range is not None:
        lo, hi = segment_range
        seg_runs = seg_runs[lo:hi]
        seg_total = seg_total[lo:hi]
        S = hi - lo
    Lmax = _bucket(int(seg_total.max()), 1 << 14)
    Rmax = max(len(r) for r in seg_runs)
    run_dst = np.zeros((S, Rmax), np.int64)
    run_off = np.zeros((S, Rmax), np.int64)
    run_valid = np.zeros((S, Rmax), bool)
    for s, runs in enumerate(seg_runs):
        for r, (dst0, src0, ln) in enumerate(runs):
            run_dst[s, r] = dst0
            run_off[s, r] = src0 - dst0
            run_valid[s, r] = True

    # 3. device: run-offset scatter + cumsum + flat gather -> [S, Lmax]
    oi, ob = _assemble_jit()(packed,
                             jnp.asarray(run_dst.astype(np.int32)),
                             jnp.asarray(run_off.astype(np.int32)),
                             jnp.asarray(run_valid),
                             jnp.asarray(seg_total), Lmax)
    if prof:
        jax.block_until_ready((oi, ob))
    mark("assemble")

    # 4. phase-B on device, then per-lane output compaction via the sort
    # trick (emitted bytes first, in order) -- scatters stay off the TPU
    emit, byte, carry, nbytes = vpx_scan.encode_streams_twopass(
        oi, ob, window=window,
        template=None if template is None
        else jnp.asarray(template, jnp.uint32))
    if prof:
        jax.block_until_ready(nbytes)
    mark("phase-B")

    b2, c2 = _compact_out_jit()(emit, byte, carry)
    bc16 = _pack_u16_jit()(b2, c2)
    mark("compact-out")
    nb = np.asarray(nbytes)
    maxb = _bucket(int(nb.max()) + 1, 1 << 12)
    bch = np.asarray(bc16[:, :maxb])    # byte | carry<<8: one fetch
    mark("output transfer")

    streams = []
    for s in range(S):
        n = int(nb[s])
        row = bch[s, :n]
        bs = bytearray((row & 0xFF).astype(np.uint8).tobytes())
        for i in np.nonzero(row >> 8)[0]:
            j = int(i) - 1
            while j >= 0 and bs[j] == 0xFF:
                bs[j] = 0
                j -= 1
            assert j >= 0, "carry out of stream start"
            bs[j] += 1
        if len(bs) and (bs[-1] & 0xE0) == 0xC0:
            bs.append(0)
        streams.append(bytes(bs))
    return streams


def encode_images_device(images, window: int = 32):
    """Batch encode MANY images on one chip: lanes = sum of all images'
    segments (lanes carry O(1) state in the two-pass coder, so batch
    size is free parallelism -- the serving-throughput design point).

    images: list of dicts with keys planes, color_tables, mcuv,
    max_coded_heights, component_sizes, splits_y, color_index(optional).
    Same-geometry images share every jit compilation (quant tables are
    traced; icos/min-noise tables recompile only per distinct qtable).
    Returns list (per image) of per-segment stream bytes.
    """
    import os
    import sys as _sys
    import time as _time

    import jax
    import jax.numpy as jnp

    from .symbolize import compact_symbols_packed, row_symbol_counts, \
        symbolize_slice
    from . import vpx_scan
    from .vpx_scan import FIXED_PROB, PAD

    prof = os.environ.get("LEPTON_TPU_PROFILE") == "1"
    LAST_PROFILE.clear()
    _t = [_time.time()]

    def mark(label, key=None):
        # always accumulate coarse stage seconds into LAST_PROFILE so
        # bench.py can report WHERE batch wall-clock goes (dispatch is
        # async: device compute surfaces inside the blocking fetches)
        now = _time.time()
        dt = now - _t[0]
        _t[0] = now
        k = key or label
        LAST_PROFILE[k] = LAST_PROFILE.get(k, 0.0) + dt
        if prof:
            print(f"  [tpu-batch] {label}: {dt:.2f}s", file=_sys.stderr,
                  flush=True)

    # group same-geometry/same-qtable images so symbolization runs as ONE
    # vmapped dispatch per (group, component) and compaction as one call
    # over the stacked slabs (per-image dispatches dominate batch latency
    # through a remote TPU link)
    groups = {}
    img_plans = [None] * len(images)
    img_rowoffs = [None] * len(images)
    for d, im in enumerate(images):
        cix = im.get("color_index")
        ncomp = len(im["planes"])
        key = tuple(
            (im["planes"][c].shape,
             bytes(np.asarray(im["color_tables"][c].quant, np.int32)),
             (0 if c == 0 else 1) if cix is None else cix(c))
            for c in range(ncomp))
        groups.setdefault(key, []).append(d)
        heights = [p.shape[0] for p in im["planes"]]
        img_plans[d] = plan_rows(heights, im["mcuv"],
                                 im["max_coded_heights"], im["splits_y"])
        img_rowoffs[d] = [None] * ncomp

    # phase 1: dispatch EVERY group's transfer + symbolize + counts with
    # no host synchronization, then fetch all counts in one transfer.
    # Rationale: the per-group blocking counts fetch was one full tunnel
    # round trip each; on a heterogeneous corpus groups are mostly
    # singletons, so those round trips dominated warm batch latency.
    # Waves bound the slabs held live on the device (idx+bit stay
    # resident until their compaction) to ~4 GB of HBM.
    packed_parts = []
    base = 0
    pending = []                 # (part, c, H, idx, bit, counts_dev)
    wave_bytes = 0
    WAVE_LIMIT = 4 << 30

    def drain_wave():
        nonlocal base, wave_bytes
        if not pending:
            return
        allc = jnp.concatenate([p[5].reshape(-1) for p in pending])
        allc_host = np.asarray(allc)       # ONE fetch for the wave
        mark(f"counts-fetch x{len(pending)}", key="counts_fetch")
        off = 0
        for part, c, H, idx, bit, _ in pending:
            n = len(part) * H
            counts = allc_host[off:off + n].reshape(len(part), H)
            off += n
            total = int(counts.sum())
            pk, _ = compact_symbols_packed(
                idx.reshape(-1), bit.reshape(-1),
                _bucket(max(total, 1)))
            packed_parts.append(pk)
            flat_off = np.zeros(len(part) * H + 1, np.int64)
            flat_off[1:] = np.cumsum(counts.reshape(-1))
            for g, d in enumerate(part):
                img_rowoffs[d][c] = \
                    base + flat_off[g * H:g * H + H + 1]
            base += _bucket(max(total, 1))
        pending.clear()
        wave_bytes = 0
        mark("compact", key="compact_dispatch")

    for key, members in groups.items():
        ncomp = len(key)
        for c in range(ncomp):
            ct = images[members[0]]["color_tables"][c]
            ci = key[c][2]
            H, W = key[c][0][0], key[c][0][1]
            icx = jnp.asarray(ct.icos_idct_edge_8192_dequantized_x,
                              dtype=jnp.int32)
            icy = jnp.asarray(ct.icos_idct_edge_8192_dequantized_y,
                              dtype=jnp.int32)
            mnt = jnp.asarray(ct.min_noise_threshold, dtype=jnp.int32)
            quant = jnp.asarray(ct.quant, dtype=jnp.int32)
            # chunk the group so stacked slabs stay within a few GB of HBM
            slab_bytes = H * W * 1400 * 5
            chunk = max(1, (3 << 30) // max(slab_bytes, 1))
            for lo in range(0, len(members), chunk):
                part = members[lo:lo + chunk]
                coefs = np.stack([np.asarray(images[d]["planes"][c])
                                  for d in part])
                rha = np.ones((len(part), H), dtype=bool)
                csv = np.zeros(len(part), np.int32)
                for g, d in enumerate(part):
                    tops = segment_top_rows(img_plans[d], ncomp)
                    rha[g, 0] = False
                    for y in tops[c]:
                        rha[g, y] = False
                    csv[g] = images[d]["component_sizes"][c]
                mark(f"host-prep g{len(packed_parts) + len(pending)}",
                     key="host_prep")
                coefs_dev = jnp.asarray(coefs)
                idx, bit = _vmapped_symbolize(ci)(
                    coefs_dev, quant, icx, icy, mnt,
                    jnp.asarray(rha), jnp.asarray(csv))
                cnts = _vcounts_jit()(idx)
                pending.append((part, c, H, idx, bit, cnts))
                wave_bytes += len(part) * slab_bytes
                if wave_bytes >= WAVE_LIMIT:
                    drain_wave()
    drain_wave()

    frame = jnp.full((64,), FIXED_PROB * 2, jnp.int32)
    packed = jnp.concatenate(packed_parts + [frame])
    frame_base = base

    lane_runs = []
    lane_total = []
    lane_owner = []                       # (image, segment)
    for d, (im, plans) in enumerate(zip(images, img_plans)):
        for si, plan in enumerate(plans):
            runs = [(0, frame_base, 1)]
            dst = 1
            for comp, y in plan:
                ro = img_rowoffs[d][comp]
                src0 = int(ro[y])
                ln = int(ro[y + 1] - ro[y])
                if ln:
                    runs.append((dst, src0, ln))
                    dst += ln
            runs.append((dst, frame_base, 32))
            dst += 32
            lane_runs.append(runs)
            lane_total.append(dst)
            lane_owner.append((d, si))
    S = len(lane_runs)
    mark("run-plan", key="run_plan")

    # ---- phase-B length pooling: work is S_pool * Lmax_pool, so one
    # long lane (a big image's segment) must not pad every short lane to
    # its length.  Lanes pool by power-of-2 padded length; lane counts
    # pad to a multiple of 8 with dummy (marker+stop only) lanes.  Each
    # pool runs assemble -> two-pass coder -> output compaction, and the
    # result is fetched as ONE uint16 array (byte | carry<<8) -- 8x less
    # link traffic than the raw int32 sort outputs.
    pools = {}
    for i, t in enumerate(lane_total):
        Lb = 1 << max(14, int(t - 1).bit_length())
        pools.setdefault(Lb, []).append(i)
    # merge small pools upward: the coder scan runs on [W, S]-shaped
    # vectors, so narrow lane counts waste the VPU (measured: the arith
    # pass is ~31 Msym/s at S=16 vs ~500 at S=2048); a pool must be
    # wide, and only the longest-lane pool may stay narrow
    merged = []
    acc = []
    for Lb in sorted(pools):
        acc.extend(pools[Lb])
        if len(acc) >= 48:
            merged.append((Lb, acc))
            acc = []
    if acc:
        # the long-lane remainder stays its own (narrow) pool: its scan
        # depth is irreducible, and merging short lanes upward would
        # only inflate the sort volume
        merged.append((sorted(pools)[-1], acc))

    fetches = []
    for Lmax, members in merged:
        Sp = (len(members) + 7) // 8 * 8
        Rmax = (max(len(lane_runs[i]) for i in members) + 63) // 64 * 64
        run_dst = np.zeros((Sp, Rmax), np.int32)
        run_off = np.zeros((Sp, Rmax), np.int32)
        run_valid = np.zeros((Sp, Rmax), bool)
        totals = np.zeros(Sp, np.int64)
        for s_i, lane in enumerate(members):
            for r, (dst0, src0, ln) in enumerate(lane_runs[lane]):
                run_dst[s_i, r] = dst0
                run_off[s_i, r] = src0 - dst0
                run_valid[s_i, r] = True
            totals[s_i] = lane_total[lane]
        for s_i in range(len(members), Sp):     # dummy lanes: marker+stop
            run_dst[s_i, 0] = 0
            run_off[s_i, 0] = frame_base
            run_valid[s_i, 0] = True
            run_dst[s_i, 1] = 1
            run_off[s_i, 1] = frame_base - 1
            run_valid[s_i, 1] = True
            totals[s_i] = 33
        oi, ob = _assemble_jit()(packed, jnp.asarray(run_dst),
                                 jnp.asarray(run_off),
                                 jnp.asarray(run_valid),
                                 jnp.asarray(totals), Lmax)
        emit, byte, carry, nbytes = vpx_scan.encode_streams_twopass(
            oi, ob, window=window)
        b2, c2 = _compact_out_jit()(emit, byte, carry)
        bc16 = _pack_u16_jit()(b2, c2)
        fetches.append((members, bc16, nbytes))
        if prof:
            np.asarray(nbytes[0])
        mark(f"pool S={Sp} Lmax={Lmax} dispatched", key="pool_dispatch")

    out = [[] for _ in images]
    results = {}
    # one fetch for every pool's byte counts, then the sliced outputs
    # (each pool's slice width depends on its own max count)
    all_nb = np.asarray(jnp.concatenate(
        [nbytes for _, _, nbytes in fetches])) if fetches else np.zeros(0)
    mark("nbytes-fetch", key="nbytes_fetch")
    nb_off = 0
    sliced = []
    for members, bc16, nbytes in fetches:
        nb = all_nb[nb_off:nb_off + bc16.shape[0]]
        nb_off += bc16.shape[0]
        maxb = _bucket(int(nb[:len(members)].max()) + 1, 1 << 12)
        sliced.append((members, nb, bc16[:, :maxb]))
    for (members, nb, dev_slice) in sliced:
        bch = np.asarray(dev_slice)
        mark(f"output-fetch {len(members)}x{bch.shape[1]}",
             key="output_fetch")
        for s_i, lane in enumerate(members):
            n = int(nb[s_i])
            row = bch[s_i, :n]
            bs = bytearray((row & 0xFF).astype(np.uint8).tobytes())
            for i in np.nonzero(row >> 8)[0]:
                j = int(i) - 1
                while j >= 0 and bs[j] == 0xFF:
                    bs[j] = 0
                    j -= 1
                assert j >= 0, "carry out of stream start"
                bs[j] += 1
            if len(bs) and (bs[-1] & 0xE0) == 0xC0:
                bs.append(0)
            results[lane] = bytes(bs)
    for lane in range(S):
        d, si = lane_owner[lane]
        out[d].append(results[lane])
    mark("host-finalize", key="host_finalize")
    return out
