"""Batch TPU encode v3: the corpus-throughput pipeline at the lane knee.

Round-5 redesign of the r4 pipeline, driven by measured XLA primitive
rates on the v5e (tools/prim_probe.py): per-element gathers and full-row
sorts run at a few tens of M elem/s, so every stage that touched one
element per symbol was linear-in-symbols SLOW, and the 2048-lane knee
OOMed because the model-pass sort carried three int32 operands.  The
fixes, in data-flow order:

  - Symbolize keeps the cheap narrow per-block compaction sort (1.5G
    elem/s at width 1357); each ROW's symbol total pads to a multiple
    of 128 (PAD symbols are no-ops to the coder, so alignment padding
    is free semantically; it costs ~1% extra lane volume).
  - Flatten = slice blocks to the wave's max block count (fetched with
    the row counts), ONE wide-row compaction sort per slab row
    (380-640 M elem/s measured), then a 128-tile gather of the row
    prefixes into the packed stream -- no per-element gathers, and no
    sub-128 minor dims (a [N,4] quad view would pay 32x T(8,128) tile
    padding; that design OOMed at compile time).
  - Stream assembly becomes a 128-wide ROW gather (the embedding-lookup
    form XLA is fast at, 2.6 GB/s): 128x fewer indices than the r4
    per-element assemble.  The run tables live at tile granularity.
  - The model pass sorts with ONE packed payload (pos<<1|bit), and pools
    are volume-capped (LEPTON_TPU_POOL_ELEMS) so the knee shape fits
    HBM: ~1024 lanes x 344K symbols per phase-B invocation.
  - The arithmetic pass, output tile-compaction (per-tile sort of width
    512 instead of a full-row sort), and byte/carry packing fuse into
    ONE jit whose outputs are (bytes, carry bitmask, nbytes, max nbytes).
    The host fetches one stacked max-nbytes array for ALL pools, then
    slices each pool's payload -- no per-pool nbytes sync (VERDICT r4
    item 3).  A lane whose output exceeds the static OUTCAP (adversarial
    inputs only; real JPEG scans code < 1 byte per 6 symbols) falls back
    to the unfused sort-compacted path, which has no cap.

Stream bytes stay bit-identical to the host encoder's (the mux-gather
contract of vp8_encoder.cc:576-594 is applied by the caller): PAD
alignment symbols are skipped by the coder and change no output byte.
"""
from __future__ import annotations

import os
import sys
import time
from functools import lru_cache, partial
from typing import List, Sequence, Tuple

import numpy as np

from .encode_pipeline import (LAST_PROFILE, _bucket, plan_rows,
                              segment_top_rows)
from .symbolize import BLOCK_SLOTS

LEN_BUCKET = 1 << 13                     # lane-length bucket (elements)
TILE = 128                               # assembly row-gather width
PACK_T = 512                             # output-compaction tile width
GROUP_B = 8                              # blocks per level-1 rowpack group


def _pool_elems() -> int:
    """Max Sp*Lmax elements per phase-B pool: bounds the model-pass sort
    HBM footprint (2 int32 operands in + out, plus the packed lanes and
    scan outputs) so the 2048-lane knee runs as a few ~1024-lane pools
    instead of one OOMing dispatch."""
    return int(os.environ.get("LEPTON_TPU_POOL_ELEMS", 360 << 20))


def _mark(label, t, key=None):
    now = time.time()
    LAST_PROFILE[key or label] = LAST_PROFILE.get(key or label, 0.0) \
        + (now - t[0])
    if os.environ.get("LEPTON_TPU_PROFILE") in ("1", "2"):
        print(f"  [tpu-batch3] {label}: {now - t[0]:.2f}s",
              file=sys.stderr, flush=True)
    t[0] = now


def _sync(x, label, t):
    """LEPTON_TPU_PROFILE=2: force one element to the host so dispatch-
    async stages surface where they are spent (costs one RTT each; never
    on in the product path)."""
    if os.environ.get("LEPTON_TPU_PROFILE") == "2":
        np.asarray(x.reshape(-1)[-1:])
        _mark(label, t, "sync_" + label)


def _acct(key, nbytes):
    LAST_PROFILE[key] = LAST_PROFILE.get(key, 0) + int(nbytes)


@lru_cache(maxsize=8)
def _sym_sorted_jit(ci):
    """One fused jit per color CLASS (0 luma / 1 chroma): vmapped
    symbolize -> (branch<<1|bit) packing -> per-block compaction sort ->
    counts.  The color tables (quant, icos edges, noise thresholds) are
    TRACED operands, not static: one compile serves every quant table at
    a given geometry -- per-qtable compiles made heterogeneous serving
    batches recompile per quality level.

    Returns (slab int32 [G, H, W, BLOCK_SLOTS] with each block's valid
    symbols as a prefix, rc_raw int32 [G, H] actual per-row symbol
    counts, bcmax int32 scalar = the largest single block's count --
    the row-compaction slice bound, gcmax = largest GROUP_B-group
    count)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from .symbolize import symbolize_slice
    from .vpx_scan import PAD

    def f(dc, ac8, esc_pos, esc_val, quant, icx, icy, mnt, rha, csv):
        def one(cf, quant, ra, cl):
            idx, bit = symbolize_slice(cf, ci, quant, icx, icy, mnt,
                                       jnp.int32(0), cl, ra)
            return idx, bit
        # coefficient transport: DC rides int16, AC rides int8 with an
        # escape list for the rare |coef| > 127 (halves the h2d bytes
        # AND the 1-vCPU host's transport serialization work)
        ac16 = ac8.astype(jnp.int16).reshape(-1)
        ac16 = ac16.at[esc_pos].set(esc_val)
        coefs = jnp.concatenate(
            [dc[..., None], ac16.reshape(ac8.shape)], axis=-1)
        idx, bit = jax.vmap(one, in_axes=(0, None, 0, 0))(
            coefs, quant, rha, csv)
        packed = (idx << 1) | bit.astype(jnp.int32)       # PAD -> -2/-1
        valid = idx != PAD
        bc = jnp.sum(valid, axis=3).astype(jnp.int32)     # [G, H, W]
        rc_raw = jnp.sum(bc, axis=2)
        bcmax = jnp.max(bc)
        # largest GROUP_B-block group count: the level-2 rowpack slice
        # bound (groups of blocks compact before whole rows do)
        W = bc.shape[2]
        W8 = (W + GROUP_B - 1) // GROUP_B * GROUP_B
        bcp = jnp.pad(bc, ((0, 0), (0, 0), (0, W8 - W)))
        gcmax = jnp.max(jnp.sum(
            bcp.reshape(bc.shape[0], bc.shape[1], W8 // GROUP_B, GROUP_B),
            axis=3))
        # dead slots sort to the end; live slots keep emission order via
        # the position key (unstable sort: the key is already unique)
        pos = jnp.arange(packed.shape[-1], dtype=jnp.int32)
        key = jnp.where(valid, pos, jnp.int32(1 << 30))
        _, slab = lax.sort((key, packed), dimension=3,
                           is_stable=False, num_keys=1)
        return slab, rc_raw, bcmax, gcmax

    return jax.jit(f)


_ROWPACK = None


def _rowpack_jit():
    """Slice each block-prefix-dense slab row to K slots (K >= the
    wave's largest block count, so nothing is lost), row-sort the slice
    so each ROW's live symbols become a prefix, and gather the row
    prefixes -- both ends 128-aligned -- into the packed stream as
    whole (.,128) tiles.

    TPU layout note (learned the hard way): any materialized 2-D array
    with minor dim < 128 pays T(8,128) tile padding -- a [N, 4] quad
    view of this stream would allocate 32x its size.  Everything here
    is element-wise, a wide-row sort (380-640 M elem/s measured,
    tools/prim_probe2.py), or a (.,128)-row gather (2.6 GB/s)."""
    global _ROWPACK
    if _ROWPACK is None:
        import jax
        import jax.numpy as jnp
        from jax import lax

        @partial(jax.jit, static_argnames=("K", "K2", "out_size"))
        def rowpack(slab, rc_pad, K, K2, out_size):
            G, H, W, S_ = slab.shape
            if K <= S_:
                sl = slab[..., :K]
            else:
                sl = jnp.pad(slab, ((0, 0),) * 3 + ((0, K - S_),),
                             constant_values=-2)
            W8 = (W + GROUP_B - 1) // GROUP_B * GROUP_B
            if W8 != W:
                sl = jnp.pad(sl, ((0, 0), (0, 0), (0, W8 - W), (0, 0)),
                             constant_values=-2)
            # level 1: compact GROUP_B-block groups (narrow sorts are
            # ~3x faster per element than full-row ones), slice to the
            # wave's max group count, then level 2 compacts whole rows
            # over the sliced volume
            g1 = sl.reshape(G * H * (W8 // GROUP_B), GROUP_B * K)
            pos1 = jnp.broadcast_to(
                jnp.arange(GROUP_B * K, dtype=jnp.int32), g1.shape)
            key1 = jnp.where(g1 >= 0, pos1, jnp.int32(1 << 30))
            _, g1s = lax.sort((key1, g1), dimension=1,
                              is_stable=False, num_keys=1)
            rows = g1s[:, :K2].reshape(G * H, (W8 // GROUP_B) * K2)
            pos = jnp.broadcast_to(
                jnp.arange(rows.shape[1], dtype=jnp.int32), rows.shape)
            key = jnp.where(rows >= 0, pos, jnp.int32(1 << 30))
            _, rowsorted = lax.sort((key, rows), dimension=1,
                                    is_stable=False, num_keys=1)
            # 128-tile gather of each row's prefix into the packed part
            rt = rc_pad // TILE                           # [GH] tiles
            run_dst = jnp.cumsum(rt) - rt
            row_base = jnp.arange(G * H, dtype=jnp.int32) \
                * (rows.shape[1] // TILE)
            run_off = row_base - run_dst
            prev = jnp.concatenate([jnp.zeros(1, jnp.int32), run_off[:-1]])
            n_t = out_size // TILE
            deltas = jnp.zeros((n_t,), jnp.int32)
            deltas = deltas.at[jnp.clip(run_dst, 0, n_t - 1)].add(
                run_off - prev)
            srct = jnp.arange(n_t, dtype=jnp.int32) + jnp.cumsum(deltas)
            src2d = rowsorted.reshape(-1, TILE)
            return src2d[jnp.clip(srct, 0, src2d.shape[0] - 1)]

        _ROWPACK = rowpack
    return _ROWPACK


_ASSEMBLE_ROWS = None


def _assemble_rows_jit():
    """Lane assembly as a 128-wide row gather (embedding-lookup form):
    out[s, t, :] = rows2d[src_rows[s, t], :].  All runs are 128-aligned
    by construction, so the per-lane run tables live at tile
    granularity and the gather moves 512B per index."""
    global _ASSEMBLE_ROWS
    if _ASSEMBLE_ROWS is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def assemble(rows2d, src_rows):
            S, Tn = src_rows.shape
            return rows2d[src_rows].reshape(S, Tn * TILE)

        _ASSEMBLE_ROWS = assemble
    return _ASSEMBLE_ROWS


_TWOPASS_FUSED = {}


def _twopass_fused_jit():
    """model pass + arithmetic pass + tile-compacted output packing in
    ONE jit.  Output compaction sorts emitted bytes to the front of
    PACK_T-wide tiles (a width-512 sort instead of the r4 full-row
    sort), then one run-offset gather of OUTCAP elements per lane
    assembles the dense byte stream, its carry bitmask, and nbytes.
    Also returns max(nbytes): the host slices the payload fetch with it
    and detects OUTCAP overflow (-> unfused fallback)."""
    global _TWOPASS_FUSED
    if "fn" not in _TWOPASS_FUSED:
        import jax
        import jax.numpy as jnp
        from jax import lax
        from . import vpx_scan

        @partial(jax.jit, static_argnames=("window", "outcap"))
        def twopass(packed, window, outcap, template=None):
            idxs = packed >> 1          # arithmetic: PAD*2 -> PAD
            bits = (packed & 1).astype(jnp.uint8)
            probs = vpx_scan.model_probs_sorted(idxs, bits, window,
                                                template=template)
            emit, byte, carry, nbytes = vpx_scan.arith_pass(
                idxs, bits, probs, window)                # [L, S]
            S = emit.shape[1]
            L = emit.shape[0]
            padL = (L + PACK_T - 1) // PACK_T * PACK_T
            em = emit.T
            payload = (byte.astype(jnp.int32)
                       | (carry.astype(jnp.int32) << 8)).T
            if padL != L:
                em = jnp.pad(em, ((0, 0), (0, padL - L)))
                payload = jnp.pad(payload, ((0, 0), (0, padL - L)))
            nT = padL // PACK_T
            pos = jnp.broadcast_to(
                jnp.arange(padL, dtype=jnp.int32), (S, padL))
            key = jnp.where(em, pos, jnp.int32(1 << 30))
            _, ps = lax.sort(
                (key.reshape(S, nT, PACK_T),
                 payload.reshape(S, nT, PACK_T)),
                dimension=2, is_stable=False, num_keys=1)
            ps = ps.reshape(S, padL)
            tc = jnp.sum(em.reshape(S, nT, PACK_T), axis=2) \
                .astype(jnp.int32)
            run_dst = jnp.cumsum(tc, axis=1) - tc         # [S, nT]
            run_off = (jnp.arange(nT, dtype=jnp.int32) * PACK_T)[None, :] \
                - run_dst
            prev = jnp.concatenate(
                [jnp.zeros((S, 1), jnp.int32), run_off[:, :-1]], axis=1)
            svec = jnp.arange(S)
            deltas = jnp.zeros((S, outcap), jnp.int32)
            deltas = deltas.at[
                svec[:, None], jnp.clip(run_dst, 0, outcap - 1)].add(
                run_off - prev)
            offs = jnp.cumsum(deltas, axis=1)
            src = jnp.arange(outcap, dtype=jnp.int32)[None, :] + offs
            live = jnp.arange(outcap)[None, :] < nbytes[:, None]
            g = ps[svec[:, None], jnp.clip(src, 0, padL - 1)]
            bytes_u8 = jnp.where(live, g & 0xFF, 0).astype(jnp.uint8)
            cbit = jnp.where(live, (g >> 8) & 1, 0).astype(jnp.uint32)
            cw = cbit.reshape(S, outcap // 32, 32)
            mask = jnp.sum(cw << jnp.arange(32, dtype=jnp.uint32),
                           axis=2, dtype=jnp.uint32)
            return bytes_u8, mask, nbytes, jnp.max(nbytes)

        _TWOPASS_FUSED["fn"] = twopass
    return _TWOPASS_FUSED["fn"]


_TWOPASS_PACKED = None


def _twopass_packed_jit():
    """Unfused fallback (no OUTCAP): model + arith passes returning the
    raw [L, S] emit/byte/carry -- used only when a lane's output
    overflows the fused path's static OUTCAP (adversarial inputs)."""
    global _TWOPASS_PACKED
    if _TWOPASS_PACKED is None:
        import jax
        import jax.numpy as jnp
        from . import vpx_scan

        @partial(jax.jit, static_argnames=("window",))
        def twopass(packed, window, template=None):
            idxs = packed >> 1
            bits = (packed & 1).astype(jnp.uint8)
            probs = vpx_scan.model_probs_sorted(idxs, bits, window,
                                                template=template)
            return vpx_scan.arith_pass(idxs, bits, probs, window)

        _TWOPASS_PACKED = twopass
    return _TWOPASS_PACKED


_PACK_OUT = None


def _pack_out_jit():
    """Fallback output compaction: one full-row 2-operand unstable sort
    (emitted-first by position).  Correct for any nbytes; slower than
    the fused tile compaction."""
    global _PACK_OUT
    if _PACK_OUT is None:
        import jax
        import jax.numpy as jnp
        from jax import lax

        @jax.jit
        def pack(emit, byte, carry):
            # emit/byte/carry: [L, S] from arith_pass
            L = emit.shape[0]
            payload = (byte.astype(jnp.int32)
                       | (carry.astype(jnp.int32) << 8))
            pos = jnp.arange(L, dtype=jnp.int32)[:, None]
            key = jnp.where(emit, pos, jnp.int32(1 << 30))
            _, p2 = lax.sort((key.T, payload.T), dimension=1,
                             is_stable=False, num_keys=1)
            bytes_u8 = (p2 & 0xFF).astype(jnp.uint8)
            cbit = (p2 >> 8).astype(jnp.uint32)
            S = cbit.shape[0]
            padL = (L + 31) // 32 * 32
            if padL != L:
                bytes_u8 = jnp.pad(bytes_u8, ((0, 0), (0, padL - L)))
                cbit = jnp.pad(cbit, ((0, 0), (0, padL - L)))
            cw = cbit.reshape(S, padL // 32, 32)
            mask = jnp.sum(cw << jnp.arange(32, dtype=jnp.uint32),
                           axis=2, dtype=jnp.uint32)
            nbytes = jnp.sum(emit, axis=0).astype(jnp.int32)
            return bytes_u8, mask, nbytes

        _PACK_OUT = pack
    return _PACK_OUT


_ANSENC_PACKED = None


def _ansenc_packed_jit():
    """v3 phase-B over the ALIGNED packed stream in ONE jit: a dense
    pre-compaction sort (rANS pairing needs a gap-free stream), the
    sorted-branch model pass with the adv update rule (branch.hh:66-80),
    the reverse rANS register chain (rans64.hh, ans_bool_writer.hh:
    21-110), and emitted-word compaction.  nsyms (actual symbols per
    lane, host-known from the raw row counts) drives the pair walk.
    Returns (words int32 [S, 2*padNP] compacted in emission order,
    nwords [S], flush (h1, l1, h2, l2))."""
    global _ANSENC_PACKED
    if _ANSENC_PACKED is None:
        import jax
        import jax.numpy as jnp
        from jax import lax
        from . import vpx_scan

        @partial(jax.jit, static_argnames=("window",))
        def ansenc(packed, nsyms, window, template=None):
            S, L = packed.shape
            # compact alignment pads out: live symbols are packed >= 0
            # (dead slots are -2, or -1 when a dead slot carried bit=1 --
            # (PAD<<1)|1); position keys are unique, so an unstable sort
            # preserves order
            pos0 = jnp.broadcast_to(
                jnp.arange(L, dtype=jnp.int32), (S, L))
            key = jnp.where(packed >= 0, pos0, jnp.int32(1 << 30))
            _, pkd = lax.sort((key, packed), dimension=1,
                              is_stable=False, num_keys=1)
            idxs = pkd >> 1
            bits = (pkd & 1).astype(jnp.uint8)
            probs = vpx_scan.model_probs_sorted(idxs, bits, window,
                                                update="adv",
                                                template=template)
            ys, flush, padNP = vpx_scan.ans_pass(probs, bits, nsyms,
                                                 window)
            e1, w1, e2, w2 = ys                     # [padNP, S]
            NP, S2 = e1.shape
            # serial emission order: pair t ascending, s1's word then s2's
            # (ANSWriter.finish, mirrored by finalize_ans_streams)
            e = jnp.stack([e1, e2], axis=1).reshape(2 * NP, S2)
            w = jnp.stack([w1, w2], axis=1).reshape(2 * NP, S2)
            pos = jnp.arange(2 * NP, dtype=jnp.int32)[:, None]
            key2 = jnp.where(e, pos, jnp.int32(1 << 30))
            _, wc = lax.sort(
                (key2.T, lax.bitcast_convert_type(w, jnp.int32).T),
                dimension=1, is_stable=False, num_keys=1)
            nwords = jnp.sum(e, axis=0).astype(jnp.int32)
            return wc, nwords, flush

        _ANSENC_PACKED = ansenc
    return _ANSENC_PACKED


def _finalize_ans_lane(words_row: np.ndarray, n: int, flush4) -> bytes:
    """v3 lane bytes: reversed (emitted words + flush), little-endian,
    plus the shared parity tail (coder/ans.ANSWriter.finish)."""
    from ..coder.ans import ANS_PARITY_TAIL
    ws = np.concatenate([words_row[:n].astype(np.uint32),
                         np.asarray(flush4, np.uint32)])
    return ws[::-1].astype("<u4").tobytes() + ANS_PARITY_TAIL


def _finalize_stream(row: np.ndarray, mask_row: np.ndarray, n: int) -> bytes:
    """Carry resolution + stop-byte rule for one lane (the host tail of
    vpx_stop_encode; carries are rare and ripple backward)."""
    bs = bytearray(row[:n].tobytes())
    if mask_row is not None and n:
        words = mask_row[: (n + 31) // 32]
        if words.any():
            bits = np.unpackbits(
                words.astype('<u4').view(np.uint8), bitorder="little")
            for i in np.nonzero(bits[:n])[0]:
                j = int(i) - 1
                while j >= 0 and bs[j] == 0xFF:
                    bs[j] = 0
                    j -= 1
                assert j >= 0, "carry out of stream start"
                bs[j] += 1
    if len(bs) and (bs[-1] & 0xE0) == 0xC0:
        bs.append(0)
    return bytes(bs)


def encode_images_device(images, window: int = 32, version: int = 1,
                         template=None):
    """Batch encode MANY images on one chip (drop-in contract of
    encode_pipeline.encode_images_device: returns per-image lists of
    per-segment stream bytes, byte-identical to the host coder).

    images: list of dicts with keys planes, color_tables, mcuv,
    max_coded_heights, component_sizes, splits_y, color_index(optional).
    version: 1/2 -> VPX bool-coder streams (identical bytes; the version
    only selects the container header compression), 3 -> rANS streams
    (no marker/stop framing, adv model update, reverse serialization --
    ans_bool_writer.hh:21-110).
    template: optional packed uint32 [ARENA_SIZE] trained-model start
    state (LEPTON_COMPRESSION_MODEL, model.cc:407-421) applied to every
    lane's model recurrence.
    """
    import jax
    import jax.numpy as jnp

    from .vpx_scan import FIXED_PROB, PAD

    LAST_PROFILE.clear()
    t = [time.time()]
    tpl_dev = jax.device_put(jnp.asarray(template, jnp.uint32)) \
        if template is not None else None

    # ---- host geometry: plans, groups by (shape, quant, ci) ----
    groups = {}
    img_plans = [None] * len(images)
    img_rowoffs = [None] * len(images)      # element offsets (x128)
    img_rowraw = [None] * len(images)       # actual symbol counts
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
        img_rowraw[d] = [None] * ncomp
    _mark("host-geometry", t, "host_prep")

    # ---- waves: transfer + fused symbolize/sort, ONE counts fetch per
    # wave, then per-part row-sort + tile-gather packing (frees the
    # slab) ----
    SLAB_BYTES_PER_BLOCK = BLOCK_SLOTS * 4
    # bigger waves = fewer counts-fetch round trips (each costs a full
    # tunnel RTT, 20ms..1.1s depending on the relay's phase)
    WAVE_LIMIT = int(os.environ.get("LEPTON_TPU_WAVE_BYTES", 6 << 30))
    # per-dispatch slab cap (sort scratch); bigger chunks amortize
    # dispatch overhead, smaller ones bound HBM during the block sort
    CHUNK_LIMIT = int(os.environ.get("LEPTON_TPU_CHUNK_BYTES", 1 << 30))

    packed_parts = []              # device [n_tiles, 128] int32 parts
    base = 0                       # elements
    pending = []                   # (part, c, H, slab, rc_raw, bcm, gcm)
    wave_bytes = 0

    def drain_wave():
        nonlocal base, wave_bytes
        if not pending:
            return
        _sync(pending[-1][3], "symbolize", t)
        allc = jnp.concatenate(
            [jnp.concatenate([p[4].reshape(-1), p[5].reshape(1),
                              p[6].reshape(1)])
             for p in pending])
        allc_host = np.asarray(allc)
        _acct("d2h_bytes", allc_host.nbytes)
        _mark(f"counts-fetch x{len(pending)}", t, "counts_fetch")
        off = 0
        for part, c, H, slab, _, _2, _3 in pending:
            n = len(part) * H
            rc_raw = allc_host[off:off + n].reshape(len(part), H)
            bcmax = int(allc_host[off + n])
            gcmax = int(allc_host[off + n + 1])
            off += n + 2
            rc_pad = (rc_raw + TILE - 1) & ~(TILE - 1)
            K = min(_bucket(max(bcmax, 1), TILE),
                    _bucket(BLOCK_SLOTS, TILE))
            K2 = min(_bucket(max(gcmax, 1), TILE), GROUP_B * K)
            total = int(rc_pad.sum())
            size = _bucket(max(total, TILE))
            packed_parts.append(_rowpack_jit()(
                slab, jnp.asarray(rc_pad.reshape(-1)), K, K2, size))
            flat_off = np.zeros(len(part) * H + 1, np.int64)
            flat_off[1:] = np.cumsum(rc_pad.reshape(-1))
            for g, d in enumerate(part):
                img_rowoffs[d][c] = base + flat_off[g * H:g * H + H + 1]
                img_rowraw[d][c] = rc_raw[g]
            base += size
        pending.clear()
        wave_bytes = 0
        _mark("rowpack", t, "compact_dispatch")
        _sync(packed_parts[-1], "rowpack", t)

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
            slab_per = H * W * SLAB_BYTES_PER_BLOCK
            chunk = max(1, CHUNK_LIMIT // max(slab_per, 1))
            for lo in range(0, len(members), chunk):
                part = members[lo:lo + chunk]
                coefs = np.stack([np.asarray(images[d]["planes"][c])
                                  for d in part])
                dc = np.ascontiguousarray(coefs[..., 0])
                ac = coefs[..., 1:]
                ac8 = np.clip(ac, -128, 127).astype(np.int8)
                esc = np.flatnonzero((ac > 127) | (ac < -128))
                K = _bucket(len(esc) + 1, 1 << 12)
                esc_pos = np.zeros(K, np.int32)
                esc_val = np.zeros(K, np.int16)
                if len(esc):
                    esc_pos[:len(esc)] = esc
                    esc_val[:len(esc)] = ac.reshape(-1)[esc]
                    esc_pos[len(esc):] = esc[0]      # idempotent pads
                    esc_val[len(esc):] = esc_val[0]
                else:
                    esc_val[:] = int(ac8.reshape(-1)[0])
                rha = np.ones((len(part), H), dtype=bool)
                csv = np.zeros(len(part), np.int32)
                for g, d in enumerate(part):
                    tops = segment_top_rows(img_plans[d], ncomp)
                    rha[g, 0] = False
                    for y in tops[c]:
                        rha[g, y] = False
                    csv[g] = images[d]["component_sizes"][c]
                _mark(f"host-prep c{c}", t, "host_prep")
                args_dev = [jax.device_put(a)
                            for a in (dc, ac8, esc_pos, esc_val)]
                _acct("h2d_bytes", dc.nbytes + ac8.nbytes
                      + esc_pos.nbytes + esc_val.nbytes)
                slab, rcr, bcm, gcm = _sym_sorted_jit(ci)(
                    *args_dev, quant, icx, icy, mnt,
                    jnp.asarray(rha), jnp.asarray(csv))
                pending.append((part, c, H, slab, rcr, bcm, gcm))
                wave_bytes += len(part) * slab_per
                _mark(f"dispatch c{c} x{len(part)}", t, "h2d_dispatch")
                if wave_bytes >= WAVE_LIMIT:
                    drain_wave()
    drain_wave()

    # frame tiles: [marker+pads], [32 stop bits+pads], [all pads]
    frame = np.full((3, TILE), PAD * 2, np.int32)
    frame[0, 0] = FIXED_PROB * 2
    frame[1, :32] = FIXED_PROB * 2
    marker_tile = base // TILE
    stop_tile = marker_tile + 1
    padrow_tile = marker_tile + 2
    rows2d = jnp.concatenate(list(packed_parts) + [jnp.asarray(frame)])
    del packed_parts

    # ---- lane run tables at tile granularity ----
    framed = version != 3          # rANS lanes carry no marker/stop bits
    lane_tiles = []                # per lane: list of (src_tile0, ntiles)
    lane_total = []                # elements (128-aligned)
    lane_raw = []                  # actual symbols
    lane_owner = []
    for d, (im, plans) in enumerate(zip(images, img_plans)):
        for si, plan in enumerate(plans):
            runs = [(marker_tile, 1)] if framed else []
            total = TILE if framed else 0
            raw = 1 if framed else 0
            for comp, y in plan:
                ro = img_rowoffs[d][comp]
                t0 = int(ro[y]) // TILE
                nt = int(ro[y + 1] - ro[y]) // TILE
                if nt:
                    runs.append((t0, nt))
                    total += nt * TILE
                raw += int(img_rowraw[d][comp][y])
            if framed:
                runs.append((stop_tile, 1))
                total += TILE
                raw += 32
            lane_tiles.append(runs)
            lane_total.append(total)
            lane_raw.append(raw)
            lane_owner.append((d, si))
    S_all = len(lane_tiles)
    _mark("run-plan", t, "run_plan")

    # ---- pools: minimum-padded-volume partition of length-sorted
    # lanes (exact DP at 8-lane granularity; the r4/r5-greedy versions
    # left 1.7-1.9x padding on heterogeneous corpora because every tiny
    # pool rounded up to 32 lanes).  Small pools bucket Lmax to powers
    # of two so serving waves (arbitrary request mixes) reuse a handful
    # of compiled shapes instead of compiling per wave composition. ----
    POOL_CAP = _pool_elems()
    SPB = 8
    # Each pool is a separate scan sequence (fixed latency ~ its Lmax),
    # a separate output fetch (one tunnel RTT -- measured 20ms..1.1s
    # depending on the relay's phase), and possibly a compile.  Charge
    # every pool ~POOL_LANE_TAX virtual lanes so the DP only splits
    # when the padding saved outweighs a real per-pool cost; measured
    # on the knee wave, ~9 near-equal pools ran 2x slower than 2.
    POOL_LANE_TAX = int(os.environ.get("LEPTON_TPU_POOL_TAX", 256))
    POOL_RTT_FIX = 8 << 20         # the per-pool output-fetch round trip

    def _lmax_bucket(m, lanes):
        if lanes <= 64:
            return 1 << max(13, (max(m, 1) - 1).bit_length())
        return _bucket(m, LEN_BUCKET)

    order = sorted(range(S_all), key=lambda i: -lane_total[i])
    n = len(order)
    bounds = list(range(0, n, SPB)) + ([n] if n else [])
    INF = float("inf")
    dp = {0: (0, None)}
    for i in bounds[1:]:
        best = (INF, None)
        for j in bounds:
            if j >= i:
                break
            cnt = i - j
            if cnt > 2048:
                continue
            sp = (cnt + SPB - 1) // SPB * SPB
            lb = _lmax_bucket(lane_total[order[j]], sp)
            if sp * lb > POOL_CAP and cnt > SPB:
                continue
            c = dp[j][0] + (sp + POOL_LANE_TAX) * lb + POOL_RTT_FIX
            if c < best[0]:
                best = (c, j)
        dp[i] = best
    merged = []
    i = bounds[-1] if bounds else 0
    while i:
        j = dp[i][1]
        merged.append(order[j:i])
        i = j
    merged.reverse()
    _acct("symbols", sum(lane_raw))
    _acct("lanes", S_all)

    fetches = []
    for members in merged:
        Sp = (len(members) + SPB - 1) // SPB * SPB
        Lmax = _lmax_bucket(max(lane_total[i] for i in members), Sp)
        _acct("padded_symbols", Sp * Lmax)
        Tn = Lmax // TILE
        src_rows = np.full((Sp, Tn), padrow_tile, np.int32)
        totals_raw = np.zeros(Sp, np.int32)
        for s_i, lane in enumerate(members):
            pos = 0
            row = src_rows[s_i]
            for t0, nt in lane_tiles[lane]:
                row[pos:pos + nt] = np.arange(t0, t0 + nt, dtype=np.int32)
                pos += nt
            totals_raw[s_i] = lane_raw[lane]
        for s_i in range(len(members), Sp):    # dummy lanes: marker+stop
            if framed:
                src_rows[s_i, 0] = marker_tile
                src_rows[s_i, 1] = stop_tile
        _mark(f"pool-prep S={Sp} Tn={Tn}", t, "host_prep")
        pk = _assemble_rows_jit()(rows2d, jnp.asarray(src_rows))
        _acct("h2d_bytes", src_rows.nbytes)
        _sync(pk, "assemble", t)
        if version == 3:
            words, nwords, flush = _ansenc_packed_jit()(
                pk, jnp.asarray(totals_raw), window, template=tpl_dev)
            _sync(words, "twopass", t)
            fetches.append(("ans", members, words, flush, nwords, None))
        else:
            outcap = _bucket(
                Lmax // int(os.environ.get("LEPTON_TPU_OUTCAP_DIV", 8)),
                1 << 12)
            bytes_u8, mask, nbytes, nbmax = _twopass_fused_jit()(
                pk, window, outcap, template=tpl_dev)
            _sync(bytes_u8, "twopass", t)
            fetches.append(("vpx", members, bytes_u8, mask, nbytes,
                            (nbmax, outcap, pk)))
        _mark(f"pool S={Sp} Lmax={Lmax} x{len(members)} dispatched", t,
              "pool_dispatch")

    # ---- fetch: ONE stacked max-nbytes fetch for all pools, then the
    # sliced payloads (no per-pool nbytes sync -- VERDICT r4 item 3) ----
    vpx_pools = [f for f in fetches if f[0] == "vpx"]
    nbmaxes = {}
    if vpx_pools:
        stacked = np.asarray(jnp.stack([f[5][0] for f in vpx_pools]))
        _acct("d2h_bytes", stacked.nbytes)
        for f, v in zip(vpx_pools, stacked):
            nbmaxes[id(f)] = int(v)
        _mark("nbmax-fetch", t, "nbmax_fetch")
    results = {}
    for f in fetches:
        kind, members, payload, aux, nbv, extra = f
        n_live = len(members)
        if kind == "ans":
            nb = np.asarray(nbv)
            maxw = min(_bucket(int(nb[:n_live].max()) + 1, 1 << 12),
                       payload.shape[1])
            wh = np.asarray(payload[:n_live, :maxw])
            fl = [np.asarray(x[:n_live]) for x in aux]   # h1, l1, h2, l2
            _acct("d2h_bytes", wh.nbytes + 16 * n_live + nb.nbytes)
            _mark(f"output-fetch {n_live}x{maxw}w", t, "output_fetch")
            for s_i, lane in enumerate(members):
                results[lane] = _finalize_ans_lane(
                    wh[s_i], int(nb[s_i]),
                    (fl[0][s_i], fl[1][s_i], fl[2][s_i], fl[3][s_i]))
            continue
        nbmax, outcap, pk = extra
        nbmax = nbmaxes[id(f)]
        if nbmax > outcap:
            # OUTCAP overflow (adversarial stream): unfused fallback
            emit, byte, carry, _ = _twopass_packed_jit()(
                pk, window, template=tpl_dev)
            payload, aux, nbv = _pack_out_jit()(emit, byte, carry)
            _mark("outcap-fallback", t, "outcap_fallback")
        maxb = min(_bucket(nbmax + 1, 1 << 12), payload.shape[1])
        bh = np.asarray(payload[:n_live, :maxb])
        mh = np.asarray(aux[:n_live, :maxb // 32])
        nb = np.asarray(nbv)
        _acct("d2h_bytes", bh.nbytes + mh.nbytes + nb.nbytes)
        _mark(f"output-fetch {n_live}x{maxb}", t, "output_fetch")
        for s_i, lane in enumerate(members):
            results[lane] = _finalize_stream(bh[s_i], mh[s_i],
                                             int(nb[s_i]))
    out = [[] for _ in images]
    for lane in range(S_all):
        d, si = lane_owner[lane]
        out[d].append(results[lane])
    _mark("host-finalize", t, "host_finalize")
    return out
