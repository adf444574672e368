"""Batch TPU encode v2: the corpus-throughput pipeline.

Round-4 redesign of kernels/encode_pipeline.encode_images_device driven by
measured tunnel/device costs (the r3 path spent ~36s of its 43.5s warm
corpus run inside the flat cumsum+scatter compaction and bandwidth-naive
transfers):

  - Coefficient planes ship RAW int16 (the transport compresses sparse
    data ~13x: 158 MB/s effective vs 12 MB/s for incompressible bytes;
    host-side nibble packing measured a net LOSS -- 0.65s CPU to save
    0.2s of wire).
  - Compaction is a per-block bitonic sort (unstable, position key) of
    the packed (branch<<1|bit) slab -- 9x faster than the flat scatter
    (0.19s vs 4.7s per 250k blocks measured on the v5e) -- followed by a
    run-offset flatten whose run structure (one run per BLOCK) is built
    entirely on device from the sorted slab's own valid counts.
  - Symbolize + pack + sort + row counts fuse into ONE jit per plane
    geometry, so each wave costs one host->device transfer and one tiny
    counts fetch.
  - Coder lanes are length-sorted and pooled 64 wide (a lane is one
    image-segment, the role of the reference's per-thread streams,
    vp8_encoder.cc:461-519), so phase-B padding stays small while the
    VPU sees full lanes.
  - Output returns as uint8 bytes + a packed carry bitmask per pool
    (9/16 the bytes of the r3 uint16 fetch), and every stage's bytes
    moved are accounted in LAST_PROFILE for the PCIe projection.

Stream bytes are bit-identical to the host encoder's (the mux-gather
contract of vp8_encoder.cc:576-594 is applied by the caller).
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

# lane pools: width (lanes per phase-B invocation) and length bucket
POOL_LANES = 64
LEN_BUCKET = 1 << 14


def _mark(label, t, key=None):
    now = time.time()
    LAST_PROFILE[key or label] = LAST_PROFILE.get(key or label, 0.0) \
        + (now - t[0])
    if os.environ.get("LEPTON_TPU_PROFILE") in ("1", "2"):
        print(f"  [tpu-batch2] {label}: {now - t[0]:.2f}s",
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


@lru_cache(maxsize=64)
def _sym_sorted_jit(ci, icx, icy, mnt):
    """One fused jit per color-table constellation: vmapped symbolize ->
    (branch<<1|bit) packing -> per-block compaction sort -> row counts.

    Returns (slab_sorted int32 [G, H, W, BLOCK_SLOTS] with each block's
    valid symbols as a prefix, row_counts int32 [G, H])."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from .symbolize import symbolize_slice
    from .vpx_scan import PAD

    def one(cf, quant, ra, cl):
        idx, bit = symbolize_slice(cf, ci, quant, icx, icy, mnt,
                                   jnp.int32(0), cl, ra)
        return idx, bit

    def f(coefs, quant, rha, csv):
        idx, bit = jax.vmap(one, in_axes=(0, None, 0, 0))(
            coefs, quant, rha, csv)
        packed = (idx << 1) | bit.astype(jnp.int32)       # PAD -> -2/-1
        valid = idx != PAD
        row_counts = jnp.sum(valid, axis=(2, 3)).astype(jnp.int32)
        # dead slots sort to the end; live slots keep emission order via
        # the position key (unstable sort: the key is already unique)
        pos = jnp.arange(packed.shape[-1], dtype=jnp.int32)
        key = jnp.where(valid, pos, jnp.int32(1 << 30))
        _, slab = lax.sort((key, packed), dimension=3,
                           is_stable=False, num_keys=1)
        return slab, row_counts

    return jax.jit(f)


_FLATTEN = None


def _flatten_jit():
    """Flatten a block-prefix-dense sorted slab into a contiguous packed
    symbol stream.  The run structure (one run per block) is derived on
    device from the slab's own valid counts: no per-block host traffic."""
    global _FLATTEN
    if _FLATTEN is None:
        import jax
        import jax.numpy as jnp

        @partial(jax.jit, static_argnames=("out_size",))
        def flatten(slab_sorted, out_size):
            S = slab_sorted.shape[-1]
            flat = slab_sorted.reshape(-1)
            bc = jnp.sum((slab_sorted >= 0).reshape(-1, S),
                         axis=1).astype(jnp.int32)        # per block
            run_dst = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jnp.cumsum(bc)[:-1]])
            run_off = jnp.arange(bc.shape[0], dtype=jnp.int32) * S - run_dst
            prev = jnp.concatenate([jnp.zeros(1, jnp.int32), run_off[:-1]])
            deltas = jnp.zeros((out_size,), jnp.int32)
            deltas = deltas.at[run_dst].add(run_off - prev)
            offs = jnp.cumsum(deltas)
            src = jnp.arange(out_size, dtype=jnp.int32) + offs
            src = jnp.clip(src, 0, flat.shape[0] - 1)
            return flat[src]

        _FLATTEN = flatten
    return _FLATTEN


_ASSEMBLE_PACKED = None


def _assemble_packed_jit():
    """Run-offset stream assembly returning ONE packed int32 [S, Lmax]
    array (branch<<1|bit; tail slots PAD) -- half the HBM writes of the
    (idx, bit) pair the shared _assemble_jit materializes."""
    global _ASSEMBLE_PACKED
    if _ASSEMBLE_PACKED is None:
        import jax
        import jax.numpy as jnp
        from .vpx_scan import PAD

        @partial(jax.jit, static_argnames=("Lmax",))
        def assemble(packed, run_dst, run_off, run_valid, seg_total, Lmax):
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
            return jnp.where(live, packed[src], PAD * 2)

        _ASSEMBLE_PACKED = assemble
    return _ASSEMBLE_PACKED


_TWOPASS_PACKED = None


def _twopass_packed_jit():
    """model_probs_sorted + arith_pass over the packed stream in ONE jit:
    branch/bit unpack fuses into the sort and scan inputs instead of
    materializing separate [S, L] idx/bit arrays."""
    global _TWOPASS_PACKED
    if _TWOPASS_PACKED is None:
        import jax
        import jax.numpy as jnp
        from . import vpx_scan

        @partial(jax.jit, static_argnames=("window",))
        def twopass(packed, window, template=None):
            idxs = packed >> 1          # arithmetic: PAD*2 -> PAD
            bits = (packed & 1).astype(jnp.uint8)
            probs = vpx_scan.model_probs_sorted(idxs, bits, window,
                                                template=template)
            return vpx_scan.arith_pass(idxs, bits, probs, window)

        _TWOPASS_PACKED = twopass
    return _TWOPASS_PACKED


_ANSENC_PACKED = None


def _ansenc_packed_jit():
    """v3 phase-B over the packed stream in ONE jit: sorted-branch model
    pass with the adv update rule (branch.hh:66-80) + the reverse rANS
    register chain (rans64.hh, ans_bool_writer.hh:21-110) + emitted-word
    compaction.  Returns (words int32 [S, 2*padNP] compacted in emission
    order, nwords [S], flush (h1, l1, h2, l2))."""
    global _ANSENC_PACKED
    if _ANSENC_PACKED is None:
        import jax
        import jax.numpy as jnp
        from jax import lax
        from . import vpx_scan

        @partial(jax.jit, static_argnames=("window",))
        def ansenc(packed, nsyms, window, template=None):
            idxs = packed >> 1
            bits = (packed & 1).astype(jnp.uint8)
            probs = vpx_scan.model_probs_sorted(idxs, bits, window,
                                                update="adv",
                                                template=template)
            ys, flush, padNP = vpx_scan.ans_pass(probs, bits, nsyms,
                                                 window)
            e1, w1, e2, w2 = ys                     # [padNP, S]
            NP, S = e1.shape
            # serial emission order: pair t ascending, s1's word then s2's
            # (ANSWriter.finish, mirrored by finalize_ans_streams)
            e = jnp.stack([e1, e2], axis=1).reshape(2 * NP, S)
            w = jnp.stack([w1, w2], axis=1).reshape(2 * NP, S)
            pos = jnp.arange(2 * NP, dtype=jnp.int32)[:, None]
            key = jnp.where(e, pos, jnp.int32(1 << 30))
            _, wc = lax.sort(
                (key.T, lax.bitcast_convert_type(w, jnp.int32).T),
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


_PACK_OUT = None


def _pack_out_jit():
    """Compact phase-B output to (bytes uint8 [S,L], carry bitmask uint32
    [S, L/32], nbytes [S]): one 2-operand unstable sort (emitted-first by
    position), 9/16 the fetch bytes of the r3 uint16 path."""
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
            cw = cbit.reshape(S, L // 32, 32)
            mask = jnp.sum(cw << jnp.arange(32, dtype=jnp.uint32),
                           axis=2, dtype=jnp.uint32)
            nbytes = jnp.sum(emit, axis=0).astype(jnp.int32)
            return bytes_u8, mask, nbytes

        _PACK_OUT = pack
    return _PACK_OUT


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

    from . import vpx_scan
    from .vpx_scan import FIXED_PROB

    LAST_PROFILE.clear()
    t = [time.time()]
    tpl_dev = jax.device_put(jnp.asarray(template, jnp.uint32)) \
        if template is not None else None

    # ---- host geometry: plans, groups by (shape, quant, ci) ----
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
    _mark("host-geometry", t, "host_prep")

    # ---- waves: transfer + fused symbolize/sort, ONE counts fetch per
    # wave, then per-part flatten (frees the slab) ----
    SLAB_BYTES_PER_BLOCK = BLOCK_SLOTS * 4
    WAVE_LIMIT = int(os.environ.get("LEPTON_TPU_WAVE_BYTES", 3 << 30))
    CHUNK_LIMIT = 1 << 30          # per-dispatch slab cap (sort scratch)

    packed_parts = []              # (device flat i32, padded size)
    base = 0
    pending = []                   # (part, c, H, slab, row_counts)
    wave_bytes = 0

    def drain_wave():
        nonlocal base, wave_bytes
        if not pending:
            return
        allc = jnp.concatenate([p[4].reshape(-1) for p in pending])
        allc_host = np.asarray(allc)
        _acct("d2h_bytes", allc_host.nbytes)
        _mark(f"counts-fetch x{len(pending)}", t, "counts_fetch")
        off = 0
        for part, c, H, slab, _ in pending:
            n = len(part) * H
            counts = allc_host[off:off + n].reshape(len(part), H)
            off += n
            total = int(counts.sum())
            size = _bucket(max(total, 1))
            packed_parts.append(_flatten_jit()(slab, size))
            flat_off = np.zeros(len(part) * H + 1, np.int64)
            flat_off[1:] = np.cumsum(counts.reshape(-1))
            for g, d in enumerate(part):
                img_rowoffs[d][c] = base + flat_off[g * H:g * H + H + 1]
            base += size
        pending.clear()
        wave_bytes = 0
        _mark("flatten", t, "compact_dispatch")
        _sync(packed_parts[-1], "flatten", t)

    for key, members in groups.items():
        ncomp = len(key)
        for c in range(ncomp):
            ct = images[members[0]]["color_tables"][c]
            ci = key[c][2]
            H, W = key[c][0][0], key[c][0][1]
            icx = tuple(int(v) for v in ct.icos_idct_edge_8192_dequantized_x)
            icy = tuple(int(v) for v in ct.icos_idct_edge_8192_dequantized_y)
            mnt = tuple(int(v) for v in ct.min_noise_threshold)
            quant = jnp.asarray(ct.quant, dtype=jnp.int32)
            slab_per = H * W * SLAB_BYTES_PER_BLOCK
            chunk = max(1, CHUNK_LIMIT // max(slab_per, 1))
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
                _mark(f"host-prep c{c}", t, "host_prep")
                coefs_dev = jax.device_put(coefs)
                _acct("h2d_bytes", coefs.nbytes)
                slab, rc = _sym_sorted_jit(ci, icx, icy, mnt)(
                    coefs_dev, quant, jnp.asarray(rha), jnp.asarray(csv))
                pending.append((part, c, H, slab, rc))
                wave_bytes += len(part) * slab_per
                _mark(f"dispatch c{c} x{len(part)}", t, "h2d_dispatch")
                if wave_bytes >= WAVE_LIMIT:
                    drain_wave()
    drain_wave()

    frame = jnp.full((64,), FIXED_PROB * 2, jnp.int32)
    packed = jnp.concatenate(list(packed_parts) + [frame])
    frame_base = base
    del packed_parts

    # ---- lane runs (row granularity; host geometry + fetched counts) ----
    framed = version != 3          # rANS lanes carry no marker/stop bits
    lane_runs = []
    lane_total = []
    lane_owner = []
    for d, (im, plans) in enumerate(zip(images, img_plans)):
        for si, plan in enumerate(plans):
            runs = [(0, frame_base, 1)] if framed else []  # marker bit
            dst = 1 if framed else 0
            for comp, y in plan:
                ro = img_rowoffs[d][comp]
                src0 = int(ro[y])
                ln = int(ro[y + 1] - ro[y])
                if ln:
                    runs.append((dst, src0, ln))
                    dst += ln
            if framed:
                runs.append((dst, frame_base, 32))         # stop bits
                dst += 32
            lane_runs.append(runs)
            lane_total.append(dst)
            lane_owner.append((d, si))
    S_all = len(lane_runs)
    _mark("run-plan", t, "run_plan")

    # ---- pools: length-sorted lanes, POOL_LANES wide ----
    order = sorted(range(S_all), key=lambda i: -lane_total[i])
    fetches = []
    # greedy length-adaptive pools: a pool breaks when the next (shorter)
    # lane would waste >45% of the pool's padded length or the pool hits
    # the lane-scaling knee (~2048 lanes); lane counts bucket to 32 so
    # the jit shape set stays small.  Minimizes padded Sp*Lmax volume,
    # which assemble/phase-B/pack all pay linearly.
    pools = []
    cur = []
    for i in order:
        if not cur:
            cur = [i]
        elif len(cur) >= 2048 or \
                lane_total[i] < 0.55 * lane_total[cur[0]]:
            pools.append(cur)
            cur = [i]
        else:
            cur.append(i)
    if cur:
        pools.append(cur)
    # merge tiny trailing pools forward: a 32-lane dispatch costs as much
    # as a 64-lane one and tiny lanes barely add padded volume
    merged = []
    for m in pools:
        if merged and len(merged[-1]) + len(m) <= 2048 and \
                lane_total[m[0]] * len(m) < 0.1 * lane_total[merged[-1][0]] \
                * len(merged[-1]):
            merged[-1].extend(m)
        else:
            merged.append(m)
    _acct("symbols", sum(lane_total))
    _acct("lanes", S_all)
    for members in merged:
        Sp = (len(members) + 31) // 32 * 32
        Lmax = _bucket(max(lane_total[i] for i in members), LEN_BUCKET)
        _acct("padded_symbols", Sp * Lmax)
        Rmax = max(64, (max(len(lane_runs[i]) for i in members) + 63) // 64 * 64)
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
        for s_i in range(len(members), Sp):    # dummy lanes: marker+stop
            if not framed:
                totals[s_i] = 0                # v3 dummies stay empty
                continue
            run_dst[s_i, 0] = 0
            run_off[s_i, 0] = frame_base
            run_valid[s_i, 0] = True
            run_dst[s_i, 1] = 1
            run_off[s_i, 1] = frame_base - 1
            run_valid[s_i, 1] = True
            totals[s_i] = 33
        pk = _assemble_packed_jit()(packed, jnp.asarray(run_dst),
                                    jnp.asarray(run_off),
                                    jnp.asarray(run_valid),
                                    jnp.asarray(totals), Lmax)
        _sync(pk, "assemble", t)
        if version == 3:
            words, nwords, flush = _ansenc_packed_jit()(
                pk, jnp.asarray(totals.astype(np.int32)), window,
                template=tpl_dev)
            _sync(words, "twopass", t)
            fetches.append((members, words, flush, nwords))
        else:
            emit, byte, carry, _ = _twopass_packed_jit()(pk, window,
                                                         template=tpl_dev)
            _sync(byte, "twopass", t)
            bytes_u8, mask, nbytes = _pack_out_jit()(emit, byte, carry)
            _sync(mask, "pack", t)
            fetches.append((members, bytes_u8, mask, nbytes))
        _mark(f"pool S={Sp} Lmax={Lmax} x{len(members)} dispatched", t,
              "pool_dispatch")

    # ---- two fetch points: all nbytes, then per-pool sliced outputs ----
    all_nb = np.asarray(jnp.concatenate(
        [nb for _, _, _, nb in fetches])) if fetches else np.zeros(0)
    _acct("d2h_bytes", all_nb.nbytes)
    _mark("nbytes-fetch", t, "nbytes_fetch")
    results = {}
    nb_off = 0
    for members, payload, aux, _ in fetches:
        nb = all_nb[nb_off:nb_off + payload.shape[0]]
        nb_off += payload.shape[0]
        n_live = len(members)
        maxb = _bucket(int(nb[:n_live].max()) + 1, 1 << 12)
        maxb = min(maxb, payload.shape[1])
        if version == 3:
            wh = np.asarray(payload[:n_live, :maxb])
            fl = [np.asarray(f[:n_live]) for f in aux]   # h1, l1, h2, l2
            _acct("d2h_bytes", wh.nbytes + 16 * n_live)
            _mark(f"output-fetch {n_live}x{maxb}w", t, "output_fetch")
            for s_i, lane in enumerate(members):
                results[lane] = _finalize_ans_lane(
                    wh[s_i], int(nb[s_i]),
                    (fl[0][s_i], fl[1][s_i], fl[2][s_i], fl[3][s_i]))
        else:
            bh = np.asarray(payload[:n_live, :maxb])
            mh = np.asarray(aux[:n_live, :maxb // 32])
            _acct("d2h_bytes", bh.nbytes + mh.nbytes)
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
