"""TPU decode kernel: batched per-segment VPX token decoding as a scan.

The missing half of the TPU-native codec: decoding has a serial
bit->symbol feedback (the branch index of every read depends on
previously decoded bits), so it cannot be phase-split like encode.  The
TPU structure (SURVEY.md section 7 pillar 1): lanes = independent
thread-segments, a lax.scan walks one 8x8 block per lane per step, and
the per-block token parse (reference src/vp8/decoder/decoder.cc:168-319,
decode_one_edge :29-142) runs as predicated lockstep reads -- inactive
lanes and terminated unary loops read nothing (reader and model state
advance only under the active mask).

Reader: vpx_read with a 32-bit window (boolreader.hh:376-416 uses 64; the
window size only changes refill cadence, not the decoded bits -- proven
bit-exact against coder/vpx.BoolReader in tests).

State per lane: bool-reader registers, a full model arena
[lanes, ARENA_SIZE, 3] (per-thread model copies, lepton_codec.hh:173-181),
plus image-global coefficient and neighbor-summary stores addressed by
flat padded indices (all lanes decode disjoint rows, so scatters never
collide).  Corrupt streams set a sticky per-lane error flag
(STREAM_INCONSISTENT, decoder.cc:183-185) instead of trapping.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .. import constants as C
from ..model.tables import ARENA_SIZE, TABLE_OFFSETS, TABLE_STRIDES
from .vpx_scan import _lut

_OFF = {k: int(v) for k, v in TABLE_OFFSETS.items()}
_STR = {k: tuple(int(s) for s in v) for k, v in TABLE_STRIDES.items()}
_UNZIG49_NP = np.asarray([int(v) for v in C.UNZIGZAG49], dtype=np.int32)
_NZ_BIN_NP = np.asarray([int(v) for v in C.NONZERO_TO_BIN], dtype=np.int32)
_VPX_NORM_NP = np.asarray(C.VPX_NORM, dtype=np.int32)
_MAXE = C.MAX_EXPONENT
LOTS_OF_BITS = 0x40000000


# ---------------------------------------------------------------------------
# Packed per-lane state buffer
#
# XLA's in-place analysis for while-loop carries fails whenever a value
# derived from a PRE-update gather of a carried buffer stays live past the
# update: the whole buffer is copied every iteration (measured 350us per
# read on the 2.2MB arena).  The fix is a single uint32 state buffer per
# lane holding the packed model arena AND the bool-reader registers AND
# the last read bit: every read performs one gather + one 6-slot scatter,
# and all downstream consumers re-gather the bit from the POST-update
# buffer, so the old version dies inside each loop iteration and XLA
# updates in place (measured ~1-2us per read).
#
# Slot layout (uint32 [S, NSLOT]):
#   [0 : ARENA_SIZE)  packed branches: c0<<16 | c1<<8 | prob
#   +0..3             reader value / range / count(bitcast) / pos
#   +4                REG_BIT: the last read's bit
#   +5                FIXED128: a (0,0,128) branch for marker bits
#   +6                ERR: sticky stream-inconsistency flag
# ---------------------------------------------------------------------------

R_VALUE = ARENA_SIZE
R_RANGE = ARENA_SIZE + 1
R_COUNT = ARENA_SIZE + 2
R_POS = ARENA_SIZE + 3
REG_BIT = ARENA_SIZE + 4
FIXED128 = ARENA_SIZE + 5
REG_ERR = ARENA_SIZE + 6
R_AUX = ARENA_SIZE + 7     # ANS reader only: word cursor
NSLOT = ARENA_SIZE + 8

_PLUT_NP = None
_PLUT_ADV_NP = None


def _packed_lut():
    """Branch-update LUT packed to one uint32 per transition:
    index (c0<<9) | (c1<<1) | bit -> c0'<<16 | c1'<<8 | prob'."""
    global _PLUT_NP
    if _PLUT_NP is None:
        from ..model.branch import next_state_lut
        lut = next_state_lut().astype(np.uint32)        # [256,256,2,3]
        _PLUT_NP = ((lut[..., 0] << 16) | (lut[..., 1] << 8)
                    | lut[..., 2]).reshape(-1)          # [256*256*2]
    return _PLUT_NP


def _packed_lut_adv():
    """Packed transition LUT for the ANS backend's update rule
    (Branch::adv_record_obs_and_update, branch.hh:66-80)."""
    global _PLUT_ADV_NP
    if _PLUT_ADV_NP is None:
        from ..model.branch import next_state_lut_adv
        lut = next_state_lut_adv().astype(np.uint32)
        _PLUT_ADV_NP = ((lut[..., 0] << 16) | (lut[..., 1] << 8)
                        | lut[..., 2]).reshape(-1)
    return _PLUT_ADV_NP


def state_init(num_lanes: int, template=None):
    """Fresh per-lane state: identity arena (1,1,128), reader registers
    at vpx_reader_init values.
    template: optional packed uint32 [ARENA_SIZE] trained-model start
    state (c0<<16 | c1<<8 | prob, load-normalized counts -- the
    LEPTON_COMPRESSION_MODEL hook, model.cc:407-421) broadcast as every
    lane's initial arena."""
    if template is not None:
        arena = jnp.broadcast_to(
            jnp.asarray(template, jnp.uint32)[None, :],
            (num_lanes, template.shape[0]))
        regs = jnp.full((num_lanes, NSLOT - ARENA_SIZE),
                        np.uint32(0x010180), dtype=jnp.uint32)
        buf = jnp.concatenate([arena, regs], axis=1)
    else:
        buf = jnp.full((num_lanes, NSLOT), np.uint32(0x010180),
                       dtype=jnp.uint32)
    buf = buf.at[:, R_VALUE].set(0)
    buf = buf.at[:, R_RANGE].set(255)
    buf = buf.at[:, R_COUNT].set(_i2u(jnp.full(num_lanes, -8, jnp.int32)))
    buf = buf.at[:, R_POS].set(0)
    buf = buf.at[:, REG_BIT].set(0)
    buf = buf.at[:, FIXED128].set(128)
    buf = buf.at[:, REG_ERR].set(0)
    buf = buf.at[:, R_AUX].set(0)
    return buf


def state_init_ans(words: jnp.ndarray, template=None):
    """Fresh per-lane state for the ANS (v3) reader: identity arena and
    the two interleaved rANS states pre-loaded from the stream head
    (ans_bool_reader.hh init: r0 = words[0] | words[1]<<32,
    r1 = words[2] | words[3]<<32, cursor at word 4).

    Register mapping over the shared slot layout:
      R_VALUE = r0_hi, R_RANGE = r0_lo, R_COUNT = r1_hi, R_POS = r1_lo,
      R_AUX = word cursor.
    words: uint32 [S, W] little-endian stream words (zero-padded)."""
    S = words.shape[0]
    buf = state_init(S, template=template)
    pad = jnp.zeros((S, 4), jnp.uint32)
    w = jnp.concatenate([words[:, :4], pad], axis=1)
    buf = buf.at[:, R_VALUE].set(w[:, 1])
    buf = buf.at[:, R_RANGE].set(w[:, 0])
    buf = buf.at[:, R_COUNT].set(w[:, 3])
    buf = buf.at[:, R_POS].set(w[:, 2])
    buf = buf.at[:, R_AUX].set(4)
    return buf


def make_read_ans(lanes, words, nwords, plut_adv):
    """Build the single-read primitive for the ANS (v3) forward reader
    (ans_bool_reader.hh get_bit over two alternating 64-bit rANS states,
    rans64.hh decode step).  Same packed-buffer contract as make_read:
    one gather, one multi-slot scatter, consumers re-gather REG_BIT from
    the post-update buffer.

    64-bit state decomposed into (hi, lo) uint32 pairs (TPUs have no
    native int64): the decode advance x' = freq*(x>>8) + cum - start
    needs only a 41-bit product, built from 16-bit limbs; renormalization
    shifts in one stream word (zero past EOF, matching the reference's
    zero fill())."""
    S = lanes.shape[0]
    reg_cols = jnp.asarray([R_VALUE, R_RANGE, R_COUNT, R_POS, R_AUX,
                            REG_BIT], dtype=jnp.int32)

    def read(buf, idx, active, adaptive=True):
        idx = jnp.clip(idx, 0, NSLOT - 1)
        branch = buf[lanes, idx]                        # u32 gather
        r0_hi = buf[:, R_VALUE]
        r0_lo = buf[:, R_RANGE]
        r1_hi = buf[:, R_COUNT]
        r1_lo = buf[:, R_POS]
        pos = _u2i(buf[:, R_AUX])

        prob = (branch & 0xFF).astype(jnp.int32)
        cum = (r0_lo & 0xFF).astype(jnp.int32)
        ge = cum >= prob
        bit = (ge & active).astype(jnp.int32)
        start = jnp.where(ge, prob, 0)
        freq = jnp.where(ge, 256 - prob, prob).astype(jnp.uint32)

        # x >> 8 on the (hi, lo) pair
        sh_lo = (r0_lo >> 8) | (r0_hi << 24)
        sh_hi = r0_hi >> 8                              # < 2^23
        # freq * (x>>8): 16-bit limbs (freq <= 256 so every term fits)
        p_ll = freq * (sh_lo & 0xFFFF)                  # < 2^25
        p_lh = freq * (sh_lo >> 16)                     # < 2^25
        p_h = freq * sh_hi                              # < 2^31
        addend = (cum - start).astype(jnp.uint32)       # 0..255
        lo1 = p_ll + addend                             # < 2^26, no wrap
        lh_shift = p_lh << 16
        nlo = lo1 + lh_shift                            # u32 wraparound
        carry = (nlo < lo1).astype(jnp.uint32)
        nhi = p_h + (p_lh >> 16) + carry

        # renormalize: x < RANS64_L pulls one stream word into the low
        # half (x'' = x<<32 | word); zero word past EOF
        renorm = active & (nhi == 0) & (nlo < jnp.uint32(1 << 31))
        word = jnp.where(pos < nwords,
                         words[lanes, jnp.clip(pos, 0, words.shape[1] - 1)],
                         0)
        x_hi = jnp.where(renorm, nlo, nhi)
        x_lo = jnp.where(renorm, word, nlo)
        npos = pos + renorm.astype(jnp.int32)

        nb = plut_adv[((branch >> 8) << 1).astype(jnp.int32)
                      | bit] if adaptive else branch
        act = active
        # alternate the pair: new r0 = old r1, new r1 = advanced x
        upd = jnp.stack([
            jnp.where(act, nb, branch) if adaptive else branch,
            jnp.where(act, r1_hi, r0_hi),
            jnp.where(act, r1_lo, r0_lo),
            jnp.where(act, x_hi, r1_hi),
            jnp.where(act, x_lo, r1_lo),
            jnp.where(act, _i2u(npos), _i2u(pos)),
            bit.astype(jnp.uint32),
        ], axis=1)                                      # [S, 7]
        cols = jnp.concatenate(
            [idx[:, None],
             jnp.broadcast_to(reg_cols[None, :], (S, 6))], axis=1)
        buf = buf.at[lanes[:, None], cols].set(upd, unique_indices=True)
        return buf, _u2i(buf[:, REG_BIT])

    return read


def _i2u(v):
    return lax.bitcast_convert_type(v, jnp.uint32)


def _u2i(v):
    return lax.bitcast_convert_type(v, jnp.int32)


def make_read(lanes, data, dlen, plut, vpx_norm):
    """Build the single-read primitive over the packed state buffer."""
    S = lanes.shape[0]
    reg_cols = jnp.asarray([R_VALUE, R_RANGE, R_COUNT, R_POS, REG_BIT],
                           dtype=jnp.int32)

    def read(buf, idx, active, adaptive=True):
        idx = jnp.clip(idx, 0, NSLOT - 1)
        branch = buf[lanes, idx]                        # u32 gather
        value = buf[:, R_VALUE]                         # u32
        rng = _u2i(buf[:, R_RANGE])
        count = _u2i(buf[:, R_COUNT])
        pos = _u2i(buf[:, R_POS])

        # vpx_reader_fill (32-bit window): load while shift >= 0; at
        # stream end add LOTS_OF_BITS once (zero-extension semantics)
        shift = jnp.where(active & (count < 0), 16 - count, -1)
        for _ in range(4):
            want = shift >= 0
            have = pos < dlen
            do = want & have
            byte = data[lanes, jnp.clip(pos, 0, data.shape[1] - 1)]
            value = jnp.where(
                do, value | (byte.astype(jnp.uint32)
                             << jnp.maximum(shift, 0).astype(jnp.uint32)),
                value)
            pos = pos + do.astype(jnp.int32)
            count = count + jnp.where(do, 8, 0)
            count = count + jnp.where(want & ~have, LOTS_OF_BITS, 0)
            shift = jnp.where(do, shift - 8, -1)

        # vpx_read (boolreader.hh:376-416)
        prob = (branch & 0xFF).astype(jnp.int32)
        split = (rng * prob + (256 - prob)) >> 8
        bigsplit = split.astype(jnp.uint32) << 24
        ge = value >= bigsplit
        bit = (ge & active).astype(jnp.int32)
        new_rng = jnp.where(ge, rng - split, split)
        new_val = jnp.where(ge, value - bigsplit, value)
        sh = vpx_norm[new_rng]
        new_rng = new_rng << sh
        new_val = new_val << sh.astype(jnp.uint32)
        new_count = count - sh

        nb = plut[((branch >> 8) << 1).astype(jnp.int32)
                  | bit] if adaptive else branch
        act = active
        upd = jnp.stack([
            jnp.where(act & True, nb, branch) if adaptive else branch,
            jnp.where(act, new_val, buf[:, R_VALUE]),
            jnp.where(act, _i2u(new_rng), buf[:, R_RANGE]),
            jnp.where(act, _i2u(new_count), buf[:, R_COUNT]),
            jnp.where(act, _i2u(pos), buf[:, R_POS]),
            bit.astype(jnp.uint32),
        ], axis=1)                                      # [S, 6]
        cols = jnp.concatenate(
            [idx[:, None],
             jnp.broadcast_to(reg_cols[None, :], (S, 5))], axis=1)
        buf = buf.at[lanes[:, None], cols].set(upd, unique_indices=True)
        # the bit every consumer sees comes from the NEW buffer version
        return buf, _u2i(buf[:, REG_BIT])

    return read


# ---------------------------------------------------------------------------
# Fixed-point IDCT on [S, 64] vectors (exact contexts._idct_planar port)
# ---------------------------------------------------------------------------
def _idct_vec(coefs, quant):
    """coefs/quant int32 [S, 64] -> int16-wrapped pixels [S, 64] int32,
    DC ignored (the DC-prediction IDCT, idct.cc scalar semantics)."""
    d = [coefs[:, k] * quant[:, k] for k in range(64)]
    d[0] = jnp.zeros_like(d[0])
    inter = [None] * 64
    for y in range(8):
        r = [d[y * 8 + i] for i in range(8)]
        x0 = (r[0] << 11) + 128
        x1 = r[4] << 11
        x2, x3, x4, x5, x6, x7 = r[6], r[2], r[1], r[7], r[5], r[3]
        x8 = C.W7 * (x4 + x5)
        x4, x5 = x8 + C.W1MW7 * x4, x8 - C.W1PW7 * x5
        x8 = C.W3 * (x6 + x7)
        x6, x7 = x8 - C.W3MW5 * x6, x8 - C.W3PW5 * x7
        x8 = x0 + x1
        x0 = x0 - x1
        x1 = C.W6 * (x3 + x2)
        x2, x3 = x1 - C.W2PW6 * x2, x1 + C.W2MW6 * x3
        x1 = x4 + x6
        x4 = x4 - x6
        x6 = x5 + x7
        x5 = x5 - x7
        x7 = x8 + x3
        x8 = x8 - x3
        x3 = x0 + x2
        x0 = x0 - x2
        x2 = (C.R2 * (x4 + x5) + 128) >> 8
        x4 = (C.R2 * (x4 - x5) + 128) >> 8
        row = [(x7 + x1) >> 8, (x3 + x2) >> 8, (x0 + x4) >> 8,
               (x8 + x6) >> 8, (x8 - x6) >> 8, (x0 - x4) >> 8,
               (x3 - x2) >> 8, (x7 - x1) >> 8]
        for j in range(8):
            inter[y * 8 + j] = row[j]
    out = [None] * 64
    for x in range(8):
        col = [inter[r * 8 + x] for r in range(8)]
        y0 = (col[0] << 8) + 8192
        y1 = col[4] << 8
        y2, y3, y4, y5, y6, y7 = col[6], col[2], col[1], col[7], col[5], col[3]
        y8 = C.W7 * (y4 + y5) + 4
        y4, y5 = (y8 + C.W1MW7 * y4) >> 3, (y8 - C.W1PW7 * y5) >> 3
        y8 = C.W3 * (y6 + y7) + 4
        y6, y7 = (y8 - C.W3MW5 * y6) >> 3, (y8 - C.W3PW5 * y7) >> 3
        y8 = y0 + y1
        y0 = y0 - y1
        y1 = C.W6 * (y3 + y2) + 4
        y2, y3 = (y1 - C.W2PW6 * y2) >> 3, (y1 + C.W2MW6 * y3) >> 3
        y1 = y4 + y6
        y4 = y4 - y6
        y6 = y5 + y7
        y5 = y5 - y7
        y7 = y8 + y3
        y8 = y8 - y3
        y3 = y0 + y2
        y0 = y0 - y2
        y2 = (C.R2 * (y4 + y5) + 128) >> 8
        y4 = (C.R2 * (y4 - y5) + 128) >> 8
        colo = [(y7 + y1) >> 11, (y3 + y2) >> 11, (y0 + y4) >> 11,
                (y8 + y6) >> 11, (y8 - y6) >> 11, (y0 - y4) >> 11,
                (y3 - y2) >> 11, (y7 - y1) >> 11]
        for r in range(8):
            out[r * 8 + x] = colo[r]
    # the scalar IDCT stores int16 (idct.cc out[64] int16): wrap
    return jnp.stack([p.astype(jnp.int16).astype(jnp.int32) for p in out],
                     axis=-1)


def _div2_tz(v):
    return jnp.sign(v) * (jnp.abs(v) >> 1)


def _trunc_div(a, b):
    return jnp.sign(a) * (jnp.abs(a) // b)


def _bitlen(v):
    return jnp.where(v > 0, 32 - lax.clz(v.astype(jnp.int32)), 0)


# ---------------------------------------------------------------------------
# The block-decode scan
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("num_lanes", "n_flat", "row_stride",
                                   "coder"))
def decode_blocks_scan(num_lanes: int,
                       data: jnp.ndarray, dlen: jnp.ndarray,
                       xs_comp: jnp.ndarray, xs_fi: jnp.ndarray,
                       xs_has_above: jnp.ndarray, xs_has_left: jnp.ndarray,
                       xs_live: jnp.ndarray,
                       quant_tab: jnp.ndarray, icosx_tab: jnp.ndarray,
                       icosy_tab: jnp.ndarray, mnt_tab: jnp.ndarray,
                       ci_tab: jnp.ndarray, n_flat: int, row_stride: int,
                       coder: str = "vpx", template=None):
    """Decode all lanes' block sequences in lockstep.

    data: uint8 [S, Lmax] per-lane compressed streams; dlen int32 [S].
    coder "ans" (format v3): data is instead uint32 [S, Wmax] stream
    words, dlen the per-lane word counts; reads go through the rANS
    forward reader with the adv-model update rule and there is no
    initial marker bit (ans_bool_writer has no vpx_start_encode).
    xs_*: [T, S] per-step block descriptors (component, LANE-LOCAL flat
    index, context masks, live).
    *_tab: [ncomp, 64] per-component tables; ci_tab int32 [ncomp].
    n_flat: static size of each lane's local coefficient slab (one extra
    dump slot is allocated for dead-lane scatters).
    row_stride: padded width (fi - row_stride = the above block of the
    same component: a lane's rows of one component are contiguous).

    Every carried array is lane-major, so the whole scan shards over a
    mesh axis with lanes = segments (segments never read across lanes --
    independent streams, independent neighbor state).

    Returns (coef int16 [S, n_flat, 64], err bool [S]).
    """
    S = num_lanes
    lanes = jnp.arange(S)
    vpx_norm = jnp.asarray(_VPX_NORM_NP)
    unzig = jnp.asarray(_UNZIG49_NP)
    nz_bin = jnp.asarray(_NZ_BIN_NP)
    if coder == "ans":
        plut = jnp.asarray(_packed_lut_adv())
        read = make_read_ans(lanes, data, dlen, plut)
        buf = state_init_ans(data, template=template)
    else:
        plut = jnp.asarray(_packed_lut())
        read = make_read(lanes, data, dlen, plut, vpx_norm)
        buf = state_init(S, template=template)
        # marker bit (vpx_reader_init / vpx_start_encode), probability 128
        buf, _ = read(buf, jnp.full(S, FIXED128, jnp.int32),
                      jnp.ones(S, bool), adaptive=False)

    coef = jnp.zeros((S, n_flat + 1, 64), dtype=jnp.int16)
    summ = jnp.zeros((S, n_flat + 1, 17), dtype=jnp.int16)

    s70, s71, s72, _ = _STR["nz_7x7"]
    e70, e71, e72, e73, _ = _STR["exp_7x7"]
    r70, r71, r72, _ = _STR["residual_noise"]
    sg0, sg1, _ = _STR["sign"]
    ex0, ex1, ex2, ex3, _ = _STR["exp_x"]
    rt0, rt1, rt2, _ = _STR["residual_thresh"]
    ed0, ed1, _ = _STR["exp_dc"]
    rd0, _ = _STR["residual_noise_dc"]
    cap = (1 << C.RESIDUAL_NOISE_FLOOR) - 1

    def read_exponent(buf, exp_slice, active):
        """Unary exponent: reads at exp_slice+i while bits are 1
        (decoder.cc parse loop), rolled (measured faster than unrolled
        on the CPU backend and far cheaper to compile)."""
        def body(i, val):
            buf, length, cont = val
            buf, bit = read(buf, exp_slice + i, cont)
            length = length + (cont & (bit == 1))
            cont = cont & (bit == 1)
            return (buf, length, cont)
        buf, length, _ = lax.fori_loop(
            0, _MAXE, body, (buf, jnp.zeros(S, jnp.int32), active))
        return buf, length

    def read_tree(buf, nbits, base, stride, active):
        """MSB-first binary tree: bit i at base + i*stride + so_far."""
        def body(j, val):
            buf, v, so_far = val
            i = nbits - 1 - j
            buf, bit = read(buf, base + i * stride + so_far, active)
            v = v | (bit << i)
            so_far = (so_far << 1) | bit
            return (buf, v, so_far)
        buf, v, _ = lax.fori_loop(
            0, nbits, body, (buf, jnp.zeros(S, jnp.int32),
                             jnp.zeros(S, jnp.int32)))
        return buf, v

    def read_sign_residual(buf, length, sign_idx, sign_active,
                           res_slice, active, nslots):
        """Sign bit + plain residual bits in ONE rolled loop.

        Slot 0 reads the sign branch, slots 1..nslots read residual bit
        i = length-1-j.  Folding the sign read into the loop matters:
        an inline read between two rolled loops leaves pre-read-derived
        values live across its buffer update, which forces the CPU
        backend to copy the whole state buffer (measured ~0.5ms per
        occurrence); while-loop carry boundaries reset that analysis.
        Returns (buf, sign_bit, magnitude_bits)."""
        def body(j, val):
            buf, sbit, cv = val
            is_sign = j == 0
            i = length - 1 - j
            rv = jnp.where(is_sign, sign_active, active & (i >= 0))
            safe_i = jnp.maximum(i, 0)
            idx = jnp.where(is_sign, sign_idx, res_slice + safe_i)
            buf, bit = read(buf, idx, rv)
            sbit = jnp.where(is_sign, bit, sbit)
            cv = cv | jnp.where(rv & ~is_sign, bit << safe_i, 0)
            return (buf, sbit, cv)
        return lax.fori_loop(0, nslots + 1, body,
                             (buf, jnp.zeros(S, jnp.int32),
                              jnp.zeros(S, jnp.int32)))

    def step(carry, xs):
        buf, coef, summ, err = carry
        comp, fi, has_above, has_left, live = xs
        ci = ci_tab[comp]                           # [S]
        quant = quant_tab[comp]                     # [S, 64]
        q0 = quant[:, 0]
        mnt = mnt_tab[comp]

        fi_l = fi - 1
        fi_a = fi - row_stride
        fi_al = fi_a - 1
        sum_l = summ[lanes, jnp.maximum(fi_l, 0)].astype(jnp.int32)
        sum_a = summ[lanes, jnp.maximum(fi_a, 0)].astype(jnp.int32)
        coef_l = coef[lanes, jnp.maximum(fi_l, 0)].astype(jnp.int32)
        coef_a = coef[lanes, jnp.maximum(fi_a, 0)].astype(jnp.int32)
        coef_al = coef[lanes, jnp.maximum(fi_al, 0)].astype(jnp.int32)

        # ---- 7x7 nonzero tree (decoder.cc:171-185)
        nz_l = jnp.where(has_left, sum_l[:, 0], 0)
        nz_a = jnp.where(has_above, sum_a[:, 0], 0)
        nz_ctx = jnp.where(
            has_left & has_above, (nz_a + nz_l + 2) // 4,
            jnp.where(has_above, (nz_a + 1) // 2,
                      jnp.where(has_left, (nz_l + 1) // 2, 0)))
        base = (_OFF["nz_7x7"] + ci * s70 + nz_bin[nz_ctx] * s71)
        buf, nz7 = read_tree(buf, 6, base, s72, live)
        err = err | (live & (nz7 > 49))
        nz7 = jnp.minimum(nz7, 49)

        # ---- 49 interior coefficients (decoder.cc:200-240)
        here = jnp.zeros((S, 64), jnp.int32)
        sign_base = _OFF["sign"] + ci * sg0
        exp7_base = _OFF["exp_7x7"] + ci * e70
        res_base = _OFF["residual_noise"] + ci * r70

        def zz_body(zz, val):
            buf, here, nz_left, eob_x, eob_y = val
            coord = unzig[zz]
            active = live & (nz_left > 0)
            al = jnp.abs(coef_l[lanes, coord])
            aa = jnp.abs(coef_a[lanes, coord])
            aal = jnp.abs(coef_al[lanes, coord])
            both = ((13 * (jnp.where(has_left, al, 0)
                           + jnp.where(has_above, aa, 0))
                     + 6 * jnp.where(has_above & has_left, aal, 0))
                    & 0xFFFF) >> 5
            aavrg = jnp.where(has_left & has_above, both,
                              jnp.where(has_left, al,
                                        jnp.where(has_above, aa, 0)))
            bsr = _bitlen(jnp.minimum(aavrg, 1023))
            nnzb = nz_bin[nz_left]
            exp_slice = exp7_base + nnzb * e71 + zz * e72 + bsr * e73
            buf, length = read_exponent(buf, exp_slice, active)
            nonzero = active & (length > 0)
            res_slice = res_base + coord * r71 + nnzb * r72
            buf, sbit, cv = read_sign_residual(
                buf, length, sign_base, nonzero, res_slice, active, 9)
            neg = nonzero & (sbit == 0)
            cv = cv | jnp.where(nonzero, 1 << jnp.maximum(length - 1, 0), 0)
            cv = jnp.where(neg, -cv, cv)
            here = here.at[lanes, coord].set(
                jnp.where(active, cv, here[lanes, coord]))
            nz_left = nz_left - nonzero.astype(jnp.int32)
            eob_x = jnp.maximum(eob_x, jnp.where(nonzero, coord & 7, 0))
            eob_y = jnp.maximum(eob_y, jnp.where(nonzero, coord >> 3, 0))
            return (buf, here, nz_left, eob_x, eob_y)

        z = jnp.zeros(S, jnp.int32)
        buf, here, _, eob_x, eob_y = lax.fori_loop(
            0, 49, zz_body, (buf, here, nz7, z, z))

        # ---- edges: horizontal then vertical (decode_one_edge :29-142)
        def edge(buf, here, horizontal):
            if horizontal:
                tbl = "nz_8x1"
                zig15 = 0
                delta = 1
                est_eob = eob_x
                icos_tab = icosx_tab
                nb_coef = coef_a
                nb_has = has_above
            else:
                tbl = "nz_1x8"
                zig15 = 7
                delta = 8
                est_eob = eob_y
                icos_tab = icosy_tab
                nb_coef = coef_l
                nb_has = has_left
            n0, n1, n2, n3, _ = _STR[tbl]
            nz_slice = (_OFF[tbl] + ci * n0 + est_eob * n1
                        + ((nz7 + 3) // 7) * n2)
            buf, cnt = read_tree(buf, 3, nz_slice, n3, live)
            expx_base = _OFF["exp_x"] + ci * ex0
            rt_base = _OFF["residual_thresh"] + ci * rt0

            def lane_body(k, val):
                buf, here, remaining = val
                band = (k + 1) * delta
                active = live & (remaining > 0)
                # Lakhani prediction (model.hh:1033-1071); band is a
                # loop scalar (same coordinate for every lane)
                if horizontal:
                    idxs = band + jnp.arange(8) * 8           # column band
                    ic = icos_tab[comp[:, None],
                                  (band * 8 + jnp.arange(8))[None, :]]
                else:
                    idxs = band + jnp.arange(8)               # row band
                    ic = icos_tab[comp[:, None],
                                  (band + jnp.arange(8))[None, :]]
                hx = jnp.take(here, idxs, axis=1)
                hx = hx.at[:, 0].set(0)
                na = jnp.take(nb_coef, idxs, axis=1)
                sgn = jnp.where(jnp.arange(1, 8) & 1, 1, -1)
                pred = na[:, 0] * ic[:, 0] - jnp.sum(
                    ic[:, 1:] * (hx[:, 1:] + sgn[None, :] * na[:, 1:]),
                    axis=1)
                bp = jnp.where(nb_has, _trunc_div(pred, ic[:, 0]), 0)
                bsr = _bitlen(jnp.minimum(jnp.abs(bp), 1023))
                exp_slice = (expx_base + remaining * ex1
                             + (zig15 + k) * ex2 + bsr * ex3)
                buf, length = read_exponent(buf, exp_slice, active)
                nonzero = active & (length > 0)
                ctx1 = jnp.where(bp == 0, 0, jnp.where(bp > 0, 1, 2))
                sign_idx = sign_base + ctx1 * sg1 + bsr
                mt = jnp.take(mnt, band, axis=1)
                t1 = jnp.minimum(jnp.abs(bp) >> mt, 255)
                t2 = jnp.minimum(length - mt, C.RESIDUAL_NOISE_FLOOR)
                thresh_slice = rt_base + t1 * rt1 + t2 * rt2
                res_slice = res_base + band * r71 + remaining * r72

                # one rolled loop: sign bit, then threshold-contexted bits
                # above the noise floor (serial decoded_so_far chain),
                # then plain noise bits (see read_sign_residual rationale)
                def res_body(j, val):
                    buf, sbit, cv, dsf = val
                    is_sign = j == 0
                    i = length - 1 - j
                    rv = jnp.where(is_sign, nonzero, nonzero & (i >= 0))
                    safe_i = jnp.maximum(i, 0)
                    is_thresh = i >= mt
                    idx = jnp.where(
                        is_sign, sign_idx,
                        jnp.where(is_thresh, thresh_slice + dsf,
                                  res_slice + safe_i))
                    buf, bit = read(buf, idx, rv)
                    sbit = jnp.where(is_sign, bit, sbit)
                    cv = cv | jnp.where(rv & ~is_sign, bit << safe_i, 0)
                    dsf = jnp.where(rv & ~is_sign & is_thresh,
                                    jnp.minimum((dsf << 1) | bit, cap), dsf)
                    return (buf, sbit, cv, dsf)

                buf, sbit, cv, _ = lax.fori_loop(
                    0, 10, res_body,
                    (buf, jnp.zeros(S, jnp.int32), jnp.zeros(S, jnp.int32),
                     jnp.ones(S, jnp.int32)))
                neg = nonzero & (sbit == 0)
                cv = cv | jnp.where(nonzero,
                                    1 << jnp.maximum(length - 1, 0), 0)
                cv = jnp.where(neg, -cv, cv)
                here = here.at[:, band].set(
                    jnp.where(nonzero, cv, here[:, band]))
                remaining = remaining - nonzero.astype(jnp.int32)
                return (buf, here, remaining)

            buf, here, _ = lax.fori_loop(0, 7, lane_body, (buf, here, cnt))
            return buf, here

        buf, here = edge(buf, here, True)
        buf, here = edge(buf, here, False)

        # ---- DC last (decoder.cc:243-287 + model.hh:674-784)
        pixels = _idct_vec(here, quant)
        px0 = jnp.stack([pixels[:, i * 8] for i in range(8)], axis=1)
        px1 = jnp.stack([pixels[:, i * 8 + 1] for i in range(8)], axis=1)
        a_l = px0 + 1024
        b_l = sum_l[:, 1:9] - _div2_tz(px0 - px1)
        est_l = (b_l - a_l).astype(jnp.int16).astype(jnp.int32)
        a_a = pixels[:, 0:8] + 1024
        b_a = sum_a[:, 9:17] - _div2_tz(pixels[:, 0:8] - pixels[:, 8:16])
        est_a = (b_a - a_a).astype(jnp.int16).astype(jnp.int32)
        big = jnp.int32(1 << 30)
        lm_ = has_left[:, None]
        am_ = has_above[:, None]
        mins = jnp.minimum(
            jnp.min(jnp.where(lm_, est_l, big), axis=1),
            jnp.min(jnp.where(am_, est_a, big), axis=1))
        maxs = jnp.maximum(
            jnp.max(jnp.where(lm_, est_l, -big), axis=1),
            jnp.max(jnp.where(am_, est_a, -big), axis=1))
        sum_le = jnp.sum(jnp.where(lm_, est_l, 0), axis=1)
        sum_ae = jnp.sum(jnp.where(am_, est_a, 0), axis=1)
        avg_h = jnp.where(has_left, sum_le, sum_ae)
        avg_v = jnp.where(has_left & has_above, sum_ae, avg_h)
        overall = (avg_h + avg_v) >> 1
        any_n = has_left | has_above
        unc = jnp.where(any_n, (maxs - mins) >> 3, 0)
        dh = avg_h - overall
        dv = avg_v - overall
        far = jnp.where(jnp.abs(dh) < jnp.abs(dv), dh, dv)
        unc2 = jnp.where(any_n, far >> 3, 0)
        avgmed = jnp.where(any_n, overall, 0)
        pred_dc = (_trunc_div(avgmed, q0) + 4) >> 3

        lm = jnp.minimum(_bitlen(jnp.abs(unc)), C.NUMERIC_LENGTH_MAX - 1)
        lo = jnp.minimum(_bitlen(jnp.abs(unc2)), 16)
        buf, length = read_exponent(
            buf, _OFF["exp_dc"] + lm * ed0 + lo * ed1, live)
        nonzero = live & (length > 0)
        sctx = jnp.where(unc2 < 0, 1, jnp.where(unc2 == 0, 3, 2))
        buf, sbit, cv = read_sign_residual(
            buf, length, sign_base + sctx, nonzero,
            _OFF["residual_noise_dc"] + lm * rd0, live, 10)
        neg = nonzero & (sbit == 0)
        cv = cv | jnp.where(nonzero, 1 << jnp.maximum(length - 1, 0), 0)
        cv = jnp.where(neg, -cv, cv)
        # adv_predict_or_unpredict_dc(recover=True) wrap (model.hh:823-832)
        max_value = 1 << (_MAXE - 1)
        adj = 2 * max_value + 1
        dc = cv + pred_dc
        dc = jnp.where(dc < -max_value, dc + adj, dc)
        dc = jnp.where(dc > max_value, dc - adj, dc)
        here = here.at[:, 0].set(jnp.where(live, dc, here[:, 0]))

        # ---- outgoing neighbor summary (NeighborSummary set_*)
        vert_cur = jnp.stack([pixels[:, i * 8 + 7] for i in range(8)], axis=1)
        vert_prev = jnp.stack([pixels[:, i * 8 + 6] for i in range(8)],
                              axis=1)
        vert = (dc[:, None] * q0[:, None] + vert_cur + 1024
                + _div2_tz(vert_cur - vert_prev))
        horiz = (dc[:, None] * q0[:, None] + pixels[:, 56:64] + 1024
                 + _div2_tz(pixels[:, 56:64] - pixels[:, 48:56]))
        new_summ = jnp.concatenate(
            [nz7[:, None], vert, horiz], axis=1).astype(jnp.int16)

        safe_fi = jnp.where(live, fi, n_flat)    # dump slot for dead lanes
        coef = coef.at[lanes, safe_fi].set(here.astype(jnp.int16))
        summ = summ.at[lanes, safe_fi].set(new_summ)
        return (buf, coef, summ, err), None

    (buf, coef, summ, err), _ = lax.scan(
        step, (buf, coef, summ, jnp.zeros(S, bool)),
        (xs_comp, xs_fi, xs_has_above, xs_has_left, xs_live))
    return coef[:, :n_flat], err




# ---------------------------------------------------------------------------
# Host wrapper: geometry planning + stream padding
# ---------------------------------------------------------------------------


def decode_segments_tpu(streams, plane_shapes, color_tables, mcuv,
                        max_coded_heights, component_sizes, splits_y,
                        color_index=None, mesh=None, mesh_axis="seg",
                        coder="vpx", template=None):
    """Decode per-segment VPX streams into coefficient planes on-device.

    streams: list of bytes (one independent arithmetic stream per
    segment, demuxed from the container in file order).
    coder: "vpx" (v1/v2 boolcoder) or "ans" (v3 rANS backend).
    plane_shapes: [(H_c, W_c)] per component; color_tables: ColorTables.
    splits_y: luma_y_start per segment.
    mesh/mesh_axis: optional jax Mesh -- lanes (= segments) shard across
    the named axis via shard_map (every carried array is lane-major).
    template: optional packed uint32 [ARENA_SIZE] trained-model start
    arena (LEPTON_COMPRESSION_MODEL), broadcast to every lane.

    Returns (planes list of int16 [H_c, W_c, 64], err bool [S]).
    """
    import jax
    import jax.numpy as jnp

    from .encode_pipeline import plan_rows

    ncomp = len(plane_shapes)
    S = len(streams)
    heights = [h for h, _ in plane_shapes]
    widths = [w for _, w in plane_shapes]
    Wmax = max(widths)
    plans = plan_rows(heights, mcuv, max_coded_heights, splits_y)
    assert len(plans) == S, (len(plans), S)

    # lane-local slab layout: rows of one component are contiguous, so
    # fi - Wmax is the same-component above block
    max_comp_rows = 1
    for plan in plans:
        per = {}
        for comp, y in plan:
            per[comp] = per.get(comp, 0) + 1
        if per:
            max_comp_rows = max(max_comp_rows, max(per.values()))
    n_flat = ncomp * max_comp_rows * Wmax

    lanes_blocks = []
    lane_rowmap = []                       # per lane: [(comp, y, local_fi0)]
    for s_i in range(S):
        seen_first = {}
        blocks = []
        rowmap = []
        for comp, y in plans[s_i]:
            if comp not in seen_first:
                seen_first[comp] = y
            local_row = y - seen_first[comp]
            fi0 = (comp * max_comp_rows + local_row) * Wmax
            rowmap.append((comp, y, fi0))
            W = widths[comp]
            for x in range(W):
                if y * W + x >= component_sizes[comp]:
                    break
                blocks.append((comp, fi0 + x, y != seen_first[comp], x > 0))
        lanes_blocks.append(blocks)
        lane_rowmap.append(rowmap)
    T = max(len(b) for b in lanes_blocks)
    xs_comp = np.zeros((T, S), np.int32)
    xs_fi = np.zeros((T, S), np.int32)
    xs_ha = np.zeros((T, S), bool)
    xs_hl = np.zeros((T, S), bool)
    xs_live = np.zeros((T, S), bool)
    for s_i, blocks in enumerate(lanes_blocks):
        for t, (comp, fi, ha, hl) in enumerate(blocks):
            xs_comp[t, s_i] = comp
            xs_fi[t, s_i] = fi
            xs_ha[t, s_i] = ha
            xs_hl[t, s_i] = hl
            xs_live[t, s_i] = True

    if coder == "ans":
        # little-endian uint32 words, short trailing bytes zero-filled
        # (ANSReader pads to a word boundary and zero-fills past EOF)
        word_lists = []
        for b in streams:
            if len(b) % 4:
                b = b + b"\x00" * (4 - len(b) % 4)
            word_lists.append(np.frombuffer(b, np.uint32))
        Lmax = max(1, max(len(w) for w in word_lists))
        data = np.zeros((S, max(Lmax, 4)), np.uint32)
        dlen = np.zeros(S, np.int32)
        for s_i, w in enumerate(word_lists):
            data[s_i, :len(w)] = w
            dlen[s_i] = len(w)
    else:
        Lmax = max(1, max(len(b) for b in streams))
        data = np.zeros((S, Lmax), np.uint8)
        dlen = np.zeros(S, np.int32)
        for s_i, b in enumerate(streams):
            data[s_i, :len(b)] = np.frombuffer(b, np.uint8)
            dlen[s_i] = len(b)

    quant_tab = np.zeros((ncomp, 64), np.int32)
    icosx_tab = np.zeros((ncomp, 64), np.int32)
    icosy_tab = np.zeros((ncomp, 64), np.int32)
    mnt_tab = np.zeros((ncomp, 64), np.int32)
    ci_tab = np.zeros(ncomp, np.int32)
    for c in range(ncomp):
        ct = color_tables[c]
        quant_tab[c] = np.asarray(ct.quant, np.int32)
        icosx_tab[c] = np.asarray(
            ct.icos_idct_edge_8192_dequantized_x, np.int32)
        icosy_tab[c] = np.asarray(
            ct.icos_idct_edge_8192_dequantized_y, np.int32)
        mnt_tab[c] = np.asarray(ct.min_noise_threshold, np.int32)
        ci_tab[c] = (0 if c == 0 else 1) if color_index is None \
            else color_index(c)

    args = [jnp.asarray(data), jnp.asarray(dlen),
            jnp.asarray(xs_comp), jnp.asarray(xs_fi), jnp.asarray(xs_ha),
            jnp.asarray(xs_hl), jnp.asarray(xs_live)]
    tabs = [jnp.asarray(quant_tab), jnp.asarray(icosx_tab),
            jnp.asarray(icosy_tab), jnp.asarray(mnt_tab),
            jnp.asarray(ci_tab)]
    if mesh is not None and mesh.size > 1:
        # shard_map: each device runs the scan on its local lanes (the
        # kernel is embarrassingly lane-parallel -- segments never read
        # across lanes), avoiding SPMD-partitioner scatter analysis
        try:
            from jax import shard_map as _sm   # jax >= 0.8 top-level home

            def shard_map(f, mesh, in_specs, out_specs, check_rep):
                # check_rep was renamed check_vma at the top-level home
                return _sm(f, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, check_vma=check_rep)
        except ImportError:
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P
        n_dev = mesh.shape[mesh_axis]
        assert S % n_dev == 0, (S, n_dev)
        S_local = S // n_dev
        lane0 = P(mesh_axis)
        lane1 = P(None, mesh_axis)
        rep = P()
        tpl = None if template is None \
            else jnp.asarray(template, jnp.uint32)
        fn = shard_map(
            lambda d, dl, xc, xf, xa, xl, xv, qt, ix, iy, mt, ct:
            decode_blocks_scan(S_local, d, dl, xc, xf, xa, xl, xv,
                               qt, ix, iy, mt, ct, n_flat, Wmax,
                               coder=coder, template=tpl),
            mesh=mesh,
            in_specs=(lane0, lane0, lane1, lane1, lane1, lane1, lane1,
                      rep, rep, rep, rep, rep),
            out_specs=(lane0, lane0),
            # constant-initialized carries (fresh arenas/readers) are
            # device-invariant; outputs vary per lane shard by design
            check_rep=False)
        coef_lanes, err = fn(*args, *tabs)
    else:
        coef_lanes, err = decode_blocks_scan(
            S, *args, *tabs, n_flat, Wmax, coder=coder,
            template=None if template is None
            else jnp.asarray(template, jnp.uint32))
    coef_np = np.asarray(coef_lanes)
    planes = [np.zeros((heights[c], widths[c], 64), np.int16)
              for c in range(ncomp)]
    for s_i, rowmap in enumerate(lane_rowmap):
        for comp, y, fi0 in rowmap:
            W = widths[comp]
            planes[comp][y, :W] = coef_np[s_i, fi0:fi0 + W]
    return planes, np.asarray(err)
