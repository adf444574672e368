"""Pallas TPU decode kernel: the full VPX token parser on silicon.

The XLA decode kernel (kernels/vpx_decode.py) is bit-exact but lowers
badly on XLA:TPU (per-element scatters serialize; the scan compiles
O(steps)).  This kernel is the Mosaic formulation: one grid step per
thread-segment, the segment's ~720k-branch adaptive model resident in
VMEM as packed int32 rows, scalar while-loop control flow (reads happen
for exactly the bits the reference reads -- no predication padding), and
(1,128)-row one-hot read-modify-writes for branch access.

Measured design envelope (r3 probes on the v5e):
  - a dependent one-hot VMEM RMW chain sustains ~6M ops/s; interleaving
    independent chains in one program does NOT scale (K=4 -> 1.15x), so
    the kernel keeps ONE exact serial chain per grid step and the grid
    serializes segments.  TPU decode therefore cannot beat the ~140
    Msym/s serial host C decoder -- this kernel exists to make decode
    REAL on the accelerator (golden gates on silicon) and its honest
    throughput is reported in bench.py.
  - VMEM on the v5e fits the 2.9MB packed arena + per-segment stream +
    coefficient slab comfortably (128MB scratch allocations compile).

Semantics mirror kernels/vpx_decode.py exactly (which mirrors reference
src/vp8/decoder/decoder.cc:168-319, boolreader.hh:376-416); cross-
validated in tests/test_pallas_decode.py (interpret mode) and the
on-silicon golden gates.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from ..model.tables import ARENA_SIZE, TABLE_OFFSETS, TABLE_STRIDES

LANES = 128
AR_ROWS = (ARENA_SIZE + LANES - 1) // LANES
LOTS_OF_BITS = 0x40000000
_MAXE = C.MAX_EXPONENT
_RNF = C.RESIDUAL_NOISE_FLOOR
_CAP = (1 << _RNF) - 1
_OFF = {k: int(v) for k, v in TABLE_OFFSETS.items()}
_STR = {k: tuple(int(s) for s in v) for k, v in TABLE_STRIDES.items()}

# rowdesc lanes: 0=comp (lane-local: ring/output indexing), 1=ci,
# 2=width, 3=has_above, 4=fi0, 5=live, 6=comp_tab (global color-table
# row -- differs from comp when many images share one kernel call)
RD_FIELDS = 8


def _u_ge(a, b):
    """Unsigned >= on int32 scalars (sign-flip trick)."""
    m = np.int32(-(1 << 31))
    return (a ^ m) >= (b ^ m)


def _div2_tz(v):
    """Truncating /2 (sign toward zero) -- scalars or vectors."""
    return jnp.where(v < 0, -((-v) >> 1), v >> 1)


def _wrap16(v):
    return ((v + 32768) & 0xFFFF) - 32768


def _bitlen_f32(v):
    """bit_length(v) for v >= 0 (scalars or vectors) via count-leading-
    zeros (Mosaic lowers lax.clz on both)."""
    return jnp.where(v > 0, 32 - lax.clz(v), 0)


def _div_exact(n, d):
    """floor(n/d), n >= 0, d >= 1 (Mosaic lowers scalar integer
    division natively — probed on the v5e)."""
    return n // d


def _trunc_div(a, b):
    """Truncate-toward-zero division (C semantics), b > 0 scalar.
    lax.div has exactly C's truncation semantics for int32."""
    return lax.div(a, b)


def _branch_update(fc, tc, bit):
    """Branch::record_obs_and_update on scalars (branch.hh:82-100),
    mirroring vpx_scan._branch_update_arith exactly."""
    tot = fc + tc + 1
    obs = bit != 0
    nfc = jnp.where(obs, fc, fc + 1)
    ntc = jnp.where(obs, tc + 1, tc)
    ovf = jnp.where(obs, tc == 0xFF, fc == 0xFF)
    hfc = (1 + fc) >> 1
    htc = (1 + tc) >> 1
    ofc = jnp.where(obs, hfc, 129)
    otc = jnp.where(obs, 129, htc)
    nfc = jnp.where(ovf, ofc, nfc)
    ntc = jnp.where(ovf, otc, ntc)
    numer = jnp.where(ovf, ofc, jnp.where(obs, fc, fc + 1)) << 8
    denom = jnp.where(ovf, ofc + otc, tot)
    # & 0xFF: the host stores the prob through a uint8 LUT; the tc == 0
    # corner (trained-model templates only) wraps
    nprob = _div_exact(numer, denom) & 0xFF
    never = ovf & jnp.where(obs, fc == 1, tc == 1)
    nfc = jnp.where(never, jnp.where(obs, 1, 0xFF), nfc)
    ntc = jnp.where(never, jnp.where(obs, 0xFF, 1), ntc)
    nprob = jnp.where(never, jnp.where(obs, 0, 255), nprob)
    return nfc, ntc, nprob


def _branch_update_adv(fc, tc, bit):
    """Branch::adv_record_obs_and_update on scalars (branch.hh:66-80),
    the ANS backend rule: probability from post-update counts, ORed
    with 1 (a zero probability would break the rANS interval)."""
    obs = bit != 0
    val = jnp.where(obs, tc, fc)
    nfc = jnp.where(obs, fc, fc + 1)
    ntc = jnp.where(obs, tc + 1, tc)
    ovf = val == 0xFF
    nfc = jnp.where(ovf, jnp.where(obs, (fc + 1) >> 1, 129), nfc)
    ntc = jnp.where(ovf, jnp.where(obs, 129, (tc + 1) >> 1), ntc)
    nprob = (_div_exact(nfc << 8, nfc + ntc) & 0xFF) | 1
    return nfc, ntc, nprob


def _idct_ignore_dc(here88, quant88):
    """Fixed-point scaled IDCT with DC ignored on an (8,128) block value
    (rows=pixel rows, lanes 0..7 = columns); exact port of
    vpx_decode._idct_vec (idct.cc scalar semantics, int16 wrap)."""
    d = here88 * quant88
    sub = lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    lane = lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    d = jnp.where((sub == 0) & (lane == 0), 0, d)

    def col(a, k):
        return a[:, k:k + 1]                 # (8,1)

    # row pass: combine columns (lanes), vectorized over all 8 rows
    x0 = (col(d, 0) << 11) + 128
    x1 = col(d, 4) << 11
    x2, x3, x4 = col(d, 6), col(d, 2), col(d, 1)
    x5, x6, x7 = col(d, 7), col(d, 5), col(d, 3)
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
    cols = [(x7 + x1) >> 8, (x3 + x2) >> 8, (x0 + x4) >> 8,
            (x8 + x6) >> 8, (x8 - x6) >> 8, (x0 - x4) >> 8,
            (x3 - x2) >> 8, (x7 - x1) >> 8]
    inter = jnp.zeros((8, LANES), jnp.int32)
    for j in range(8):
        inter = jnp.where(lane == j, cols[j], inter)

    def row(a, k):
        return a[k:k + 1, :]                 # (1,LANES)

    # column pass: combine rows (sublanes), vectorized over lanes
    y0 = (row(inter, 0) << 8) + 8192
    y1 = row(inter, 4) << 8
    y2, y3, y4 = row(inter, 6), row(inter, 2), row(inter, 1)
    y5, y6, y7 = row(inter, 7), row(inter, 5), row(inter, 3)
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
    rows = [(y7 + y1) >> 11, (y3 + y2) >> 11, (y0 + y4) >> 11,
            (y8 + y6) >> 11, (y8 - y6) >> 11, (y0 - y4) >> 11,
            (y3 - y2) >> 11, (y7 - y1) >> 11]
    out = jnp.zeros((8, LANES), jnp.int32)
    for r in range(8):
        out = jnp.where(sub == r, rows[r], out)
    return _wrap16(out)


def _flatten88(v88):
    """(8,128) block (lanes 0..7 live) -> (1,128) flat row where lane
    r*8+c = v88[r, c], via 8 static rolls."""
    lane = lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    out = jnp.zeros((1, LANES), jnp.int32)
    for r in range(8):
        rolled = pltpu.roll(v88[r:r + 1, :], r * 8, 1)
        out = out + jnp.where((lane >= r * 8) & (lane < r * 8 + 8),
                              rolled, 0)
    return out


def _extract(v, r, c):
    """Scalar v88[r, c] from an (8,128) value with scalar r, c."""
    sub = lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    lane = lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    return jnp.sum(jnp.where((sub == r) & (lane == c), v, 0))


def _extract_row(v, r):
    """(1,128) row r of an (8,128) value, scalar r."""
    sub = lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    return jnp.sum(jnp.where(sub == r, v, 0), axis=0, keepdims=True)


def _extract_col(v, c):
    """(8,1) column c of an (8,128) value, scalar c."""
    lane = lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    return jnp.sum(jnp.where(lane == c, v, 0), axis=1, keepdims=True)


def _extract_lane(v, c):
    """Scalar lane c of a (1,128) value."""
    lane = lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    return jnp.sum(jnp.where(lane == c, v, 0))


def _build_kernel(S, Tmax, Lrows, n_flat, Wmax, ncomp, coder="vpx",
                  templated=False, multi=False):
    """The decode kernel, specialized on static geometry.

    coder "ans" (format v3): data_ref holds little-endian uint32 stream
    WORDS (one per element) and meta[s,0] is the word count; reads go
    through the two-state rANS forward reader (ans_bool_reader.hh /
    rans64.hh decode step) with the adv-model update rule, and there is
    no initial marker bit.

    templated: the kernel takes one extra VMEM input (packed trained-
    model arena [AR_ROWS, LANES], the LEPTON_COMPRESSION_MODEL start
    state) copied into the per-segment arena instead of the identity
    fill (load_probability_tables, model.cc:407-421)."""
    s70, s71, s72, _ = _STR["nz_7x7"]
    e70, e71, e72, e73, _ = _STR["exp_7x7"]
    r70, r71, r72, _ = _STR["residual_noise"]
    sg0, sg1, _ = _STR["sign"]
    ex0, ex1, ex2, ex3, _ = _STR["exp_x"]
    rt0, rt1, rt2, _ = _STR["residual_thresh"]
    ed0, ed1, _ = _STR["exp_dc"]
    rd0, _ = _STR["residual_noise_dc"]
    h0, h1, h2, h3, _ = _STR["nz_8x1"]
    v0, v1, v2, v3, _ = _STR["nz_1x8"]

    def kernel(luts_ref, meta_ref, rowdesc_ref, data_ref,
               q88_ref, qflat_ref, icxT_ref, icy88_ref, mnt_ref,
               *rest):
        if templated:
            tpl_ref = rest[0]
            rest = rest[1:]
        coef_ref, err_ref, arena, ringc, rings = rest
        s = pl.program_id(0)
        lane1 = lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        if templated:
            arena[...] = tpl_ref[...]
        else:
            arena[...] = jnp.full((AR_ROWS, LANES), 0x010180, jnp.int32)
        # rows truncated by early EOF never get written: the plane
        # contract is zero there (the XLA kernel zero-fills its buffer)
        coef_ref[...] = jnp.zeros((n_flat, LANES), jnp.int32)
        dlen = meta_ref[s, 0]
        nrows = meta_ref[s, 1]

        def fetch_byte(pos):
            p = jnp.clip(pos, 0, Lrows * LANES - 1)
            row = p // LANES
            off = p - row * LANES
            w = data_ref[pl.ds(row, 1), :]
            return jnp.sum(jnp.where(lane1 == off, w, 0))

        def refill(value, count, pos):
            def cond(cv):
                return (cv[0] >= 0) & (cv[4] == 0)

            def body(cv):
                shift, value, count, pos, done = cv
                have = pos < dlen
                b = fetch_byte(pos)
                value = jnp.where(have, value | (b << shift), value)
                count = jnp.where(have, count + 8, count + LOTS_OF_BITS)
                done = jnp.where(have, 0, 1)
                pos = pos + have.astype(jnp.int32)
                return (shift - 8, value, count, pos, done)

            shift0 = jnp.where(count < 0, 16 - count, -1)
            _, value, count, pos, _ = lax.while_loop(
                cond, body, (shift0, value, count, pos, jnp.int32(0)))
            return value, count, pos

        def vpx_step(rd, prob):
            """Arithmetic-side of vpx_read given a probability; returns
            (rd', bit)."""
            value, rng, count, pos = rd
            value, count, pos = refill(value, count, pos)
            split = (rng * prob + (256 - prob)) >> 8
            bigsplit = split << 24
            ge = _u_ge(value, bigsplit)
            bit = ge.astype(jnp.int32)
            rng2 = jnp.where(ge, rng - split, split)
            value2 = jnp.where(ge, value - bigsplit, value)
            sh = lax.clz(rng2) - 24
            return (value2 << sh, rng2 << sh, count - sh, pos), bit

        def ans_step(rd, prob):
            """One get_bit of the ANS forward reader (ans_bool_reader.hh:
            two alternating 64-bit rANS states as (hi, lo) int32 pairs;
            rans64.hh decode advance x' = freq*(x>>8) + cum - start, one
            stream word per renormalization, zero past EOF)."""
            r0h, r0l, r1h, r1l, pos = rd
            cum = r0l & 0xFF
            ge = cum >= prob
            bit = ge.astype(jnp.int32)
            start = jnp.where(ge, prob, 0)
            freq = jnp.where(ge, 256 - prob, prob)
            # x >> 8 on the pair (logical shifts: values are u32 bits)
            sh_lo = lax.shift_right_logical(r0l, 8) | (r0h << 24)
            sh_hi = lax.shift_right_logical(r0h, 8)         # < 2^23
            # freq * (x>>8) from 16-bit limbs (freq <= 256: every term
            # fits 32 bits; the full product is < 2^63)
            p_ll = freq * (sh_lo & 0xFFFF)
            p_lh = freq * lax.shift_right_logical(sh_lo, 16)
            p_h = freq * sh_hi
            lo1 = p_ll + (cum - start)                      # < 2^26
            lh_shift = p_lh << 16                           # wraps
            nlo = lo1 + lh_shift                            # wraps
            carry = 1 - _u_ge(nlo, lo1).astype(jnp.int32)
            nhi = p_h + lax.shift_right_logical(p_lh, 16) + carry
            # renorm: unsigned x < 2^31  <=>  nhi == 0 and nlo >= 0
            renorm = (nhi == 0) & (nlo >= 0)
            word = jnp.where(pos < dlen, fetch_byte(pos), 0)
            x_hi = jnp.where(renorm, nlo, nhi)
            x_lo = jnp.where(renorm, word, nlo)
            pos = pos + renorm.astype(jnp.int32)
            return (r1h, r1l, x_hi, x_lo, pos), bit

        def read(rd, idx):
            """Adaptive read: one-hot branch RMW + coder step."""
            idx = jnp.clip(idx, 0, ARENA_SIZE - 1)
            row = idx // LANES
            off = idx - row * LANES
            tile = arena[pl.ds(row, 1), :]
            packed = jnp.sum(jnp.where(lane1 == off, tile, 0))
            prob = packed & 0xFF
            if coder == "ans":
                rd, bit = ans_step(rd, prob)
            else:
                rd, bit = vpx_step(rd, prob)
            fc = (packed >> 16) & 0xFF
            tc = (packed >> 8) & 0xFF
            if coder == "ans":
                nfc, ntc, nprob = _branch_update_adv(fc, tc, bit)
            else:
                nfc, ntc, nprob = _branch_update(fc, tc, bit)
            npacked = (nfc << 16) | (ntc << 8) | nprob
            arena[pl.ds(row, 1), :] = jnp.where(lane1 == off, npacked,
                                                tile)
            return rd, bit

        def read_tree(rd, nbits, base, stride):
            """MSB-first binary tree (vpx_decode.read_tree)."""
            def body(j, cv):
                rd, v, so_far = cv
                i = nbits - 1 - j
                rd, bit = read(rd, base + i * stride + so_far)
                v = v | (bit << i)
                so_far = (so_far << 1) | bit
                return (rd, v, so_far)
            rd, v, _ = lax.fori_loop(
                0, nbits, body, (rd, jnp.int32(0), jnp.int32(0)))
            return rd, v

        def read_exponent(rd, exp_slice):
            """Unary exponent: read at slice+i while bits are 1, max
            _MAXE reads."""
            def cond(cv):
                return (cv[1] < _MAXE) & (cv[2] != 0)

            def body(cv):
                rd, i, _ = cv
                rd, bit = read(rd, exp_slice + i)
                return (rd, i + 1, bit)

            rd, i, last = lax.while_loop(
                cond, body, (rd, jnp.int32(0), jnp.int32(1)))
            # length = number of 1-bits read = i - (last stopped on 0)
            length = i - jnp.where(last == 0, 1, 0)
            return rd, length

        def read_sign_residual(rd, length, sign_idx, res_slice, nslots):
            """Sign + plain residual bits below the top bit; called only
            when length > 0.  At most `nslots` residual reads (the
            vpx_decode read_sign_residual loop bound).  Returns
            (rd, sbit, cv)."""
            rd, sbit = read(rd, sign_idx)
            lo = length - 1 - nslots

            def cond(cv):
                return (cv[1] >= 0) & (cv[1] >= lo)

            def body(cv):
                rd, i, acc = cv
                rd, bit = read(rd, res_slice + i)
                return (rd, i - 1, acc | (bit << i))

            rd, _, cv = lax.while_loop(
                cond, body, (rd, length - 2, jnp.int32(0)))
            return rd, sbit, cv

        # ---- reader init (+ marker bit, VPX only)
        if coder == "ans":
            # r0 = w0 | w1<<32, r1 = w2 | w3<<32, cursor at word 4
            rd = (fetch_byte(jnp.int32(1)), fetch_byte(jnp.int32(0)),
                  fetch_byte(jnp.int32(3)), fetch_byte(jnp.int32(2)),
                  jnp.int32(4))
        else:
            rd = (jnp.int32(0), jnp.int32(255), jnp.int32(-8),
                  jnp.int32(0))
            rd, _ = vpx_step(rd, jnp.int32(128))

        def row_body(row_i, row_carry):
            rd, err = row_carry
            desc = rowdesc_ref[pl.ds(row_i, 1), :]
            comp = _extract_lane(desc, 0)
            ci = _extract_lane(desc, 1)
            width = _extract_lane(desc, 2)
            has_above = _extract_lane(desc, 3) != 0
            fi0 = _extract_lane(desc, 4)
            # comp_tab only exists in MULTI-container kernels: the extra
            # per-row extract measurably slows the single-container
            # kernel (16.6 -> 9.1 kblocks/s A/B on the v5e), so the
            # single path keeps the lane-local comp for tables too
            ctab = _extract_lane(desc, 6) if multi else comp

            q88 = q88_ref[pl.ds(ctab * 8, 8), :]
            qflat = qflat_ref[pl.ds(ctab, 1), :]
            q0 = _extract_lane(qflat, 0)
            icxT = icxT_ref[pl.ds(ctab * 8, 8), :]
            icy88 = icy88_ref[pl.ds(ctab * 8, 8), :]
            mnt = mnt_ref[pl.ds(ctab, 1), :]
            ringbase = comp * Wmax

            sign_base = _OFF["sign"] + ci * sg0
            exp7_base = _OFF["exp_7x7"] + ci * e70
            res_base = _OFF["residual_noise"] + ci * r70
            expx_base = _OFF["exp_x"] + ci * ex0
            rt_base = _OFF["residual_thresh"] + ci * rt0

            zero88 = jnp.zeros((8, LANES), jnp.int32)
            zero81 = jnp.zeros((8, 1), jnp.int32)

            def blk_body(x, bc):
                (rd, err, left88, al88c, sum_l_vert, nz_l) = bc
                has_left = x > 0

                above88 = ringc[pl.ds((ringbase + x) * 8, 8), :]
                above88 = jnp.where(has_above, above88, zero88)
                summ_a = rings[pl.ds(ringbase + x, 1), :]
                summ_a = jnp.where(has_above, summ_a, 0)
                nz_a = _extract_lane(summ_a, 0)

                # ---- 7x7 nonzero count (decoder.cc:171-185)
                nzl = jnp.where(has_left, nz_l, 0)
                nza = jnp.where(has_above, nz_a, 0)
                nz_ctx = jnp.where(
                    has_left & has_above, (nza + nzl + 2) >> 2,
                    jnp.where(has_above, (nza + 1) >> 1,
                              jnp.where(has_left, (nzl + 1) >> 1, 0)))
                nz_bin_ctx = luts_ref[64 + jnp.clip(nz_ctx, 0, 49)]
                base = _OFF["nz_7x7"] + ci * s70 + nz_bin_ctx * s71
                rd, nz7 = read_tree(rd, 6, base, s72)
                err = err | (nz7 > 49).astype(jnp.int32)
                nz7 = jnp.minimum(nz7, 49)

                # per-block precompute: aavrg bit-length map (8,128)
                absl = jnp.abs(left88)
                absa = jnp.abs(above88)
                absal = jnp.abs(al88c)
                both = ((13 * (jnp.where(has_left, absl, 0)
                               + jnp.where(has_above, absa, 0))
                         + 6 * jnp.where(has_above & has_left, absal, 0))
                        & 0xFFFF) >> 5
                aavrg88 = jnp.where(
                    has_left & has_above, both,
                    jnp.where(has_left, absl,
                              jnp.where(has_above, absa, 0)))
                bsr88 = _bitlen_f32(jnp.minimum(aavrg88, 1023))

                # ---- 49 interior coefficients
                def zz_cond(cv):
                    return (cv[1] < 49) & (cv[2] > 0)

                def zz_body(cv):
                    rd, zz, nz_left, here88, eob_x, eob_y = cv
                    coord = luts_ref[jnp.clip(zz, 0, 48)]
                    r = coord >> 3
                    c = coord & 7
                    bsr = _extract(bsr88, r, c)
                    nnzb = luts_ref[64 + jnp.clip(nz_left, 0, 49)]
                    exp_slice = (exp7_base + nnzb * e71 + zz * e72
                                 + bsr * e73)
                    rd, length = read_exponent(rd, exp_slice)

                    def dec_coef(cv2):
                        rd, here88, t = cv2
                        res_slice = res_base + coord * r71 + nnzb * r72
                        rd, sbit, cv_ = read_sign_residual(
                            rd, length, sign_base, res_slice, 9)
                        cv_ = cv_ | (1 << (length - 1))
                        cv_ = jnp.where(sbit == 0, -cv_, cv_)
                        sub = lax.broadcasted_iota(
                            jnp.int32, (8, LANES), 0)
                        lane = lax.broadcasted_iota(
                            jnp.int32, (8, LANES), 1)
                        here88 = jnp.where((sub == r) & (lane == c),
                                           cv_, here88)
                        return (rd, here88, jnp.int32(1))

                    rd, here88, _ = lax.while_loop(
                        lambda cv2: (cv2[2] == 0) & (length > 0),
                        dec_coef, (rd, here88, jnp.int32(0)))
                    nonzero = (length > 0).astype(jnp.int32)
                    nz_left = nz_left - nonzero
                    eob_x = jnp.maximum(eob_x,
                                        jnp.where(nonzero != 0, c, 0))
                    eob_y = jnp.maximum(eob_y,
                                        jnp.where(nonzero != 0, r, 0))
                    return (rd, zz + 1, nz_left, here88, eob_x, eob_y)

                rd, _, _, here88, eob_x, eob_y = lax.while_loop(
                    zz_cond, zz_body,
                    (rd, jnp.int32(0), nz7, zero88, jnp.int32(0),
                     jnp.int32(0)))

                # ---- edges (decode_one_edge :29-142), horizontal then
                # vertical
                nz73 = luts_ref[128 + jnp.clip(nz7, 0, 49)]  # (nz7+3)//7

                def edge(rd, here88, horizontal):
                    if horizontal:
                        zig15, delta, est_eob = 0, 1, eob_x
                        nb88, nb_has = above88, has_above
                        t0_, t1_, t2_, t3_ = h0, h1, h2, h3
                        nz_off = _OFF["nz_8x1"]
                    else:
                        zig15, delta, est_eob = 7, 8, eob_y
                        nb88, nb_has = left88, has_left
                        t0_, t1_, t2_, t3_ = v0, v1, v2, v3
                        nz_off = _OFF["nz_1x8"]
                    nz_slice = (nz_off + ci * t0_ + est_eob * t1_
                                + nz73 * t2_)
                    rd, cnt = read_tree(rd, 3, nz_slice, t3_)

                    def lane_cond(cv):
                        return (cv[1] < 7) & (cv[2] > 0)

                    def lane_body(cv):
                        rd, k, remaining, here88 = cv
                        band = (k + 1) * delta
                        # Lakhani prediction (model.hh:1033-1071)
                        if horizontal:
                            hx = _extract_col(here88, band)     # (8,1)
                            na = _extract_col(nb88, band)
                            ic = _extract_col(icxT, band)
                            iota8 = lax.broadcasted_iota(
                                jnp.int32, (8, 1), 0)
                        else:
                            hx = _extract_row(here88, band >> 3)
                            na = _extract_row(nb88, band >> 3)
                            ic = _extract_row(icy88, band >> 3)
                            iota8 = lax.broadcasted_iota(
                                jnp.int32, (1, LANES), 1)
                        live8 = (iota8 >= 1) & (iota8 < 8)
                        sgn = jnp.where((iota8 & 1) != 0, 1, -1)
                        hx = jnp.where(iota8 == 0, 0, hx)
                        ic0 = jnp.sum(jnp.where(iota8 == 0, ic, 0))
                        na0 = jnp.sum(jnp.where(iota8 == 0, na, 0))
                        pred = na0 * ic0 - jnp.sum(
                            jnp.where(live8, ic * (hx + sgn * na), 0))
                        bp = jnp.where(nb_has, _trunc_div(pred, ic0), 0)
                        absbp = jnp.abs(bp)
                        bsr = _bitlen_f32(jnp.minimum(absbp, 1023))
                        exp_slice = (expx_base + remaining * ex1
                                     + (zig15 + k) * ex2 + bsr * ex3)
                        rd, length = read_exponent(rd, exp_slice)

                        def dec_edge(cv2):
                            rd, here88, t = cv2
                            ctx1 = jnp.where(
                                bp == 0, 0, jnp.where(bp > 0, 1, 2))
                            sign_idx = sign_base + ctx1 * sg1 + bsr
                            rd, sbit = read(rd, sign_idx)
                            mt = _extract_lane(mnt, band)
                            t1v = jnp.minimum(absbp >> mt, 255)
                            t2v = jnp.minimum(length - mt, _RNF)
                            thresh_slice = rt_base + t1v * rt1 + t2v * rt2
                            res_slice = (res_base + band * r71
                                         + remaining * r72)

                            lo_e = length - 10     # 9 residual slots

                            def rcond(cv3):
                                return (cv3[1] >= 0) & (cv3[1] >= lo_e)

                            def rbody(cv3):
                                rd, i, acc, dsf = cv3
                                is_th = i >= mt
                                idx = jnp.where(is_th, thresh_slice + dsf,
                                                res_slice + i)
                                rd, bit = read(rd, idx)
                                acc = acc | (bit << i)
                                dsf = jnp.where(
                                    is_th,
                                    jnp.minimum((dsf << 1) | bit, _CAP),
                                    dsf)
                                return (rd, i - 1, acc, dsf)

                            rd, _, acc, _ = lax.while_loop(
                                rcond, rbody,
                                (rd, length - 2, jnp.int32(0),
                                 jnp.int32(1)))
                            acc = acc | (1 << (length - 1))
                            acc = jnp.where(sbit == 0, -acc, acc)
                            sub = lax.broadcasted_iota(
                                jnp.int32, (8, LANES), 0)
                            lane = lax.broadcasted_iota(
                                jnp.int32, (8, LANES), 1)
                            here88 = jnp.where(
                                (sub == (band >> 3)) & (lane == (band & 7)),
                                acc, here88)
                            return (rd, here88, jnp.int32(1))

                        rd, here88, _ = lax.while_loop(
                            lambda cv2: (cv2[2] == 0) & (length > 0),
                            dec_edge, (rd, here88, jnp.int32(0)))
                        remaining = remaining - (length > 0).astype(
                            jnp.int32)
                        return (rd, k + 1, remaining, here88)

                    rd, _, _, here88 = lax.while_loop(
                        lane_cond, lane_body,
                        (rd, jnp.int32(0), cnt, here88))
                    return rd, here88

                rd, here88 = edge(rd, here88, True)
                rd, here88 = edge(rd, here88, False)

                # ---- DC last (decoder.cc:243-287 + model.hh:674-784)
                pixels = _idct_ignore_dc(here88, q88)
                col0 = _extract_col(pixels, 0)
                col1 = _extract_col(pixels, 1)
                row0 = pixels[0:1, :]
                row1 = pixels[1:2, :]
                lanelt8 = lane1 < 8
                big = jnp.int32(1 << 30)

                est_l = _wrap16(sum_l_vert - _div2_tz(col0 - col1)
                                - (col0 + 1024))
                # above horiz summary stored at lanes 1..8: align to 0..7
                horiz_a = pltpu.roll(summ_a, LANES - 1, 1)  # left by 1
                est_a = _wrap16(horiz_a - _div2_tz(row0 - row1)
                                - (row0 + 1024))
                el = jnp.where(has_left, est_l, 0)
                ea = jnp.where(has_above & lanelt8, est_a, 0)
                mins = jnp.minimum(
                    jnp.min(jnp.where(has_left, est_l, big)),
                    jnp.min(jnp.where(has_above & lanelt8, est_a, big)))
                maxs = jnp.maximum(
                    jnp.max(jnp.where(has_left, est_l, -big)),
                    jnp.max(jnp.where(has_above & lanelt8, est_a, -big)))
                sum_le = jnp.sum(el)
                sum_ae = jnp.sum(ea)
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

                lm = jnp.minimum(_bitlen_f32(jnp.abs(unc)),
                                 C.NUMERIC_LENGTH_MAX - 1)
                lo = jnp.minimum(_bitlen_f32(jnp.abs(unc2)), 16)
                rd, length = read_exponent(
                    rd, _OFF["exp_dc"] + lm * ed0 + lo * ed1)
                sctx = jnp.where(unc2 < 0, 1,
                                 jnp.where(unc2 == 0, 3, 2))

                def dec_dc(cv2):
                    rd, _, t = cv2
                    rd, sbit, cv_ = read_sign_residual(
                        rd, length, sign_base + sctx,
                        _OFF["residual_noise_dc"] + lm * rd0, 10)
                    cv_ = cv_ | (1 << (length - 1))
                    cv_ = jnp.where(sbit == 0, -cv_, cv_)
                    return (rd, cv_, jnp.int32(1))

                rd, cv_dc, _ = lax.while_loop(
                    lambda cv2: (cv2[2] == 0) & (length > 0),
                    dec_dc, (rd, jnp.int32(0), jnp.int32(0)))
                max_value = 1 << (_MAXE - 1)
                adj = 2 * max_value + 1
                dc = cv_dc + pred_dc
                dc = jnp.where(dc < -max_value, dc + adj, dc)
                dc = jnp.where(dc > max_value, dc - adj, dc)
                sub = lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
                here88 = jnp.where((sub == 0) & (lane1 == 0), dc, here88)

                # ---- outgoing neighbor summary (NeighborSummary set_*)
                col7 = _extract_col(pixels, 7)
                col6 = _extract_col(pixels, 6)
                vert = (dc * q0 + col7 + 1024 + _div2_tz(col7 - col6))
                row7 = pixels[7:8, :]
                row6 = pixels[6:7, :]
                horiz = (dc * q0 + row7 + 1024 + _div2_tz(row7 - row6))
                summ_out = pltpu.roll(
                    jnp.where(lanelt8, _wrap16(horiz), 0), 1, 1)
                summ_out = jnp.where(lane1 == 0, nz7, summ_out)

                here_w = _wrap16(here88)
                ringc[pl.ds((ringbase + x) * 8, 8), :] = here_w
                rings[pl.ds(ringbase + x, 1), :] = summ_out
                coef_ref[pl.ds(fi0 + x, 1), :] = _flatten88(here88)

                return (rd, err, here_w, above88, _wrap16(vert), nz7)

            rd, err, _, _, _, _ = lax.fori_loop(
                0, width, blk_body,
                (rd, err, zero88, zero88, zero81, jnp.int32(0)))
            return (rd, err)

        _, err = lax.fori_loop(0, nrows, row_body,
                               ((rd), jnp.int32(0)))
        err_ref[s] = err

    return kernel


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------


def _build_luts():
    """Flat SMEM LUT: [0:49] unzigzag49, [64:114] nonzero_to_bin,
    [128:178] (n+3)//7."""
    luts = np.zeros(192, np.int32)
    luts[:49] = np.asarray([int(v) for v in C.UNZIGZAG49], np.int32)
    nzb = np.asarray([int(v) for v in C.NONZERO_TO_BIN], np.int32)
    luts[64:64 + len(nzb)] = nzb
    luts[128:178] = (np.arange(50) + 3) // 7
    return luts


def decode_segments_pallas(streams, plane_shapes, color_tables, mcuv,
                           max_coded_heights, component_sizes, splits_y,
                           color_index=None, interpret=False,
                           coder="vpx", template=None):
    """Decode per-segment VPX or ANS (v3) streams on the TPU via the
    Pallas kernel.

    Same contract as vpx_decode.decode_segments_tpu: returns (planes
    list of int16 [H_c, W_c, 64], err bool [S]).
    template: optional packed uint32 [ARENA_SIZE] trained-model start
    arena (LEPTON_COMPRESSION_MODEL) used as every segment's initial
    model state."""
    req = dict(streams=streams, plane_shapes=plane_shapes,
               color_tables=color_tables, mcuv=mcuv,
               max_coded_heights=max_coded_heights,
               component_sizes=component_sizes, splits_y=splits_y,
               color_index=color_index)
    (planes, err), = decode_segments_pallas_multi(
        [req], interpret=interpret, coder=coder, template=template)
    return planes, err


def decode_segments_pallas_multi(requests, interpret=False,
                                 coder="vpx", template=None):
    """Decode MANY containers' segments in ONE pallas_call: every
    request's segments become grid steps of a shared kernel invocation
    (the serving decode-batching design, VERDICT r4 item 5; matching
    socket_serve.cc:91-120 where both directions ride the same loop).

    Each request is a dict with keys streams, plane_shapes,
    color_tables, mcuv, max_coded_heights, component_sizes, splits_y,
    color_index.  Color tables concatenate into one global comp-table
    space (rowdesc lane 6 = comp_tab); ring/output indexing stays
    lane-local, so VMEM scratch is sized by the largest single image,
    not the batch.  Grid and table dims bucket so warm serving reuses
    compiled shapes.  Returns a list of (planes, err) per request."""
    from .encode_pipeline import plan_rows

    def _bucket(v, q):
        """Round block dims up: Mosaic requires 8-divisible sublane
        block shapes, and coarse buckets keep the per-geometry compile
        cache small (compiles cost minutes through the tunnel)."""
        return (v + q - 1) // q * q

    lane_rows = []                 # global lanes across requests
    lane_rowmap = []
    lane_req = []
    req_geom = []
    comp_base = 0
    Wmax = 64
    max_comp_rows = 1
    ncomp_ring = 1
    for ri, rq in enumerate(requests):
        plane_shapes = rq["plane_shapes"]
        ncomp = len(plane_shapes)
        heights = [h for h, _ in plane_shapes]
        widths = [w for _, w in plane_shapes]
        Wmax = max(Wmax, _bucket(max(widths), 64))
        ncomp_ring = max(ncomp_ring, ncomp)
        plans = plan_rows(heights, rq["mcuv"], rq["max_coded_heights"],
                          rq["splits_y"])
        assert len(plans) == len(rq["streams"]), \
            (len(plans), len(rq["streams"]))
        for plan in plans:
            per = {}
            for comp, y in plan:
                per[comp] = per.get(comp, 0) + 1
            if per:
                max_comp_rows = max(max_comp_rows, max(per.values()))
        req_geom.append((plans, heights, widths, comp_base, ncomp))
        comp_base += ncomp
    ncomp_tab = _bucket(comp_base, 4)
    n_flat = _bucket(ncomp_ring * max_comp_rows * Wmax, 512)

    # per-lane row descriptors (the same geometry as the XLA wrapper's
    # per-block lists, lifted to row granularity for the in-kernel loop)
    for ri, rq in enumerate(requests):
        plans, heights, widths, cbase, ncomp = req_geom[ri]
        color_index = rq.get("color_index")
        component_sizes = rq["component_sizes"]
        for plan in plans:
            seen_first = {}
            rows = []
            rowmap = []
            for comp, y in plan:
                if comp not in seen_first:
                    seen_first[comp] = y
                local_row = y - seen_first[comp]
                fi0 = (comp * max_comp_rows + local_row) * Wmax
                W = widths[comp]
                width = max(0, min(W, component_sizes[comp] - y * W))
                ci = (0 if comp == 0 else 1) if color_index is None \
                    else color_index(comp)
                rows.append((comp, ci, width,
                             int(y != seen_first[comp]), fi0,
                             0, cbase + comp))
                rowmap.append((comp, y, fi0))
            lane_rows.append(rows)
            lane_rowmap.append(rowmap)
            lane_req.append(ri)

    # dummy lanes (nrows == 0) bucket the grid for serving-shape reuse;
    # single-container calls keep the exact segment count (a dummy lane
    # still pays the arena/coef init writes per grid step)
    S = _bucket(len(lane_rows), 8) if len(requests) > 1 \
        else max(1, len(lane_rows))
    Tmax = _bucket(max(1, max(len(r) for r in lane_rows)), 64)
    rowdesc = np.zeros((S, Tmax, LANES), np.int32)
    meta = np.zeros((S, 8), np.int32)
    for s_i, rows in enumerate(lane_rows):
        meta[s_i, 1] = len(rows)
        for t, f in enumerate(rows):
            rowdesc[s_i, t, :7] = f

    all_streams = [b for rq in requests for b in rq["streams"]]
    if coder == "ans":
        # little-endian uint32 words, one per element; meta[s,0] = word
        # count (short trailing bytes zero-fill, like ANSReader)
        word_lists = []
        for b in all_streams:
            if len(b) % 4:
                b = b + b"\x00" * (4 - len(b) % 4)
            word_lists.append(np.frombuffer(b, np.uint32))
        Lmax = max(4, max(len(w) for w in word_lists))
        Lrows = _bucket((Lmax + LANES - 1) // LANES, 64)
        data = np.zeros((S, Lrows, LANES), np.uint32)
        for s_i, w in enumerate(word_lists):
            data[s_i].reshape(-1)[:len(w)] = w
            meta[s_i, 0] = len(w)
        data = data.view(np.int32)
    else:
        Lmax = max(1, max(len(b) for b in all_streams))
        Lrows = _bucket((Lmax + LANES - 1) // LANES, 64)
        data = np.zeros((S, Lrows, LANES), np.int32)
        for s_i, b in enumerate(all_streams):
            arr = np.frombuffer(b, np.uint8).astype(np.int32)
            data[s_i].reshape(-1)[:len(arr)] = arr
            meta[s_i, 0] = len(b)

    q88 = np.zeros((ncomp_tab * 8, LANES), np.int32)
    qflat = np.zeros((ncomp_tab, LANES), np.int32)
    icxT = np.zeros((ncomp_tab * 8, LANES), np.int32)
    icy88 = np.zeros((ncomp_tab * 8, LANES), np.int32)
    mnt = np.zeros((ncomp_tab, LANES), np.int32)
    qflat[:, :64] = 1                  # dummy comps: q=1, never read
    for ri, rq in enumerate(requests):
        cbase, ncomp = req_geom[ri][3], req_geom[ri][4]
        for c0 in range(ncomp):
            c = cbase + c0
            ct = rq["color_tables"][c0]
            q = np.asarray(ct.quant, np.int32)
            q88[c * 8:(c + 1) * 8, :8] = q.reshape(8, 8)
            qflat[c, :64] = q
            ix = np.asarray(ct.icos_idct_edge_8192_dequantized_x,
                            np.int32)
            # transposed-88: column j = icos_x[j*8 + i]
            icxT[c * 8:(c + 1) * 8, :8] = ix.reshape(8, 8).T
            iy = np.asarray(ct.icos_idct_edge_8192_dequantized_y,
                            np.int32)
            icy88[c * 8:(c + 1) * 8, :8] = iy.reshape(8, 8)
            mnt[c, :64] = np.asarray(ct.min_noise_threshold, np.int32)

    luts = _build_luts()
    fn = _jit_decode(S, Tmax, Lrows, n_flat, Wmax, ncomp_ring, interpret,
                     coder, template is not None,
                     multi=len(requests) > 1)
    args = [
        jnp.asarray(luts), jnp.asarray(meta),
        jnp.asarray(rowdesc.reshape(S * Tmax, LANES)),
        jnp.asarray(data.reshape(S * Lrows, LANES)),
        jnp.asarray(q88), jnp.asarray(qflat), jnp.asarray(icxT),
        jnp.asarray(icy88), jnp.asarray(mnt)]
    if template is not None:
        tpl2d = np.zeros(AR_ROWS * LANES, np.uint32)
        tpl2d[:ARENA_SIZE] = np.asarray(template, np.uint32)
        args.append(jnp.asarray(
            tpl2d.view(np.int32).reshape(AR_ROWS, LANES)))
    coef, err = fn(*args)

    coef_np = np.asarray(coef).reshape(S, n_flat, LANES)[:, :, :64] \
        .astype(np.int16)
    err_np = np.asarray(err).astype(bool)
    out = []
    s_i = 0
    for ri, rq in enumerate(requests):
        _, heights, widths, _, ncomp = req_geom[ri]
        planes = [np.zeros((heights[c], widths[c], 64), np.int16)
                  for c in range(ncomp)]
        nseg = len(rq["streams"])
        for k in range(nseg):
            for comp, y, fi0 in lane_rowmap[s_i + k]:
                W = widths[comp]
                planes[comp][y, :W] = coef_np[s_i + k, fi0:fi0 + W]
        out.append((planes, err_np[s_i:s_i + nseg]))
        s_i += nseg
    return out


from functools import lru_cache


@lru_cache(maxsize=32)
def _jit_decode(S, Tmax, Lrows, n_flat, Wmax, ncomp, interpret,
                coder="vpx", templated=False, multi=False):
    """jit-wrapped pallas_call per static geometry: tracing the (large)
    kernel costs seconds in Python, so it must happen once per shape,
    not per call."""
    kernel = _build_kernel(S, Tmax, Lrows, n_flat, Wmax, ncomp, coder,
                           templated, multi)

    in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),        # luts
            pl.BlockSpec(memory_space=pltpu.SMEM),        # meta [S,8]
            pl.BlockSpec((Tmax, LANES), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),        # rowdesc
            pl.BlockSpec((Lrows, LANES), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),        # data
            pl.BlockSpec(memory_space=pltpu.VMEM),        # q88
            pl.BlockSpec(memory_space=pltpu.VMEM),        # qflat
            pl.BlockSpec(memory_space=pltpu.VMEM),        # icxT
            pl.BlockSpec(memory_space=pltpu.VMEM),        # icy88
            pl.BlockSpec(memory_space=pltpu.VMEM),        # mnt
    ]
    if templated:
        in_specs.append(
            pl.BlockSpec(memory_space=pltpu.VMEM))        # template
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(S,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((n_flat, LANES), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),        # coef
            pl.BlockSpec(memory_space=pltpu.SMEM),        # err [S]
        ),
        scratch_shapes=[
            pltpu.VMEM((AR_ROWS, LANES), jnp.int32),      # arena
            pltpu.VMEM((ncomp * Wmax * 8, LANES), jnp.int32),  # ringc
            pltpu.VMEM((ncomp * Wmax, LANES), jnp.int32),      # rings
        ],
    )
    return jax.jit(pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((S * n_flat, LANES), jnp.int32),
            jax.ShapeDtypeStruct((S,), jnp.int32),
        ),
        # the v5e has 128MB VMEM; the default 16MB scoped limit is far
        # below the resident arena + coefficient slab design point
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    ))
