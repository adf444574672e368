"""Phase-A2 TPU kernel: symbolization — coefficients to (branch, bit) streams.

On encode every symbol the token codec emits is a pure function of the
(fully known) coefficient planes: neighbor summaries, averages, Lakhani and
DC predictions all derive from coefficients, and the serial bookkeeping of
serialize_tokens (nz_left countdown, exponent unary, threshold so_far) is
prefix-computable.  So the whole of serialize_tokens
(reference src/vp8/encoder/encoder.cc:195-402, encode_one_edge :41-164)
vectorizes over all blocks of a segment slice at once — the zigzag position
axis is vectorized too (cumsum prefix for the nz_left countdown), keeping
the compiled graph small.

Layout: each block emits a fixed BLOCK_SLOTS-wide padded row of
(branch_index, bit); invalid slots carry idx == PAD and compaction drops
them.  Flattening [rows, width, BLOCK_SLOTS] row-major reproduces the exact
serial emission order of codec/blocks.py (the semantics reference), which
the tests diff against the native C symbolizer.

Slot budget per block (legal baseline JPEG coefficients are <= 10 bits;
the reference aborts encode with COEFFICIENT_OUT_OF_RANGE otherwise,
encoder.cc:124-126, and compress() verifies by default):

  nz 7x7 tree         6
  49 interior coefs   49 x (11 exp + 1 sign + 9 residual) = 1029
  2 edges             2 x (3 tree + 7 x 21)               = 300
  DC                  11 exp + 1 sign + 10 residual       = 22
  total               1357
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .. import constants as C
from ..model.tables import TABLE_OFFSETS, TABLE_STRIDES
from .contexts import phase_a
from .vpx_scan import PAD

COEF_SLOTS = 21            # 11 exp + 1 sign + 9 residual
DC_SLOTS = 22              # 11 exp + 1 sign + 10 residual
EDGE_SLOTS = 3 + 7 * COEF_SLOTS
BLOCK_SLOTS = 6 + 49 * COEF_SLOTS + 2 * EDGE_SLOTS + DC_SLOTS

_OFF = {k: int(v) for k, v in TABLE_OFFSETS.items()}
_STR = {k: tuple(int(s) for s in v) for k, v in TABLE_STRIDES.items()}
_UNZIG49_NP = np.asarray([int(v) for v in C.UNZIGZAG49], dtype=np.int32)
_NZ_BIN_NP = np.asarray([int(v) for v in C.NONZERO_TO_BIN], dtype=np.int32)
_MAXE = C.MAX_EXPONENT


def _bitlen(v: jnp.ndarray) -> jnp.ndarray:
    """bit_length of non-negative int32 (0 -> 0)."""
    return jnp.where(v > 0, 32 - lax.clz(v.astype(jnp.int32)), 0)


def _bsr_prior(prior: jnp.ndarray) -> jnp.ndarray:
    """Bucketing of a prediction magnitude (blocks._bsr_best_prior):
    bit_length of |prior| clamped to 1023."""
    return _bitlen(jnp.minimum(jnp.abs(prior), 1023))


def _exp_block(active, length, exp_slice):
    """Unary exponent slots: bit (length != i) at exp_slice + i for
    i = 0..min(length, MAX_EXPONENT-1) (encoder.cc put-with-terminator).
    active/length/exp_slice: [...]; returns idx/bit [..., MAX_EXPONENT]."""
    i = jnp.arange(_MAXE, dtype=jnp.int32)
    valid = active[..., None] & (i <= length[..., None])
    idx = jnp.where(valid, exp_slice[..., None] + i, PAD)
    bit = (length[..., None] != i).astype(jnp.uint8)
    return idx, bit


def _res_block(active, length, abs_coef, res_slice, nslots):
    """Plain residual bits: slot j holds bit i = length-2-j at
    res_slice + i (encoder.cc:276-283 noise-floor bits)."""
    j = jnp.arange(nslots, dtype=jnp.int32)
    i = length[..., None] - 2 - j
    valid = active[..., None] & (i >= 0)
    safe_i = jnp.maximum(i, 0)
    idx = jnp.where(valid, res_slice[..., None] + safe_i, PAD)
    bit = ((abs_coef[..., None] >> safe_i) & 1).astype(jnp.uint8)
    return idx, bit


def _tree_bits(value, nbits, base, stride):
    """MSB-first binary-tree coding: bit (value>>i)&1 at
    base + i*stride + (value >> (i+1)) for i = nbits-1..0
    (encoder.cc:205-213 so_far accumulation)."""
    idxs, bits = [], []
    for i in range(nbits - 1, -1, -1):
        idxs.append(base + i * stride + (value >> (i + 1)))
        bits.append(((value >> i) & 1).astype(jnp.uint8))
    idx = jnp.stack(idxs, axis=-1)
    bit = jnp.stack(bits, axis=-1)
    return idx, bit


@partial(jax.jit, static_argnames=("ci",))
def symbolize_slice(coefs: jnp.ndarray, ci: int, quant: jnp.ndarray,
                    icos_x, icos_y, min_noise_threshold,
                    row_block_offset: jnp.ndarray,
                    size_limit: jnp.ndarray,
                    row_has_above: jnp.ndarray = None):
    """Symbolize one component plane (or segment slice of it).

    coefs: int16 [R, W, 64] raster coefficients.
    ci: static color index (0 luma / 1 chroma).
    icos_x/icos_y/min_noise_threshold: ColorTables arrays (traced, NOT
    static: one compile serves every quant table at a given geometry --
    per-qtable recompiles made heterogeneous serving batches compile
    per quality level).
    row_has_above: bool [R]; False rows get no above-context (segment-top
    rows -- the is_top_row reset of lepton_codec.hh:173-181).  Default:
    every row but row 0.  Passing the whole plane with segment-start rows
    masked serves any segmentation with one compile.
    row_block_offset/size_limit: traced scalars for truncated images
    (early EOF): blocks with row_block_offset + flat_index >= size_limit
    emit nothing (uncompressed_components truncation bookkeeping).

    Returns (idx int32 [R, W, BLOCK_SLOTS], bit uint8 same): flattened
    row-major this is the exact serial emission order.
    """
    R, W = coefs.shape[0], coefs.shape[1]
    icx = jnp.asarray(icos_x, dtype=jnp.int32)
    icy = jnp.asarray(icos_y, dtype=jnp.int32)
    pa = phase_a(coefs, quant, icx, icy, row_has_above)
    coefs32 = coefs.astype(jnp.int32)                    # [R, W, 64]
    nz_bin_lut = jnp.asarray(_NZ_BIN_NP)
    unzig = jnp.asarray(_UNZIG49_NP)
    has_left = (jnp.arange(W) > 0)[None, :]
    if row_has_above is None:
        has_above = (jnp.arange(R) > 0)[:, None]
    else:
        has_above = row_has_above.astype(bool)[:, None]

    flat = jnp.arange(R * W, dtype=jnp.int32).reshape(R, W)
    block_live = (row_block_offset + flat) < size_limit

    nz7 = pa["nz7x7"].astype(jnp.int32)                  # [R, W]
    aavrg = pa["aavrg"]                                  # [R, W, 64]
    lak = pa["lak"]                                      # [R, W, 14]

    pieces_idx = []
    pieces_bit = []

    def emit(idx, bit):
        """idx/bit: [R, W, k] appended in serial order."""
        pieces_idx.append(jnp.where(block_live[..., None], idx, PAD))
        pieces_bit.append(bit)

    # ---- 7x7 nonzero count, 6-bit binary tree (encoder.cc:200-213)
    nz_left_blk = jnp.pad(nz7[:, :-1], ((0, 0), (1, 0)))
    nz_above_blk = jnp.pad(nz7[:-1, :], ((1, 0), (0, 0)))
    nz_ctx = jnp.where(
        has_left & has_above, (nz_above_blk + nz_left_blk + 2) // 4,
        jnp.where(has_above, (nz_above_blk + 1) // 2,
                  jnp.where(has_left, (nz_left_blk + 1) // 2, 0)))
    s70, s71, s72, _ = _STR["nz_7x7"]
    nz_base = _OFF["nz_7x7"] + ci * s70 + nz_bin_lut[nz_ctx] * s71
    emit(*_tree_bits(nz7, 6, nz_base, s72))

    # ---- 49 interior coefficients, zigzag axis vectorized
    # (encoder.cc:216-285): nz_left via exclusive prefix count, the
    # "while nz_left" break is the active mask.
    e70, e71, e72, e73, _ = _STR["exp_7x7"]
    r70, r71, r72, _ = _STR["residual_noise"]
    res_base = _OFF["residual_noise"] + ci * r70
    sg0, sg1, _ = _STR["sign"]
    sign_base = _OFF["sign"] + ci * sg0

    czz = jnp.take(coefs32, unzig, axis=-1)              # [R, W, 49]
    azz = jnp.abs(czz)
    nonzero = (czz != 0).astype(jnp.int32)
    prefix = jnp.cumsum(nonzero, axis=-1) - nonzero      # exclusive
    nz_left = nz7[..., None] - prefix                    # [R, W, 49]
    active = nz_left > 0
    length = _bitlen(azz)
    bsr = _bsr_prior(jnp.take(aavrg, unzig, axis=-1))
    nnzb = nz_bin_lut[jnp.clip(nz_left, 0, 49)]
    zz_idx = jnp.arange(49, dtype=jnp.int32)
    exp_slice = (_OFF["exp_7x7"] + ci * e70 + nnzb * e71
                 + zz_idx * e72 + bsr * e73)
    exp_i, exp_b = _exp_block(active, length, exp_slice)  # [R,W,49,11]
    sign_valid = active & (length > 0)
    sign_i = jnp.where(sign_valid, sign_base, PAD)[..., None]
    sign_b = (czz >= 0).astype(jnp.uint8)[..., None]
    res_slice = res_base + unzig * r71 + nnzb * r72
    res_i, res_b = _res_block(active, length, azz, res_slice, 9)
    interior_i = jnp.concatenate([exp_i, sign_i, res_i], axis=-1)
    interior_b = jnp.concatenate([exp_b, sign_b, res_b], axis=-1)
    emit(interior_i.reshape(R, W, 49 * COEF_SLOTS),
         interior_b.reshape(R, W, 49 * COEF_SLOTS))

    eob_x = jnp.max(jnp.where(czz != 0, unzig & 7, 0), axis=-1)
    eob_y = jnp.max(jnp.where(czz != 0, unzig >> 3, 0), axis=-1)

    # ---- edges: horizontal (coords 1..7) then vertical (8..56)
    # (encoder.cc:166-184, encode_one_edge :41-164)
    ex0, ex1, ex2, ex3, _ = _STR["exp_x"]
    expx_base = _OFF["exp_x"] + ci * ex0
    rt0, rt1, rt2, _ = _STR["residual_thresh"]
    rt_base = _OFF["residual_thresh"] + ci * rt0
    cap = (1 << C.RESIDUAL_NOISE_FLOOR) - 1

    for horizontal in (True, False):
        if horizontal:
            coords_np = np.arange(1, 8, dtype=np.int32)
            zig15 = 0
            tbl = "nz_8x1"
            est_eob = eob_x
            lak_lane0 = 0
        else:
            coords_np = np.arange(8, 64, 8, dtype=np.int32)
            zig15 = 7
            tbl = "nz_1x8"
            est_eob = eob_y
            lak_lane0 = 7
        coords = jnp.asarray(coords_np)
        ce = jnp.take(coefs32, coords, axis=-1)          # [R, W, 7]
        ae = jnp.abs(ce)
        nonzero_e = (ce != 0).astype(jnp.int32)
        cnt = jnp.sum(nonzero_e, axis=-1)                # [R, W]
        n0, n1, n2, n3, _ = _STR[tbl]
        nz_slice = (_OFF[tbl] + ci * n0 + est_eob * n1
                    + ((nz7 + 3) // 7) * n2)
        emit(*_tree_bits(cnt, 3, nz_slice, n3))

        eprefix = jnp.cumsum(nonzero_e, axis=-1) - nonzero_e
        remaining = cnt[..., None] - eprefix             # [R, W, 7]
        active_e = remaining > 0
        length_e = _bitlen(ae)
        bp = lak[..., lak_lane0:lak_lane0 + 7]
        bsr_e = _bsr_prior(bp)
        lane = jnp.arange(7, dtype=jnp.int32)
        exp_slice_e = (expx_base + remaining * ex1
                       + (zig15 + lane) * ex2 + bsr_e * ex3)
        exp_i, exp_b = _exp_block(active_e, length_e, exp_slice_e)
        ctx1 = jnp.where(bp == 0, 0, jnp.where(bp > 0, 1, 2))
        sign_valid = active_e & (ce != 0)
        sign_i = jnp.where(sign_valid,
                           sign_base + ctx1 * sg1 + bsr_e, PAD)[..., None]
        sign_b = (ce >= 0).astype(jnp.uint8)[..., None]

        # residual: threshold-contexted bits above the per-coord noise
        # floor (serial so_far chain, <= 9 bits), then plain noise bits
        # (encoder.cc:131-160)
        mt = jnp.asarray(min_noise_threshold, dtype=jnp.int32)[
            jnp.asarray(coords_np)]
        t1 = jnp.minimum(jnp.abs(bp) >> mt, 255)
        t2 = jnp.minimum(length_e - mt, C.RESIDUAL_NOISE_FLOOR)
        thresh_slice = rt_base + t1 * rt1 + t2 * rt2
        res_slice_e = res_base + coords * r71 + remaining * r72
        so_far = jnp.ones_like(remaining)
        res_is, res_bs = [], []
        for j in range(9):
            i = length_e - 2 - j
            valid = active_e & (i >= 0)
            safe_i = jnp.maximum(i, 0)
            bit = (ae >> safe_i) & 1
            is_thresh = i >= mt
            idx = jnp.where(is_thresh, thresh_slice + so_far,
                            res_slice_e + safe_i)
            res_is.append(jnp.where(valid, idx, PAD))
            res_bs.append(bit.astype(jnp.uint8))
            so_far = jnp.where(valid & is_thresh,
                               jnp.minimum((so_far << 1) | bit, cap),
                               so_far)
        res_i = jnp.stack(res_is, axis=-1)
        res_b = jnp.stack(res_bs, axis=-1)
        edge_i = jnp.concatenate([exp_i, sign_i, res_i], axis=-1)
        edge_b = jnp.concatenate([exp_b, sign_b, res_b], axis=-1)
        emit(edge_i.reshape(R, W, 7 * COEF_SLOTS),
             edge_b.reshape(R, W, 7 * COEF_SLOTS))

    # ---- DC last (encoder.cc:293-364): delta vs the pixel-domain
    # prediction, wrapped into [-1024, 1024] (model.hh:823-832)
    dc = coefs32[..., 0]
    delta = dc - pa["dc_pred"]
    max_value = 1 << (_MAXE - 1)
    adj = 2 * max_value + 1
    delta = jnp.where(delta < -max_value, delta + adj, delta)
    delta = jnp.where(delta > max_value, delta - adj, delta)
    a_dc = jnp.abs(delta)
    length_dc = _bitlen(a_dc)
    lm = jnp.minimum(_bitlen(jnp.abs(pa["uncertainty"])),
                     C.NUMERIC_LENGTH_MAX - 1)
    lo = jnp.minimum(_bitlen(jnp.abs(pa["uncertainty2"])), 16)
    ed0, ed1, _ = _STR["exp_dc"]
    exp_slice_dc = _OFF["exp_dc"] + lm * ed0 + lo * ed1
    always = jnp.ones((R, W), bool)
    exp_i, exp_b = _exp_block(always, length_dc, exp_slice_dc)
    unc2 = pa["uncertainty2"]
    sctx = jnp.where(unc2 < 0, 1, jnp.where(unc2 == 0, 3, 2))
    sign_i = jnp.where(length_dc > 0, sign_base + sctx, PAD)[..., None]
    sign_b = (delta >= 0).astype(jnp.uint8)[..., None]
    rd0, _ = _STR["residual_noise_dc"]
    res_slice_dc = _OFF["residual_noise_dc"] + lm * rd0
    res_i, res_b = _res_block(always, length_dc, a_dc, res_slice_dc, 10)
    emit(jnp.concatenate([exp_i, sign_i, res_i], axis=-1),
         jnp.concatenate([exp_b, sign_b, res_b], axis=-1))

    idx = jnp.concatenate(pieces_idx, axis=-1)           # [R, W, BLOCK_SLOTS]
    bit = jnp.concatenate(pieces_bit, axis=-1)
    return idx, bit


@partial(jax.jit, static_argnames=("out_size",))
def compact_symbols(idx_flat: jnp.ndarray, bit_flat: jnp.ndarray,
                    out_size: int):
    """Drop PAD slots, preserving order: the stream-assembly scatter.
    Returns (idx [out_size], bit [out_size], count); slots past count
    are PAD."""
    valid = idx_flat != PAD
    pos = jnp.cumsum(valid) - 1
    tgt = jnp.where(valid, pos, out_size)
    out_idx = jnp.full((out_size + 1,), PAD, dtype=jnp.int32)
    out_bit = jnp.zeros((out_size + 1,), dtype=jnp.uint8)
    out_idx = out_idx.at[tgt].set(idx_flat)
    out_bit = out_bit.at[tgt].set(bit_flat)
    return out_idx[:out_size], out_bit[:out_size], jnp.sum(valid)


@partial(jax.jit, static_argnames=("out_size",))
def compact_symbols_packed(idx_flat: jnp.ndarray, bit_flat: jnp.ndarray,
                           out_size: int):
    """Like compact_symbols but packs (idx, bit) into ONE int32 stream
    (idx<<1 | bit): the compaction scatter is the batch-encode floor on
    TPU, and one scattered array halves it.  Arithmetic shifts keep the
    negative sentinels intact: unpack idx = packed >> 1, bit = packed & 1
    (PAD -1 -> packed -2/-1 -> idx -1; FIXED_PROB -2 -> -4/-3 -> -2)."""
    valid = idx_flat != PAD
    packed = (idx_flat << 1) | bit_flat.astype(jnp.int32)
    pos = jnp.cumsum(valid) - 1
    tgt = jnp.where(valid, pos, out_size)
    out = jnp.full((out_size + 1,), PAD * 2, dtype=jnp.int32)
    out = out.at[tgt].set(packed)
    return out[:out_size], jnp.sum(valid)


@jax.jit
def row_symbol_counts(idx: jnp.ndarray):
    """Valid-symbol count per block row of the padded [R, W, S] array."""
    return jnp.sum(idx != PAD, axis=(1, 2))
