"""Phase-A TPU kernels: all model contexts as batched array programs.

The encode-side insight (SURVEY.md section 7): every context the token codec
needs -- neighbor summaries, aavrg averages, Lakhani DCT predictions, the
pixel-domain DC prediction -- is a pure function of the (fully known)
coefficients, so it vectorizes over *all blocks at once*.  The fixed-point
IDCT and the Lakhani predictions are 8x8 basis contractions, i.e. matmuls
that run on the MXU.

All integer arithmetic matches the scalar reference semantics exactly
(int32 wraparound, truncation-toward-zero, uint16 masking), so phase-A
outputs can drive the bit-exact phase-B coder.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .. import constants as C

# ---------------------------------------------------------------------------
# Fixed-point IDCT as two 8x8 stage-structured passes, batched over blocks.
# A direct basis-matmul would change rounding; the reference's staged
# butterflies with intermediate >> shifts must be replicated exactly.
# ---------------------------------------------------------------------------


def _idct_rows(c: jnp.ndarray, ignore_dc: bool) -> jnp.ndarray:
    """Horizontal pass: c is int32 [..., 8, 8] dequantized coefficients."""
    if ignore_dc:
        c = c.at[..., 0, 0].set(0)
    x0 = (c[..., :, 0] << 11) + 128
    x1 = c[..., :, 4] << 11
    x2, x3, x4 = c[..., :, 6], c[..., :, 2], c[..., :, 1]
    x5, x6, x7 = c[..., :, 7], c[..., :, 5], c[..., :, 3]
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
    return jnp.stack([
        (x7 + x1) >> 8, (x3 + x2) >> 8, (x0 + x4) >> 8, (x8 + x6) >> 8,
        (x8 - x6) >> 8, (x0 - x4) >> 8, (x3 - x2) >> 8, (x7 - x1) >> 8,
    ], axis=-1)


def _idct_cols(inter: jnp.ndarray) -> jnp.ndarray:
    y0 = (inter[..., 0, :] << 8) + 8192
    y1 = inter[..., 4, :] << 8
    y2, y3, y4 = inter[..., 6, :], inter[..., 2, :], inter[..., 1, :]
    y5, y6, y7 = inter[..., 7, :], inter[..., 5, :], inter[..., 3, :]
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
    return jnp.stack([
        (y7 + y1) >> 11, (y3 + y2) >> 11, (y0 + y4) >> 11, (y8 + y6) >> 11,
        (y8 - y6) >> 11, (y0 - y4) >> 11, (y3 - y2) >> 11, (y7 - y1) >> 11,
    ], axis=-2)


def idct_blocks(coefs: jnp.ndarray, quant: jnp.ndarray,
                ignore_dc: bool = True) -> jnp.ndarray:
    """Batched fixed-point IDCT.  coefs int16/int32 [..., 64] raster,
    quant int32 [64].  Returns int16 pixels [..., 64] scaled by 8."""
    c = (coefs.astype(jnp.int32) * quant.astype(jnp.int32)).reshape(
        coefs.shape[:-1] + (8, 8))
    inter = _idct_rows(c, ignore_dc)
    out = _idct_cols(inter)
    return out.reshape(coefs.shape[:-1] + (64,)).astype(jnp.int16)


def _div2_toward_zero(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sign(v) * (jnp.abs(v) >> 1)


def neighbor_summaries(coefs: jnp.ndarray, quant: jnp.ndarray):
    """Per-block outgoing edge pixels + nonzero counts, all blocks at once.

    coefs: int16 [H, W, 64] raster.  Returns (nz7x7 uint8 [H, W],
    edges int16 [H, W, 16]) matching NeighborSummary (block_context.hh).
    """
    pixels = idct_blocks(coefs, quant, ignore_dc=True).astype(jnp.int32)
    dc = coefs[..., 0].astype(jnp.int32)
    q0 = quant[0].astype(jnp.int32)
    px = pixels.reshape(pixels.shape[:-1] + (8, 8))
    # vertical (right edge): col 7, delta vs col 6
    vcur = px[..., :, 7]
    vdelta = vcur - px[..., :, 6]
    vert = dc[..., None] * q0 + vcur + 1024 + _div2_toward_zero(vdelta)
    # horizontal (bottom edge): row 7, delta vs row 6
    hcur = px[..., 7, :]
    hdelta = hcur - px[..., 6, :]
    horiz = dc[..., None] * q0 + hcur + 1024 + _div2_toward_zero(hdelta)
    edges = jnp.concatenate([vert, horiz], axis=-1).astype(jnp.int16)

    grid = coefs.reshape(coefs.shape[:-1] + (8, 8))
    nz7 = jnp.sum(grid[..., 1:, 1:] != 0, axis=(-1, -2)).astype(jnp.uint8)
    return nz7, edges, pixels.astype(jnp.int16)


def aavrg_all(coefs: jnp.ndarray) -> jnp.ndarray:
    """Weighted neighbor-abs averages for every block and coefficient.

    coefs int16 [H, W, 64] -> int32 [H, W, 64]; edge rows/cols follow the
    reduced-neighbor formulas (model.hh:852-871) with uint16 truncation.
    """
    a = jnp.abs(coefs.astype(jnp.int32))
    left = jnp.pad(a[:, :-1], ((0, 0), (1, 0), (0, 0)))
    above = jnp.pad(a[:-1, :], ((1, 0), (0, 0), (0, 0)))
    aboveleft = jnp.pad(a[:-1, :-1], ((1, 0), (1, 0), (0, 0)))
    H, W = a.shape[0], a.shape[1]
    has_left = (jnp.arange(W) > 0)[None, :, None]
    has_above = (jnp.arange(H) > 0)[:, None, None]
    both = ((13 * (left + above) + 6 * aboveleft) & 0xFFFF) >> 5
    only_left = left
    only_above = above
    return jnp.where(has_left & has_above, both,
                     jnp.where(has_left, only_left,
                               jnp.where(has_above, only_above, 0)))


def lak_all(coefs: jnp.ndarray, icos_x: jnp.ndarray,
            icos_y: jnp.ndarray) -> jnp.ndarray:
    """Lakhani predictions for the 14 edge coefficients of every block.

    Returns int32 [H, W, 14]: lanes 0..6 horizontal (coords 1..7),
    lanes 7..13 vertical (coords 8..56).  The per-band contraction is an
    8-point dot product against the dequantized cosine basis (MXU-friendly).
    """
    c = coefs.astype(jnp.int32).reshape(coefs.shape[:-1] + (8, 8))
    above = jnp.pad(c[:-1], ((1, 0), (0, 0), (0, 0), (0, 0)))
    left = jnp.pad(c[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
    H, W = c.shape[0], c.shape[1]
    has_above = (jnp.arange(H) > 0)[:, None, None]
    has_left = (jnp.arange(W) > 0)[None, :, None]
    sign = jnp.where(jnp.arange(8) & 1, 1, -1).astype(jnp.int32)  # (-1)^i+1

    # horizontal: band b in 1..7; columns of here/above at col b
    bands = jnp.arange(1, 8)
    here_cols = c[..., :, :]  # [H, W, 8row, 8col]
    x_h = jnp.moveaxis(here_cols[..., :, 1:8], -1, -2)   # [H, W, 7band, 8row]
    a_h = jnp.moveaxis(above[..., :, 1:8], -1, -2)
    icosx = icos_x.reshape(8, 8)[1:8]                    # [7band, 8]
    x_h = x_h.at[..., 0].set(0)
    # pred = a0*icos0 - sum_{i>=1} icos_i*(x_i + s_i*a_i)
    pred_h = a_h[..., 0] * icosx[None, None, :, 0] - jnp.sum(
        icosx[None, None, :, 1:] * (x_h[..., 1:] + sign[1:][None, None, None]
                                    * a_h[..., 1:]), axis=-1)
    den_h = icosx[:, 0][None, None]
    pred_h = jnp.where(has_above,
                       jnp.sign(pred_h) * (jnp.abs(pred_h) // den_h), 0)

    # vertical: band 8k, k in 1..7; rows of here/left at row k
    x_v = c[..., 1:8, :]                                  # [H, W, 7band, 8col]
    a_v = left[..., 1:8, :]
    icosy = icos_y.reshape(8, 8)[1:8]
    x_v = x_v.at[..., 0].set(0)
    pred_v = a_v[..., 0] * icosy[None, None, :, 0] - jnp.sum(
        icosy[None, None, :, 1:] * (x_v[..., 1:] + sign[1:][None, None, None]
                                    * a_v[..., 1:]), axis=-1)
    den_v = icosy[:, 0][None, None]
    pred_v = jnp.where(has_left,
                       jnp.sign(pred_v) * (jnp.abs(pred_v) // den_v), 0)
    return jnp.concatenate([pred_h, pred_v], axis=-1)


def dc_predictions(coefs: jnp.ndarray, quant: jnp.ndarray,
                   nz7x7: jnp.ndarray, edges: jnp.ndarray,
                   pixels: jnp.ndarray):
    """Pixel-domain DC prediction for every block (model.hh:674-784).

    edges: int16 [H, W, 16] neighbor summaries (from neighbor_summaries).
    Returns (predicted_dc, uncertainty, uncertainty2) int32 [H, W].
    """
    H, W = coefs.shape[0], coefs.shape[1]
    px = pixels.astype(jnp.int32)
    q0 = quant[0].astype(jnp.int32)
    left_edges = jnp.pad(edges[:, :-1], ((0, 0), (1, 0), (0, 0)))
    above_edges = jnp.pad(edges[:-1, :], ((1, 0), (0, 0), (0, 0)))
    has_left = (jnp.arange(W) > 0)[None, :]
    has_above = (jnp.arange(H) > 0)[:, None]

    pxg = px.reshape(H, W, 8, 8)
    # left estimates
    a_l = pxg[..., :, 0] + 1024
    pd_l = pxg[..., :, 0] - pxg[..., :, 1]
    b_l = left_edges[..., 0:8].astype(jnp.int32) - _div2_toward_zero(pd_l)
    est_l = (b_l - a_l).astype(jnp.int16).astype(jnp.int32)
    # above estimates
    a_a = pxg[..., 0, :] + 1024
    pd_a = pxg[..., 0, :] - pxg[..., 1, :]
    b_a = above_edges[..., 8:16].astype(jnp.int32) - _div2_toward_zero(pd_a)
    est_a = (b_a - a_a).astype(jnp.int16).astype(jnp.int32)

    big = jnp.int32(1 << 30)
    l_mask = has_left[..., None]
    a_mask = has_above[..., None]
    any_mask = has_left | has_above
    mins = jnp.minimum(jnp.min(jnp.where(l_mask, est_l, big), axis=-1),
                       jnp.min(jnp.where(a_mask, est_a, big), axis=-1))
    maxs = jnp.maximum(jnp.max(jnp.where(l_mask, est_l, -big), axis=-1),
                       jnp.max(jnp.where(a_mask, est_a, -big), axis=-1))
    sum_l = jnp.sum(jnp.where(l_mask, est_l, 0), axis=-1)
    sum_a = jnp.sum(jnp.where(a_mask, est_a, 0), axis=-1)
    # avg_h = first-eight estimates (left if present else above)
    avg_h = jnp.where(has_left, sum_l, sum_a)
    avg_v = jnp.where(has_left & has_above, sum_a, avg_h)
    overall = (avg_h + avg_v) >> 1
    uncertainty = jnp.where(any_mask, (maxs - mins) >> 3, 0)
    dh = avg_h - overall
    dv = avg_v - overall
    far = jnp.where(jnp.abs(dh) < jnp.abs(dv), dh, dv)
    uncertainty2 = jnp.where(any_mask, far >> 3, 0)
    avgmed = jnp.where(any_mask, overall, 0)
    pred = (jnp.sign(avgmed) * (jnp.abs(avgmed) // q0) + 4) >> 3
    return pred, uncertainty, uncertainty2


def block_bit_cost(coefs: jnp.ndarray) -> jnp.ndarray:
    """Rough per-block compressed-cost estimate (vp8_encoder.cc:156-189
    aligned_block_cost): 16 + sum(1 + 2*bitlength(|coef|))."""
    a = jnp.abs(coefs.astype(jnp.int32))
    blen = jnp.where(a > 0, 32 - jax.lax.clz(a), 0)
    return 16 + jnp.sum(1 + 2 * blen, axis=-1)


def phase_a(coefs: jnp.ndarray, quant: jnp.ndarray,
            icos_x: jnp.ndarray, icos_y: jnp.ndarray,
            row_has_above: jnp.ndarray = None):
    """Full phase-A bundle for one component plane (planar layout; the
    blockwise composition below is kept as phase_a_reference).

    row_has_above: optional bool [H] marking rows whose above-context is
    present; segment-top rows get False (the is_top_row reset of
    lepton_codec.hh:173-181), so one whole-plane call serves any
    segmentation.  Default: every row but the first."""
    return phase_a_planar(coefs, quant, icos_x, icos_y, row_has_above)


def phase_a_reference(coefs: jnp.ndarray, quant: jnp.ndarray,
                      icos_x: jnp.ndarray, icos_y: jnp.ndarray):
    """Blockwise-layout composition (slower on TPU: (...,8,8) trailing
    dims under-fill the 128-wide lanes); retained as the readable cross
    check for phase_a_planar."""
    nz7, edges, pixels = neighbor_summaries(coefs, quant)
    aavrg = aavrg_all(coefs)
    lak = lak_all(coefs, icos_x, icos_y)
    pred, unc, unc2 = dc_predictions(coefs, quant, nz7, edges, pixels)
    cost = block_bit_cost(coefs)
    return dict(nz7x7=nz7, edges=edges, pixels=pixels, aavrg=aavrg,
                lak=lak, dc_pred=pred, uncertainty=unc, uncertainty2=unc2,
                cost=cost)


# ---------------------------------------------------------------------------
# Planar implementations: band-major [64, H, W] layout keeps W on the TPU
# lane dimension (the (..., 8, 8) forms above tile 8 elements into 128-wide
# lanes -- ~6% utilization and constant relayouts).  Same exact integer
# semantics; phase_a() routes here.
# ---------------------------------------------------------------------------


def _planar(coefs: jnp.ndarray) -> jnp.ndarray:
    """[H, W, 64] int16 -> [64, H, W] int32."""
    return jnp.moveaxis(coefs.astype(jnp.int32), -1, 0)


def _idct_planar(cp: jnp.ndarray, quant: jnp.ndarray,
                 ignore_dc: bool = True):
    """cp int32 [64, H, W] -> pixels list of 64 planes [H, W] int32."""
    d = cp * quant.astype(jnp.int32)[:, None, None]
    dz = [d[k] for k in range(64)]
    if ignore_dc:
        dz[0] = jnp.zeros_like(dz[0])
    inter = [None] * 64
    for y in range(8):
        r = [dz[y * 8 + i] for i in range(8)]
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
    return out


def _shift_above(p: jnp.ndarray) -> jnp.ndarray:
    """[.., H, W] -> same with rows shifted down (row 0 zero)."""
    return jnp.pad(p[..., :-1, :], [(0, 0)] * (p.ndim - 2) + [(1, 0), (0, 0)])


def _shift_left(p: jnp.ndarray) -> jnp.ndarray:
    return jnp.pad(p[..., :, :-1], [(0, 0)] * (p.ndim - 2) + [(0, 0), (1, 0)])


def phase_a_planar(coefs: jnp.ndarray, quant: jnp.ndarray,
                   icos_x: jnp.ndarray, icos_y: jnp.ndarray,
                   row_has_above: jnp.ndarray = None):
    H, W = coefs.shape[0], coefs.shape[1]
    cp = _planar(coefs)                       # [64, H, W] int32
    q = quant.astype(jnp.int32)
    q0 = q[0]
    has_left = (jnp.arange(W) > 0)[None, :]
    if row_has_above is None:
        has_above = (jnp.arange(H) > 0)[:, None]
    else:
        has_above = row_has_above.astype(bool)[:, None]

    # ---- pixels (ignore-dc IDCT) + neighbor summary edges
    px = _idct_planar(cp, quant, ignore_dc=True)   # 64 planes [H, W]
    # the scalar idct stores int16 pixels (idct.cc out[64] int16): wrap
    px = [p.astype(jnp.int16).astype(jnp.int32) for p in px]
    dc = cp[0]
    # NeighborSummary stores edges as int16 (block_context.hh): wrap here
    # so the DC prediction below reads the same wrapped values the scalar
    # path does (matters only when an edge value overflows 16 bits)
    vert = [(dc * q0 + px[i * 8 + 7] + 1024
             + _div2_toward_zero(px[i * 8 + 7] - px[i * 8 + 6])
             ).astype(jnp.int16).astype(jnp.int32) for i in range(8)]
    horiz = [(dc * q0 + px[56 + i] + 1024
              + _div2_toward_zero(px[56 + i] - px[48 + i])
              ).astype(jnp.int16).astype(jnp.int32) for i in range(8)]
    edges = jnp.stack(vert + horiz, axis=-1).astype(jnp.int16)

    nz7 = sum((cp[r * 8 + col] != 0).astype(jnp.int32)
              for r in range(1, 8) for col in range(1, 8)).astype(jnp.uint8)

    # ---- aavrg (model.hh:852-871, uint16 truncation)
    a = jnp.abs(cp)
    left_a = _shift_left(a)
    above_a = _shift_above(a)
    al_a = _shift_above(_shift_left(a))
    both = ((13 * (left_a + above_a) + 6 * al_a) & 0xFFFF) >> 5
    aavrg = jnp.where(has_left & has_above, both,
                      jnp.where(has_left, left_a,
                                jnp.where(has_above, above_a, 0)))
    aavrg = jnp.moveaxis(aavrg, 0, -1)

    # ---- Lakhani predictions (model.hh:1033-1071)
    sign = [0, 1, -1, 1, -1, 1, -1, 1]
    # icos tables are TRACED scalars (not baked constants): one compile
    # serves every quant table at a geometry.  The exact Lakhani
    # division by a traced denominator costs a real integer divide, but
    # per-qtable recompiles cost minutes each through the tunnel.
    icx = jnp.asarray(icos_x, dtype=jnp.int32).reshape(8, 8)
    icy = jnp.asarray(icos_y, dtype=jnp.int32).reshape(8, 8)
    # exact truncating division on |pred| by the traced denominator via
    # f32 (a native int32 vector divide lowers to a long emulation
    # sequence on the VPU).  Unlike vpx_scan._exact_div_f32 (d <= 2^10),
    # the Lakhani denominator reaches ~2^21, so after the remainder
    # correction the quotient can still be off by up to 2 (the TPU
    # divide is not correctly rounded); TWO conditional fixups land it
    # exactly -- property-tested over the full (n, d) domain.

    def _lak_div(pred, den):
        n = jnp.abs(pred)
        d32 = den.astype(jnp.float32)
        q = (n.astype(jnp.float32) / d32).astype(jnp.int32)
        r = n - q * den
        q = q + (r.astype(jnp.float32) / d32).astype(jnp.int32)
        r = n - q * den
        q = q + (r >= den).astype(jnp.int32) - (r < 0).astype(jnp.int32)
        r = n - q * den
        q = q + (r >= den).astype(jnp.int32) - (r < 0).astype(jnp.int32)
        return jnp.sign(pred) * q

    lak_cols = []
    for b in range(1, 8):            # horizontal: coord b, needs above
        above_b = [_shift_above(cp[i * 8 + b]) for i in range(8)]
        pred = above_b[0] * icx[b, 0]
        for i in range(1, 8):
            pred = pred - icx[b, i] * (cp[i * 8 + b]
                                       + sign[i] * above_b[i])
        lak_cols.append(jnp.where(has_above, _lak_div(pred, icx[b, 0]), 0))
    for b in range(1, 8):            # vertical: coord 8b, needs left
        left_b = [_shift_left(cp[b * 8 + i]) for i in range(8)]
        pred = left_b[0] * icy[b, 0]
        for i in range(1, 8):
            pred = pred - icy[b, i] * (cp[b * 8 + i]
                                       + sign[i] * left_b[i])
        lak_cols.append(jnp.where(has_left, _lak_div(pred, icy[b, 0]), 0))
    lak = jnp.stack(lak_cols, axis=-1)

    # ---- DC prediction (model.hh:674-784)
    left_edges = [_shift_left(e) for e in vert]     # neighbor's right edge
    above_edges = [_shift_above(e) for e in horiz]  # neighbor's bottom edge
    est_l = []
    est_a = []
    for i in range(8):
        a_l = px[i * 8] + 1024
        pd_l = px[i * 8] - px[i * 8 + 1]
        b_l = left_edges[i] - _div2_toward_zero(pd_l)
        est_l.append(((b_l - a_l).astype(jnp.int16)).astype(jnp.int32))
        a_a = px[i] + 1024
        pd_a = px[i] - px[8 + i]
        b_a = above_edges[i] - _div2_toward_zero(pd_a)
        est_a.append(((b_a - a_a).astype(jnp.int16)).astype(jnp.int32))
    big = jnp.int32(1 << 30)
    lm = has_left
    am = has_above
    mins = jnp.minimum(
        jnp.minimum(*[jnp.where(lm, e, big) for e in est_l[:2]]),
        jnp.minimum(*[jnp.where(am, e, big) for e in est_a[:2]]))
    maxs = jnp.maximum(
        jnp.maximum(*[jnp.where(lm, e, -big) for e in est_l[:2]]),
        jnp.maximum(*[jnp.where(am, e, -big) for e in est_a[:2]]))
    for e in est_l[2:]:
        mins = jnp.minimum(mins, jnp.where(lm, e, big))
        maxs = jnp.maximum(maxs, jnp.where(lm, e, -big))
    for e in est_a[2:]:
        mins = jnp.minimum(mins, jnp.where(am, e, big))
        maxs = jnp.maximum(maxs, jnp.where(am, e, -big))
    sum_l = sum(jnp.where(lm, e, 0) for e in est_l)
    sum_a = sum(jnp.where(am, e, 0) for e in est_a)
    avg_h = jnp.where(lm, sum_l, sum_a)
    avg_v = jnp.where(lm & am, sum_a, avg_h)
    overall = (avg_h + avg_v) >> 1
    any_mask = lm | am
    uncertainty = jnp.where(any_mask, (maxs - mins) >> 3, 0)
    dh = avg_h - overall
    dv = avg_v - overall
    far = jnp.where(jnp.abs(dh) < jnp.abs(dv), dh, dv)
    uncertainty2 = jnp.where(any_mask, far >> 3, 0)
    avgmed = jnp.where(any_mask, overall, 0)
    pred = (jnp.sign(avgmed) * (jnp.abs(avgmed) // q0) + 4) >> 3

    # ---- bit-cost estimate
    blen = jnp.where(a > 0, 32 - jax.lax.clz(a), 0)
    cost = 16 + jnp.sum(1 + 2 * blen, axis=0)

    pixels = jnp.stack(px, axis=-1).astype(jnp.int16)
    return dict(nz7x7=nz7, edges=edges, pixels=pixels, aavrg=aavrg,
                lak=lak, dc_pred=pred, uncertainty=uncertainty,
                uncertainty2=uncertainty2, cost=cost)
