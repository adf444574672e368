"""Pallas TPU kernel: per-segment adaptive VPX encoder, model in VMEM.

Each grid program owns one thread-segment; its ~720k-branch adaptive model
lives packed as (fc | tc<<8 | prob<<16) int32 tiles in VMEM, the symbol
stream arrives in VMEM blocks via the grid's chunk dimension, and output
bytes land in a VMEM-resident per-segment buffer.

MEASURED LIMITATION: TPU grid steps execute sequentially on the
TensorCore, so segments in the grid dimension do NOT run concurrently --
this kernel is bit-exact but serial (~1 Msym/s on a v5e).  The
lane-parallel windowed scan (vpx_scan.encode_streams_windowed, one segment
per vector lane) is the production accelerator design; this kernel remains
as the VMEM-residency study and a second bit-exactness oracle.

Mosaic constraints shape the data movement: VMEM traffic must be
tile-aligned vector ops, so every dynamic access works on an (8, 128) int32
tile -- model lookups/updates and byte emission are one-hot masked
read-modify-writes, and carry propagation walks back in 1024-byte tile
windows (carries are ~0.4% of bytes; longer 0xFF runs are astronomically
rare but handled).

Grid: (segments, chunks) -- scratch persists across the chunk dimension, so
coder and model state carry over between symbol blocks of one segment.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..model.tables import ARENA_SIZE
from .vpx_scan import FIXED_PROB, PAD, build_symbol_streams  # noqa: F401

LANES = 128
SUBLANES = 8
TILE = LANES * SUBLANES              # 1024 entries per (8,128) tile
ARENA_ROWS = ((ARENA_SIZE + TILE - 1) // TILE) * SUBLANES
CHUNK = 2048


def _coder_kernel(idx_ref, bit_ref, out_ref, nbytes_ref,
                  arena_ref, state_ref):
    """One (segment, chunk) grid step."""
    c = pl.program_id(1)
    seg = pl.program_id(0)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)
    flat_iota = sub_iota * LANES + lane_iota

    def tile_of(pos):
        """(tile_row_start, offset_within_tile) for a flat element index."""
        trow = pos // TILE * SUBLANES
        return pl.multiple_of(trow, SUBLANES), pos - (pos // TILE) * TILE

    def extract(ref, pos):
        trow, off = tile_of(pos)
        tile = ref[pl.ds(trow, SUBLANES), :]
        return jnp.sum(jnp.where(flat_iota == off, tile, 0))

    @pl.when(c == 0)
    def _init():
        arena_ref[...] = jnp.full((ARENA_ROWS, LANES),
                                  1 | (1 << 8) | (128 << 16), dtype=jnp.int32)
        state_ref[0] = 0      # lowvalue
        state_ref[1] = 255    # range
        state_ref[2] = -24    # count
        state_ref[3] = 0      # outpos

    def emit_byte(pos, byte, carry):
        """Append `byte`; on carry, +1 ripples into earlier bytes."""

        @pl.when(carry != 0)
        def _carry():
            def win_body(state):
                wpos = state[0]
                wrow, woff = tile_of(wpos)
                tile = out_ref[pl.ds(wrow, SUBLANES), :]
                # longest suffix of 0xFF bytes ending at woff
                not_ff = (flat_iota <= woff) & (tile != 0xFF)
                last = jnp.max(jnp.where(not_ff, flat_iota, -1))
                zero_mask = (flat_iota > last) & (flat_iota <= woff)
                bumped = jnp.where(flat_iota == last, tile + 1, tile)
                bumped = jnp.where(zero_mask, 0, bumped)
                out_ref[pl.ds(wrow, SUBLANES), :] = bumped
                # whole tile prefix was 0xFF -> continue into previous tile
                prev = (wpos // TILE) * TILE - 1
                return (jnp.where(last < 0, prev, jnp.int32(-1)),)

            jax.lax.while_loop(lambda s: s[0] >= 0, win_body, (pos - 1,))

        trow, off = tile_of(pos)
        tile = out_ref[pl.ds(trow, SUBLANES), :]
        out_ref[pl.ds(trow, SUBLANES), :] = jnp.where(
            flat_iota == off, byte, tile)

    def body(t, _):
        idx = extract(idx_ref, t)
        bit = extract(bit_ref, t)
        valid = idx != PAD
        adaptive = idx >= 0
        safe = jnp.maximum(idx, 0)
        arow, aoff = tile_of(safe)
        arena_tile = arena_ref[pl.ds(arow, SUBLANES), :]
        packed = jnp.sum(jnp.where(flat_iota == aoff, arena_tile, 0))
        fc = packed & 0xFF
        tc = (packed >> 8) & 0xFF
        prob = jnp.where(adaptive, (packed >> 16) & 0xFF, 128)

        # int32 two's-complement == uint32 mod-2^32 for the adds and left
        # shifts here; sign-bit tests replace logical right shifts
        low = state_ref[0]
        rng = state_ref[1]
        count = state_ref[2]
        pos = state_ref[3]

        split = 1 + (((rng - 1) * prob) >> 8)
        low2 = jnp.where(bit != 0, low + split, low)
        rng2 = jnp.where(bit != 0, rng - split, split)
        # vpx_norm[v] == 8 - bit_length(v) == clz32(v) - 24 for v in [1,255]
        shift = jax.lax.clz(rng2) - 24
        rng3 = rng2 << shift
        count2 = count + shift
        emit = (count2 >= 0) & valid
        offset = shift - count2

        @pl.when(emit)
        def _emit():
            carry = jnp.where((low2 << (offset - 1)) < 0, 1, 0)
            byte = (low2 >> (24 - offset)) & 0xFF
            emit_byte(pos, byte, carry)
            state_ref[3] = pos + 1

        low_emit = ((low2 << offset) & 0xFFFFFF) << count2
        low_noemit = low2 << shift
        low3 = jnp.where(emit, low_emit, low_noemit)
        count3 = jnp.where(emit, count2 - 8, count2)

        state_ref[0] = jnp.where(valid, low3, low)
        state_ref[1] = jnp.where(valid, rng3, rng)
        state_ref[2] = jnp.where(valid, count3, count)

        # adaptive model update (branch.hh:82-100), one-hot tile RMW
        @pl.when(adaptive & valid)
        def _update():
            obs_true = bit != 0
            ovf = jnp.where(obs_true, tc == 0xFF, fc == 0xFF)
            never = ovf & jnp.where(obs_true, fc == 1, tc == 1)
            nfc_n = jnp.where(obs_true, fc, fc + 1)
            ntc_n = jnp.where(obs_true, tc + 1, tc)
            nprob_n = (nfc_n << 8) // (fc + tc + 1)
            hfc = jnp.where(obs_true, (1 + fc) >> 1, 129)
            htc = jnp.where(obs_true, 129, (1 + tc) >> 1)
            nprob_h = (hfc << 8) // (hfc + htc)
            nfc = jnp.where(ovf, hfc, nfc_n)
            ntc = jnp.where(ovf, htc, ntc_n)
            nprob = jnp.where(ovf, nprob_h, nprob_n)
            nfc = jnp.where(never, jnp.where(obs_true, 1, 0xFF), nfc)
            ntc = jnp.where(never, jnp.where(obs_true, 0xFF, 1), ntc)
            nprob = jnp.where(never, jnp.where(obs_true, 0, 255), nprob)
            npacked = nfc | (ntc << 8) | (nprob << 16)
            arena_ref[pl.ds(arow, SUBLANES), :] = jnp.where(
                flat_iota == aoff, npacked, arena_tile)

        return 0

    jax.lax.fori_loop(0, CHUNK, body, 0)

    @pl.when(c == pl.num_programs(1) - 1)
    def _finish():
        nbytes_ref[seg] = state_ref[3]


def encode_streams_pallas(idxs: np.ndarray, bits: np.ndarray,
                          out_cap: int = None, interpret: bool = False):
    """Encode S padded symbol streams [S, L]; returns (bytes [S, cap],
    nbytes [S])."""
    S, L = idxs.shape
    Lp = ((L + CHUNK - 1) // CHUNK) * CHUNK
    if Lp != L:
        pad_i = np.full((S, Lp - L), PAD, dtype=np.int32)
        idxs = np.concatenate([np.asarray(idxs, dtype=np.int32), pad_i], 1)
        bits = np.concatenate(
            [np.asarray(bits, dtype=np.uint8),
             np.zeros((S, Lp - L), dtype=np.uint8)], 1)
    if out_cap is None:
        out_cap = max(2048, L // 4 + 2048)
    out_cap = ((out_cap + TILE - 1) // TILE) * TILE
    nchunks = Lp // CHUNK
    crows = CHUNK // LANES
    orows = out_cap // LANES

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(S, nchunks),
        in_specs=[
            pl.BlockSpec((crows, LANES), lambda s, c: (s * nchunks + c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((crows, LANES), lambda s, c: (s * nchunks + c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((orows, LANES), lambda s, c: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole nbytes array
        ),
        scratch_shapes=[
            pltpu.VMEM((ARENA_ROWS, LANES), jnp.int32),
            pltpu.SMEM((4,), jnp.int32),
        ],
    )
    out, nbytes = pl.pallas_call(
        _coder_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((S * orows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((S,), jnp.int32),
        ),
        interpret=interpret,
    )(jnp.asarray(idxs, dtype=jnp.int32).reshape(-1, LANES),
      jnp.asarray(bits, dtype=jnp.int32).reshape(-1, LANES))
    out = np.asarray(out).astype(np.uint8).reshape(S, out_cap)
    return out, np.asarray(nbytes)


def finalize(out: np.ndarray, nbytes: np.ndarray):
    streams = []
    for s in range(out.shape[0]):
        bs = bytearray(out[s, :nbytes[s]].tobytes())
        if len(bs) and (bs[-1] & 0xE0) == 0xC0:
            bs.append(0)
        streams.append(bytes(bs))
    return streams
