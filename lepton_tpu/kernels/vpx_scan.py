"""Phase-B TPU kernel: batched adaptive VPX boolean encoding as a scan.

The serial entropy coder vectorizes *across* independent thread-segments
(SURVEY.md section 7 pillar 1): each lane owns one segment's model arena and
writer state, and a `lax.scan` walks the (branch_index, bit) symbol streams
in lockstep.  Carry propagation -- the only backward-looking part of
vpx_write -- is deferred: the kernel emits raw bytes plus carry flags, and a
trivial host pass resolves them while assembling the file (carries are rare
and the fix-up is an associative backward operation).

Symbol encoding: idx >= 0 -> adaptive branch in the model arena;
idx == FIXED_PROB -> probability 128, no model update (marker/stop bits);
idx == PAD -> no-op lane padding.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .. import constants as C
from ..model.branch import next_state_lut
from ..model.tables import ARENA_SIZE

PAD = -1
FIXED_PROB = -2

_VPX_NORM_NP = np.asarray(C.VPX_NORM, dtype=np.int32)
_LUT_NP = None


def _lut():
    """Branch-update LUT as a host constant (safe to close over in jit)."""
    global _LUT_NP
    if _LUT_NP is None:
        _LUT_NP = next_state_lut()  # [256,256,2,3] uint8 numpy
    return jnp.asarray(_LUT_NP)


def fresh_arenas(num_segments: int) -> jnp.ndarray:
    a = jnp.empty((num_segments, ARENA_SIZE, 3), dtype=jnp.uint8)
    a = a.at[..., 0].set(1)
    a = a.at[..., 1].set(1)
    a = a.at[..., 2].set(128)
    return a


@partial(jax.jit, static_argnames=())
def encode_streams(idxs: jnp.ndarray, bits: jnp.ndarray):
    """Encode S symbol streams in lockstep.

    idxs: int32 [S, L] (PAD / FIXED_PROB / arena index)
    bits: uint8 [S, L]
    Returns (emit [L, S] bool, byte [L, S] uint8, carry [L, S] bool,
             nbytes [S] int32).
    """
    S = idxs.shape[0]
    lut = _lut()
    seg = jnp.arange(S)

    def step(carry, xs):
        arena, low, rng, count = carry
        idx, bit = xs
        valid = idx != PAD
        adaptive = idx >= 0
        safe_idx = jnp.maximum(idx, 0)
        b = arena[seg, safe_idx]                      # [S, 3]
        prob = jnp.where(adaptive, b[:, 2].astype(jnp.int32), 128)
        bit32 = bit.astype(jnp.uint32)

        vpx_norm = jnp.asarray(_VPX_NORM_NP)
        split = (1 + (((rng - 1) * prob.astype(jnp.uint32)) >> 8))
        low2 = jnp.where(bit32 != 0, low + split, low)
        rng2 = jnp.where(bit32 != 0, rng - split, split)
        shift = vpx_norm[rng2.astype(jnp.int32)].astype(jnp.uint32)
        rng3 = rng2 << shift
        count2 = count + shift.astype(jnp.int32)
        emit = (count2 >= 0) & valid
        offset = shift.astype(jnp.int32) - count2
        carry_flag = emit & (
            ((low2 << (offset - 1).astype(jnp.uint32)) >> 31) & 1).astype(
                jnp.bool_)
        byte = ((low2 >> (24 - offset).astype(jnp.uint32))
                & 0xFF).astype(jnp.uint8)
        # emitted path: low -> (low << offset) & 0xFFFFFF then << count2
        low_emit = ((low2 << offset.astype(jnp.uint32)) & 0xFFFFFF) \
            << count2.astype(jnp.uint32)
        low_noemit = low2 << shift
        low3 = jnp.where(emit, low_emit, low_noemit)
        count3 = jnp.where(emit, count2 - 8, count2)

        new_low = jnp.where(valid, low3, low)
        new_rng = jnp.where(valid, rng3, rng)
        new_count = jnp.where(valid, count3, count)

        upd = adaptive
        nb = lut[b[:, 0].astype(jnp.int32), b[:, 1].astype(jnp.int32),
                 bit.astype(jnp.int32)]
        nb = jnp.where(upd[:, None], nb, b)
        arena = arena.at[seg, safe_idx].set(nb)
        return (arena, new_low, new_rng, new_count), (emit, byte, carry_flag)

    arena0 = fresh_arenas(S)
    low0 = jnp.zeros(S, dtype=jnp.uint32)
    rng0 = jnp.full(S, 255, dtype=jnp.uint32)
    count0 = jnp.full(S, -24, dtype=jnp.int32)
    (_, _, _, _), ys = jax.lax.scan(
        step, (arena0, low0, rng0, count0),
        (idxs.T, bits.T))
    emit, byte, carry = ys
    nbytes = jnp.sum(emit, axis=0).astype(jnp.int32)
    return emit, byte, carry, nbytes


def build_symbol_streams(segments):
    """Pad per-segment (idx, bit) arrays into [S, L] with the marker bit
    prepended and the 32 stop bits appended (vpx_start/stop_encode)."""
    full = []
    for idx, bit in segments:
        idx = np.asarray(idx, dtype=np.int32)
        bit = np.asarray(bit, dtype=np.uint8)
        fi = np.concatenate([[FIXED_PROB], idx,
                             np.full(32, FIXED_PROB, dtype=np.int32)])
        fb = np.concatenate([[0], bit, np.zeros(32, dtype=np.uint8)])
        full.append((fi, fb))
    L = max(len(i) for i, _ in full)
    S = len(full)
    idxs = np.full((S, L), PAD, dtype=np.int32)
    bits = np.zeros((S, L), dtype=np.uint8)
    for s, (i, b) in enumerate(full):
        idxs[s, :len(i)] = i
        bits[s, :len(b)] = b
    return idxs, bits


def finalize_streams(emit, byte, carry, nbytes):
    """Host-side carry resolution + stop-byte rule; returns list of bytes."""
    emit = np.asarray(emit)
    byte = np.asarray(byte)
    carry = np.asarray(carry)
    nbytes = np.asarray(nbytes)
    out = []
    for s in range(emit.shape[1]):
        mask = emit[:, s]
        bs = bytearray(byte[mask, s].tobytes())
        cs = carry[mask, s]
        for i in np.nonzero(cs)[0]:
            # +1 at position i-1, rippling through 0xFF bytes
            j = int(i) - 1
            while j >= 0 and bs[j] == 0xFF:
                bs[j] = 0
                j -= 1
            assert j >= 0, "carry out of stream start"
            bs[j] += 1
        if len(bs) and (bs[-1] & 0xE0) == 0xC0:
            bs.append(0)
        out.append(bytes(bs))
    return out


@partial(jax.jit, static_argnames=("window",))
def encode_streams_windowed(idxs: jnp.ndarray, bits: jnp.ndarray,
                            window: int = 8):
    """Windowed variant of encode_streams: each scan step consumes
    `window` symbols per lane, coalescing the model-arena gather/scatter
    (the per-step HBM round trip dominates the one-symbol scan).

    Same outputs as encode_streams.  In-window same-branch reuse is
    resolved by forwarding the freshest updated state; the single scatter
    per window routes superseded duplicates to a dump row so duplicate
    scatter-index semantics never matter.
    """
    S, L = idxs.shape
    W = window
    pad_L = (L + W - 1) // W * W
    if pad_L != L:
        idxs = jnp.pad(idxs, ((0, 0), (0, pad_L - L)),
                       constant_values=PAD)
        bits = jnp.pad(bits, ((0, 0), (0, pad_L - L)))
    lut = _lut()
    seg = jnp.arange(S)
    vpx_norm = jnp.asarray(_VPX_NORM_NP)
    DUMP = ARENA_SIZE                      # extra row absorbing dead writes

    def step(carry, xs):
        arena, low, rng, count = carry
        idx_w, bit_w = xs                  # [W, S]
        gathered = arena[seg[None, :], jnp.maximum(idx_w, 0)]   # [W, S, 3]
        upd_states = []
        emits, bytes_, carries = [], [], []
        for k in range(W):
            idx = idx_w[k]
            bit = bit_w[k]
            valid = idx != PAD
            adaptive = idx >= 0
            cur = gathered[k]
            found = jnp.zeros_like(idx, dtype=bool)
            for j in range(k - 1, -1, -1):
                m = (idx == idx_w[j]) & adaptive & (idx_w[j] >= 0) & ~found
                cur = jnp.where(m[:, None], upd_states[j], cur)
                found = found | m
            prob = jnp.where(adaptive, cur[:, 2].astype(jnp.int32), 128)
            bit32 = bit.astype(jnp.uint32)
            split = (1 + (((rng - 1) * prob.astype(jnp.uint32)) >> 8))
            low2 = jnp.where(bit32 != 0, low + split, low)
            rng2 = jnp.where(bit32 != 0, rng - split, split)
            shift = vpx_norm[rng2.astype(jnp.int32)].astype(jnp.uint32)
            rng3 = rng2 << shift
            count2 = count + shift.astype(jnp.int32)
            emit = (count2 >= 0) & valid
            offset = shift.astype(jnp.int32) - count2
            carry_flag = emit & (
                ((low2 << (offset - 1).astype(jnp.uint32)) >> 31) & 1
            ).astype(jnp.bool_)
            byte = ((low2 >> (24 - offset).astype(jnp.uint32))
                    & 0xFF).astype(jnp.uint8)
            low_emit = ((low2 << offset.astype(jnp.uint32)) & 0xFFFFFF) \
                << count2.astype(jnp.uint32)
            low_noemit = low2 << shift
            low3 = jnp.where(emit, low_emit, low_noemit)
            count3 = jnp.where(emit, count2 - 8, count2)
            low = jnp.where(valid, low3, low)
            rng = jnp.where(valid, rng3, rng)
            count = jnp.where(valid, count3, count)
            nb = lut[cur[:, 0].astype(jnp.int32), cur[:, 1].astype(jnp.int32),
                     bit.astype(jnp.int32)]
            nb = jnp.where(adaptive[:, None], nb, cur)
            upd_states.append(nb)
            emits.append(emit)
            bytes_.append(byte)
            carries.append(carry_flag)
        # single scatter: superseded (non-final) duplicates -> dump row
        scat_idx = []
        for k in range(W):
            superseded = jnp.zeros_like(idx_w[k], dtype=bool)
            for j in range(k + 1, W):
                superseded = superseded | ((idx_w[j] == idx_w[k])
                                           & (idx_w[k] >= 0))
            scat_idx.append(jnp.where((idx_w[k] >= 0) & ~superseded,
                                      idx_w[k], DUMP))
        si = jnp.stack(scat_idx)                       # [W, S]
        su = jnp.stack(upd_states)                     # [W, S, 3]
        arena = arena.at[seg[None, :], si].set(su)
        return (arena, low, rng, count), (jnp.stack(emits),
                                          jnp.stack(bytes_),
                                          jnp.stack(carries))

    arena0 = jnp.concatenate(
        [fresh_arenas(S), jnp.zeros((S, 1, 3), dtype=jnp.uint8)], axis=1)
    low0 = jnp.zeros(S, dtype=jnp.uint32)
    rng0 = jnp.full(S, 255, dtype=jnp.uint32)
    count0 = jnp.full(S, -24, dtype=jnp.int32)
    steps = pad_L // W
    ixs = idxs.T.reshape(steps, W, S)
    bxs = bits.T.reshape(steps, W, S)
    (_, _, _, _), ys = jax.lax.scan(step, (arena0, low0, rng0, count0),
                                    (ixs, bxs))
    emit, byte, carry = ys                 # [steps, W, S]
    emit = emit.reshape(pad_L, S)[:L]
    byte = byte.reshape(pad_L, S)[:L]
    carry = carry.reshape(pad_L, S)[:L]
    nbytes = jnp.sum(emit, axis=0).astype(jnp.int32)
    return emit, byte, carry, nbytes
