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
from jax import lax

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


# ---------------------------------------------------------------------------
# Packed-state phase-B encoder
#
# The lax.scan variants above carry the branch arena as a separate [S,
# ARENA, 3] uint8 array and emit per-step outputs derived from PRE-update
# gathers; XLA's in-place analysis then copies the whole arena every scan
# step (one full-arena HBM copy per step: measured 104us/step at 64 lanes
# on a v5e -- exactly 138MB at HBM bandwidth -- and the r1 "phase-B is
# 40x slower than C" finding).  This variant applies the packed-state
# discipline proven in kernels/vpx_decode.py: one uint32 buffer per lane
# holds packed branches + writer registers + the window's output slots;
# each window does ONE gather + ONE scatter, and the emitted bytes are
# re-read from the POST-update buffer (static column slices), so nothing
# derived from the old version survives the update and XLA keeps the
# whole chain in place.
# ---------------------------------------------------------------------------

E_LOW = ARENA_SIZE
E_RNG = ARENA_SIZE + 1
E_CNT = ARENA_SIZE + 2
E_DUMP = ARENA_SIZE + 3          # superseded / PAD / fixed-prob writes
E_OUT = ARENA_SIZE + 4           # 3*W output slots follow

_PLUT_ENC = None


def _packed_enc_lut():
    global _PLUT_ENC
    if _PLUT_ENC is None:
        from ..model.branch import next_state_lut
        lut = next_state_lut().astype(np.uint32)
        _PLUT_ENC = ((lut[..., 0] << 16) | (lut[..., 1] << 8)
                     | lut[..., 2]).reshape(-1)
    return _PLUT_ENC


@partial(jax.jit, static_argnames=("window",))
def encode_streams_packed(idxs: jnp.ndarray, bits: jnp.ndarray,
                          window: int = 8):
    """Packed-state windowed phase-B encoder (same contract as
    encode_streams_windowed: returns emit [L,S], byte [L,S], carry [L,S],
    nbytes [S])."""
    S, L = idxs.shape
    W = window
    pad_L = (L + W - 1) // W * W
    if pad_L != L:
        idxs = jnp.pad(idxs, ((0, 0), (0, pad_L - L)), constant_values=PAD)
        bits = jnp.pad(bits, ((0, 0), (0, pad_L - L)))
    nslot = E_OUT + 3 * W
    plut = jnp.asarray(_packed_enc_lut())
    vpx_norm = jnp.asarray(_VPX_NORM_NP)
    lanes = jnp.arange(S)

    buf = jnp.full((S, nslot), np.uint32(0x010180), dtype=jnp.uint32)
    buf = buf.at[:, E_LOW:].set(0)
    buf = buf.at[:, E_RNG].set(255)
    buf = buf.at[:, E_CNT].set(
        lax.bitcast_convert_type(jnp.full(S, -24, jnp.int32), jnp.uint32))

    out_cols = jnp.arange(E_OUT, E_OUT + 3 * W, dtype=jnp.int32)

    def step(buf, xs):
        idx_w, bit_w = xs                  # [W, S]
        safe_idx = jnp.maximum(idx_w, 0)
        gathered = buf[lanes[None, :], jnp.minimum(safe_idx, ARENA_SIZE - 1)]
        low = buf[:, E_LOW]
        rng = lax.bitcast_convert_type(buf[:, E_RNG], jnp.int32)
        count = lax.bitcast_convert_type(buf[:, E_CNT], jnp.int32)

        upd_states = []
        emits, bytes_, carries = [], [], []
        for k in range(W):
            idx = idx_w[k]
            bit = bit_w[k].astype(jnp.int32)
            valid = idx != PAD
            adaptive = idx >= 0
            cur = gathered[k]
            # in-window same-branch forwarding: use the freshest state
            for j in range(k - 1, -1, -1):
                m = adaptive & (idx == idx_w[j])
                cur = jnp.where(m, upd_states[j], cur)
            prob = jnp.where(adaptive, (cur & 0xFF).astype(jnp.int32), 128)
            # vpx_write (boolwriter.hh:48-118)
            split = 1 + (((rng - 1) * prob) >> 8)
            low2 = jnp.where(bit != 0, low + split.astype(jnp.uint32), low)
            rng2 = jnp.where(bit != 0, rng - split, split)
            shift = vpx_norm[rng2]
            rng3 = rng2 << shift
            count2 = count + shift
            emit = (count2 >= 0) & valid
            offset = shift - count2
            carry_flag = emit & (
                ((low2 << jnp.maximum(offset - 1, 0).astype(jnp.uint32))
                 >> 31) & 1).astype(jnp.bool_)
            byte = ((low2 >> jnp.clip(24 - offset, 0, 31).astype(jnp.uint32))
                    & 0xFF)
            low_emit = ((low2 << jnp.maximum(offset, 0).astype(jnp.uint32))
                        & 0xFFFFFF) << jnp.maximum(count2, 0).astype(
                            jnp.uint32)
            low_noemit = low2 << shift.astype(jnp.uint32)
            low3 = jnp.where(emit, low_emit, low_noemit)
            count3 = jnp.where(emit, count2 - 8, count2)
            low = jnp.where(valid, low3, low)
            rng = jnp.where(valid, rng3, rng)
            count = jnp.where(valid, count3, count)
            nb = plut[(((cur >> 8) << 1).astype(jnp.int32)) | bit]
            upd_states.append(jnp.where(adaptive, nb, cur))
            emits.append(emit)
            bytes_.append(byte)
            carries.append(carry_flag)

        # scatter columns: W branch writes (superseded duplicates routed
        # to the dump slot), 3 registers, 3W output slots -- one scatter
        scat_cols = []
        scat_vals = []
        for k in range(W):
            superseded = jnp.zeros_like(idx_w[k], dtype=bool)
            for j in range(k + 1, W):
                superseded = superseded | (idx_w[j] == idx_w[k])
            ok = (idx_w[k] >= 0) & ~superseded
            scat_cols.append(jnp.where(ok, idx_w[k], E_DUMP))
            scat_vals.append(upd_states[k])
        reg_cols = jnp.stack(
            [jnp.full(S, E_LOW, jnp.int32), jnp.full(S, E_RNG, jnp.int32),
             jnp.full(S, E_CNT, jnp.int32)], axis=1)
        reg_vals = jnp.stack(
            [low, lax.bitcast_convert_type(rng, jnp.uint32),
             lax.bitcast_convert_type(count, jnp.uint32)], axis=1)
        out_vals = jnp.stack(
            [e.astype(jnp.uint32) for e in emits]
            + [b for b in bytes_]
            + [c.astype(jnp.uint32) for c in carries], axis=1)
        cols = jnp.concatenate(
            [jnp.stack(scat_cols, axis=1), reg_cols,
             jnp.broadcast_to(out_cols[None, :], (S, 3 * W))], axis=1)
        vals = jnp.concatenate(
            [jnp.stack(scat_vals, axis=1), reg_vals, out_vals], axis=1)
        buf = buf.at[lanes[:, None], cols].set(vals)

        # outputs re-read from the POST-update buffer (static slices):
        # nothing derived from the old version survives the scatter
        outs = buf[:, E_OUT:E_OUT + 3 * W]
        emit_o = outs[:, :W].T.astype(bool)                 # [W, S]
        byte_o = outs[:, W:2 * W].T.astype(jnp.uint8)
        carry_o = outs[:, 2 * W:].T.astype(bool)
        return buf, (emit_o, byte_o, carry_o)

    steps = pad_L // W
    ixs = idxs.T.reshape(steps, W, S)
    bxs = bits.T.reshape(steps, W, S)
    buf, ys = lax.scan(step, buf, (ixs, bxs))
    emit, byte, carry = ys                 # [steps, W, S]
    emit = emit.reshape(pad_L, S)[:L]
    byte = byte.reshape(pad_L, S)[:L]
    carry = carry.reshape(pad_L, S)[:L]
    nbytes = jnp.sum(emit, axis=0).astype(jnp.int32)
    return emit, byte, carry, nbytes


# ---------------------------------------------------------------------------
# Sort-based two-pass phase-B: the TPU-native formulation
#
# The adaptive model is a per-branch recurrence: the state a branch has
# at its k-th occurrence depends only on the bits previously coded ON
# THAT BRANCH.  A stable sort of the symbol stream by branch index makes
# every branch's observation sequence contiguous, so the model pass
# becomes a register-only chain (packed 24-bit state + readonly LUT
# lookups) -- the arena is NEVER materialized and there are NO scatters,
# the two operations TPUs serialize on.  Unsorting the resulting
# probabilities (one vectorized gather) feeds the arithmetic pass, which
# is the plain vpx_write register chain.  Lanes are free: state is O(1)
# per lane, so thousands of segments batch onto one chip.
#
# This is the same modeling/serialization decoupling the reference's
# rANS backend exploits (SURVEY.md section 2.4 "the key TPU insight"),
# applied to the bit-exact VPX coder.
# ---------------------------------------------------------------------------

_IDENT_BRANCH = np.uint32(0x010180)     # (1, 1, 128) packed


def _exact_div_f32(n, d, wide=False):
    """Exact floor(n/d) for 0 <= n <= 2^17, 1 <= d <= 2^10 via one f32
    division + a +-1 fixup (integer division lowers to a long multi-op
    sequence on the VPU; this is ~6 ops).  Exhaustively verified over
    the branch-update domain in tests.

    wide=True extends the domain to n < 2^31 with n/d < 2^24: there the
    f32 NUMERATOR itself rounds (up to n * 2^-24) and the TPU's divide
    is not correctly rounded (measured: off-by-2 quotients on the v5e --
    a single-bit corpus mismatch in the rANS pass, round 4), so q can
    land several units off.  A second tiny division on the exact int32
    remainder (|r| bounded by a few d, exactly representable) recovers
    floor exactly, then the usual +-1 fixup lands it."""
    q = (n.astype(jnp.float32) / d.astype(jnp.float32)).astype(jnp.int32)
    r = n - q * d
    if wide:
        c = (r.astype(jnp.float32) / d.astype(jnp.float32)).astype(
            jnp.int32)
        q = q + c
        r = n - q * d
    q = q + (r >= d).astype(jnp.int32) - (r < 0).astype(jnp.int32)
    return q


def _branch_update_adv(fc, tc, bit):
    """Branch::adv_record_obs_and_update (branch.hh:66-80), the ANS
    backend rule: increment, halve-other on overflow, probability from
    the POST-update counts ORed with 1."""
    obs = bit != 0
    val = jnp.where(obs, tc, fc)
    nfc = jnp.where(obs, fc, fc + 1)
    ntc = jnp.where(obs, tc + 1, tc)
    ovf = val == 0xFF
    nfc = jnp.where(ovf, jnp.where(obs, (fc + 1) >> 1, 129), nfc)
    ntc = jnp.where(ovf, jnp.where(obs, 129, (tc + 1) >> 1), ntc)
    # & 0xFF: the host stores the prob through a uint8 LUT, so the
    # (tc == 0) corner -- reachable only from trained-model templates --
    # wraps; a no-op on identity-reachable states (tc >= 1 there)
    nprob = (_exact_div_f32(nfc << 8, nfc + ntc) & 0xFF) | 1
    return nfc, ntc, nprob


def _branch_update_arith(fc, tc, bit):
    """Branch::record_obs_and_update as pure vector arithmetic
    (branch.hh:82-100) -- no transition-LUT gather, which TPUs serialize,
    and a single division per observation.
    fc/tc int32 [S] pre-observation counts; returns (fc', tc', prob')."""
    tot = fc + tc + 1
    obs = bit != 0
    # non-overflow updates
    nfc = jnp.where(obs, fc, fc + 1)
    ntc = jnp.where(obs, tc + 1, tc)
    # overflow: halve the other count to (1+c)>>1, set own to 129
    ovf = jnp.where(obs, tc == 0xFF, fc == 0xFF)
    hfc = (1 + fc) >> 1
    htc = (1 + tc) >> 1
    ofc = jnp.where(obs, hfc, 129)
    otc = jnp.where(obs, 129, htc)
    nfc = jnp.where(ovf, ofc, nfc)
    ntc = jnp.where(ovf, otc, ntc)
    numer = jnp.where(ovf, ofc, jnp.where(obs, fc, fc + 1)) << 8
    denom = jnp.where(ovf, ofc + otc, tot)
    # & 0xFF: match the host's uint8 LUT wrap on the (tc == 0) corner
    # (trained-model templates only; identity-reachable states keep tc>=1)
    nprob = _exact_div_f32(numer, denom) & 0xFF
    # never-seen saturation (the other count still at identity)
    never = ovf & jnp.where(obs, fc == 1, tc == 1)
    nfc = jnp.where(never, jnp.where(obs, 1, 0xFF), nfc)
    ntc = jnp.where(never, jnp.where(obs, 0xFF, 1), ntc)
    nprob = jnp.where(never, jnp.where(obs, 0, 255), nprob)
    return nfc, ntc, nprob


@partial(jax.jit, static_argnames=("window", "update"))
def model_probs_sorted(idxs: jnp.ndarray, bits: jnp.ndarray,
                       window: int = 32, update: str = "vpx",
                       template=None):
    """Per-symbol coding probabilities via the sorted-branch model pass.

    idxs int32 [S, L] (PAD / FIXED_PROB / branch), bits uint8 [S, L].
    update: "vpx" (record_obs_and_update) or "adv" (the ANS backend rule,
    branch.hh:66-80: probability from post-update counts, ORed with 1).
    template: optional packed uint32 [ARENA_SIZE] trained-model start
    state (c0<<16 | c1<<8 | prob, counts already load-normalized to
    (1+c)>>1 -- model.cc:407-421): every branch's registers initialize
    from it instead of the identity (1,1,128).  The prob byte is the
    file's cached byte, exactly what the host coder codes the branch's
    first observation with.
    Returns probs int32 [S, L] in STREAM order: the adaptive probability
    each symbol is coded with (128 for FIXED_PROB/PAD slots).
    """
    S, L = idxs.shape
    W = window
    pad_L = (L + W - 1) // W * W
    if pad_L != L:
        idxs = jnp.pad(idxs, ((0, 0), (0, pad_L - L)), constant_values=PAD)
        bits = jnp.pad(bits, ((0, 0), (0, pad_L - L)))
    # ONE stable sort with a single packed payload (pos<<1 | bit) carries
    # everything with the key: 2 operands instead of 3 -- a third of the
    # sort's HBM footprint gone, which is what bounded the lane count per
    # pool at the 2048-lane knee (take_along_axis gathers and argsort
    # are each as expensive as the sort itself on TPU)
    pos0 = jnp.broadcast_to(jnp.arange(idxs.shape[1], dtype=jnp.int32),
                            idxs.shape)
    pay0 = (pos0 << 1) | bits.astype(jnp.int32)
    sidx, spay = lax.sort((idxs, pay0), dimension=1,
                          is_stable=True, num_keys=1)
    sbit = spay & 1
    pos = spay >> 1
    prev = jnp.concatenate(
        [jnp.full((S, 1), -(1 << 30), jnp.int32), sidx[:, :-1]], axis=1)
    newseg = sidx != prev

    steps = pad_L // W
    xs = (sidx.T.reshape(steps, W, S), sbit.T.reshape(steps, W, S),
          newseg.T.reshape(steps, W, S))
    if template is not None:
        # one vectorized gather of each sorted branch's start state (the
        # trained-model path is feature-parity, not the hot default)
        tpl = template[jnp.clip(sidx, 0, template.shape[0] - 1)]
        xs = xs + (tpl.T.reshape(steps, W, S).astype(jnp.int32),)

    def step(state, x):
        si, sb, ns = x[0], x[1], x[2]    # [W, S]
        fc, tc, prob = state             # int32 [S] registers
        probs = []
        for k in range(W):
            adaptive = si[k] >= 0
            if template is None:
                fc = jnp.where(ns[k], 1, fc)
                tc = jnp.where(ns[k], 1, tc)
                prob = jnp.where(ns[k], 128, prob)
            else:
                tp = x[3][k]
                fc = jnp.where(ns[k], (tp >> 16) & 0xFF, fc)
                tc = jnp.where(ns[k], (tp >> 8) & 0xFF, tc)
                prob = jnp.where(ns[k], tp & 0xFF, prob)
            probs.append(jnp.where(adaptive, prob, 128))
            if update == "adv":
                fc2, tc2, prob2 = _branch_update_adv(fc, tc, sb[k])
            else:
                fc2, tc2, prob2 = _branch_update_arith(fc, tc, sb[k])
            fc = jnp.where(adaptive, fc2, fc)
            tc = jnp.where(adaptive, tc2, tc)
            prob = jnp.where(adaptive, prob2, prob)
        # u8 materialization: probs are 1..255, and the scan output +
        # unsort payload at u8 move a quarter of the int32 bytes
        return (fc, tc, prob), jnp.stack(probs).astype(jnp.uint8)

    ident = (jnp.ones(S, jnp.int32), jnp.ones(S, jnp.int32),
             jnp.full(S, 128, jnp.int32))
    _, probs_sorted = lax.scan(step, ident, xs)          # [steps, W, S] u8
    probs_sorted = probs_sorted.reshape(pad_L, S).T      # [S, padL]
    # unsort by sorting on the carried original positions (a permutation,
    # so stability is irrelevant) -- again one sort, no argsort/gather;
    # the u8 payload keeps this sort's bandwidth down
    _, probs = lax.sort((pos, probs_sorted), dimension=1,
                        is_stable=False, num_keys=1)
    return probs[:, :L].astype(jnp.int32)


@partial(jax.jit, static_argnames=("window",))
def arith_pass(idxs: jnp.ndarray, bits: jnp.ndarray, probs: jnp.ndarray,
               window: int = 32):
    """The pure vpx_write register chain with precomputed probabilities.
    Same output contract as encode_streams: (emit, byte, carry [L, S],
    nbytes [S])."""
    S, L = idxs.shape
    W = window
    pad_L = (L + W - 1) // W * W
    if pad_L != L:
        idxs = jnp.pad(idxs, ((0, 0), (0, pad_L - L)), constant_values=PAD)
        bits = jnp.pad(bits, ((0, 0), (0, pad_L - L)))
        probs = jnp.pad(probs, ((0, 0), (0, pad_L - L)),
                        constant_values=128)
    steps = pad_L // W
    xs = (idxs.T.reshape(steps, W, S), bits.T.reshape(steps, W, S),
          probs.T.reshape(steps, W, S))

    def step(carry, x):
        low, rng, count = carry
        iw, bw, pw = x
        emits, bytes_, carries = [], [], []
        for k in range(W):
            valid = iw[k] != PAD
            bit = bw[k].astype(jnp.int32)
            prob = pw[k]
            split = 1 + (((rng - 1) * prob) >> 8)
            low2 = jnp.where(bit != 0, low + split.astype(jnp.uint32), low)
            rng2 = jnp.where(bit != 0, rng - split, split)
            # VPX_NORM[r] == clz32(r) - 24 for r in 1..255: pure ALU
            shift = lax.clz(rng2) - 24
            rng3 = rng2 << shift
            count2 = count + shift
            emit = (count2 >= 0) & valid
            offset = shift - count2
            carry_flag = emit & (
                ((low2 << jnp.maximum(offset - 1, 0).astype(jnp.uint32))
                 >> 31) & 1).astype(jnp.bool_)
            byte = ((low2 >> jnp.clip(24 - offset, 0, 31).astype(jnp.uint32))
                    & 0xFF).astype(jnp.uint8)
            low_emit = ((low2 << jnp.maximum(offset, 0).astype(jnp.uint32))
                        & 0xFFFFFF) << jnp.maximum(count2, 0).astype(
                            jnp.uint32)
            low_noemit = low2 << shift.astype(jnp.uint32)
            low = jnp.where(valid, jnp.where(emit, low_emit, low_noemit),
                            low)
            rng = jnp.where(valid, rng3, rng)
            count = jnp.where(valid, jnp.where(emit, count2 - 8, count2),
                              count)
            emits.append(emit)
            bytes_.append(byte)
            carries.append(carry_flag)
        return (low, rng, count), (jnp.stack(emits), jnp.stack(bytes_),
                                   jnp.stack(carries))

    carry0 = (jnp.zeros(S, jnp.uint32), jnp.full(S, 255, jnp.int32),
              jnp.full(S, -24, jnp.int32))
    _, ys = lax.scan(step, carry0, xs)
    emit, byte, carry = ys
    emit = emit.reshape(pad_L, S)[:L]
    byte = byte.reshape(pad_L, S)[:L]
    carry = carry.reshape(pad_L, S)[:L]
    nbytes = jnp.sum(emit, axis=0).astype(jnp.int32)
    return emit, byte, carry, nbytes


def encode_streams_twopass(idxs, bits, window: int = 32, template=None):
    """Sort-based two-pass phase-B (see banner above): bit-exact with
    encode_streams, no arena, no scatters, O(1) state per lane.
    template: optional packed uint32 [ARENA_SIZE] trained-model start
    state (see model_probs_sorted)."""
    probs = model_probs_sorted(idxs, bits, window, template=template)
    return arith_pass(idxs, bits, probs, window)


# ---------------------------------------------------------------------------
# rANS (format v3) phase-B: the natively batchable backend
#
# With the sorted-branch model pass producing per-symbol probabilities,
# rANS serialization is a pure register chain in REVERSE symbol order
# (src/ans/rans64.hh + ans_bool_writer.hh:21-110): two interleaved 64-bit
# states, one optional 32-bit word emitted per state per pair.  64-bit
# arithmetic is decomposed into uint32 pairs (TPUs have no native int64),
# with the 63-bit-by-8-bit divisions done in exact f32 pieces.
# ---------------------------------------------------------------------------

RANS64_L_HI = np.uint32(1 << 31)        # RANS64_L = 1 << 31 (hi=0 low=2^31)


def _div64_small(hi, lo, f):
    """divmod(hi<<32 | lo, f) for f in 1..256, hi < 2^31 (int32), lo
    uint32.  Because each partial remainder is < f, the three sub-
    quotients are each < 2^16: the result recomposes exactly with no
    carries.  Returns (q_hi int32, q_lo uint32, rem int32)."""
    qh = _exact_div_f32(hi, f, wide=True)             # hi up to 2^31
    rh = hi - qh * f                                  # < f <= 256
    lh = (lo >> 16).astype(jnp.int32)
    ll = (lo & 0xFFFF).astype(jnp.int32)
    n1 = (rh << 16) | lh                              # < f * 2^16 < 2^24
    q1 = _exact_div_f32(n1, f)                        # < 2^16
    r1 = n1 - q1 * f
    n2 = (r1 << 16) | ll                              # < 2^24
    q2 = _exact_div_f32(n2, f)                        # < 2^16
    rem = n2 - q2 * f
    q_lo = ((q1.astype(jnp.uint32) << 16)
            | q2.astype(jnp.uint32))
    return qh, q_lo, rem


def _enc_put64(hi, lo, start, freq, active):
    """Rans64EncPut step on a (hi, lo) uint32-pair state (rans64.hh:
    renormalize -- emit the low word -- while x >= ((L>>8)<<32)*freq,
    then x' = (x//freq)<<8 + x%freq + start).  After renormalization
    x < freq<<55, so q < 2^55 and every sub-term fits its word.
    Returns (hi', lo', emit, word)."""
    xm_hi = (freq << 23).astype(jnp.uint32)           # x_max >> 32
    emit = active & (hi >= xm_hi)
    word = lo
    hi1 = jnp.where(emit, 0, hi)
    lo1 = jnp.where(emit, hi, lo)
    q_hi, q_lo, rem = _div64_small(hi1.astype(jnp.int32), lo1, freq)
    lo_shift = q_lo << 8
    addend = (rem + start).astype(jnp.uint32)
    nlo = lo_shift + addend                           # may wrap: carry
    carry = (nlo < lo_shift).astype(jnp.uint32)
    nhi = ((q_hi.astype(jnp.uint32) << 8) | (q_lo >> 24)) + carry
    hi2 = jnp.where(active, nhi, hi)
    lo2 = jnp.where(active, nlo, lo)
    return hi2, lo2, emit, word


@partial(jax.jit, static_argnames=("window",))
def ans_pass(probs: jnp.ndarray, bits: jnp.ndarray, nsyms: jnp.ndarray,
             window: int = 16):
    """rANS serialization pass (reverse order, ans_bool_writer.hh).

    probs int32 [S, L] per-symbol coding probabilities (stream order),
    bits uint8 [S, L], nsyms int32 [S] valid symbols per lane (trailing
    slots are padding).  Returns (emit1, word1, emit2, word2) each
    [NP, S] in scan order (pair NP-1 first ... pair 0 last, matching the
    reverse walk) plus flush (s1_hi, s1_lo, s2_hi, s2_lo) [S].
    Host assembly mirrors ANSWriter.finish word order.
    """
    S, L = probs.shape
    # pair k: second = symbol 2k, first = symbol 2k+1 (sentinel (1,1)
    # when the count is odd: ans_bool_writer buffers in this layout)
    NPmax = (L + 1) // 2
    npairs = (nsyms + 1) // 2
    sec_b = bits[:, 0::2].astype(jnp.int32)
    sec_p = probs[:, 0::2]
    if L % 2 == 1:
        fst_b = jnp.concatenate(
            [bits[:, 1::2].astype(jnp.int32),
             jnp.ones((S, 1), jnp.int32)], axis=1)
        fst_p = jnp.concatenate(
            [probs[:, 1::2], jnp.ones((S, 1), jnp.int32)], axis=1)
    else:
        fst_b = bits[:, 1::2].astype(jnp.int32)
        fst_p = probs[:, 1::2]
    # odd-count lanes: their last pair's first slot is the sentinel
    pair_i = jnp.arange(NPmax)[None, :]
    odd_last = (nsyms[:, None] % 2 == 1) & (pair_i == (npairs - 1)[:, None])
    fst_b = jnp.where(odd_last, 1, fst_b)
    fst_p = jnp.where(odd_last, 1, fst_p)

    W = window
    # reverse walk includes 4 leading nop pairs (k = npairs..npairs+3)
    NP = NPmax + 4
    padNP = (NP + W - 1) // W * W
    ks = jnp.arange(padNP - 1, -1, -1)                # scan order

    def gather_pair(k):
        in_range = k < NPmax
        kk = jnp.minimum(k, NPmax - 1)
        return (jnp.where(in_range, fst_b[:, kk], 0),
                jnp.where(in_range, fst_p[:, kk], 128),
                jnp.where(in_range, sec_b[:, kk], 0),
                jnp.where(in_range, sec_p[:, kk], 128))

    def step(carry, k_w):
        h1, l1, h2, l2 = carry
        e1s, w1s, e2s, w2s = [], [], [], []
        for t in range(W):
            k = k_w[t]
            fb, fp, sb, sp = gather_pair(k)
            active = k < (npairs + 4)
            is_nop = k >= npairs
            fb = jnp.where(is_nop, 0, fb)
            fp = jnp.where(is_nop, 128, fp)
            sb = jnp.where(is_nop, 0, sb)
            sp = jnp.where(is_nop, 128, sp)
            f_start = jnp.where(fb != 0, fp, 0)
            f_freq = jnp.where(fb != 0, 256 - fp, fp)
            s_start = jnp.where(sb != 0, sp, 0)
            s_freq = jnp.where(sb != 0, 256 - sp, sp)
            h1, l1, e1, w1 = _enc_put64(h1, l1, f_start, f_freq, active)
            h2, l2, e2, w2 = _enc_put64(h2, l2, s_start, s_freq, active)
            e1s.append(e1)
            w1s.append(w1)
            e2s.append(e2)
            w2s.append(w2)
        return (h1, l1, h2, l2), (jnp.stack(e1s), jnp.stack(w1s),
                                  jnp.stack(e2s), jnp.stack(w2s))

    # RANS64_L = 1<<31: hi = 0, lo = 2^31
    zero = jnp.zeros(S, jnp.uint32)
    init = (zero, jnp.full(S, np.uint32(1 << 31), jnp.uint32),
            zero, jnp.full(S, np.uint32(1 << 31), jnp.uint32))
    steps = padNP // W
    (h1, l1, h2, l2), ys = lax.scan(step, init, ks.reshape(steps, W))
    e1, w1, e2, w2 = [y.reshape(padNP, S) for y in ys]
    return (e1, w1, e2, w2), (h1, l1, h2, l2), int(padNP)


def finalize_ans_streams(ys, flush, padNP):
    """Host assembly mirroring ANSWriter.finish: words were appended
    during the reverse walk (s1's word before s2's per pair), then the
    final states flush as s1_hi, s1_lo, s2_hi, s2_lo; output is the
    reversed word list as little-endian bytes."""
    e1, w1, e2, w2 = [np.asarray(y) for y in ys]
    h1, l1, h2, l2 = [np.asarray(f) for f in flush]
    out = []
    S = e1.shape[1]
    for s in range(S):
        words = []
        for t in range(padNP):
            if e1[t, s]:
                words.append(int(w1[t, s]))
            if e2[t, s]:
                words.append(int(w2[t, s]))
        words.append(int(h1[s]))
        words.append(int(l1[s]))
        words.append(int(h2[s]))
        words.append(int(l2[s]))
        b = bytearray()
        for w in reversed(words):
            b += int(w).to_bytes(4, "little")
        from ..coder.ans import ANS_PARITY_TAIL
        b += ANS_PARITY_TAIL
        out.append(bytes(b))
    return out


def encode_streams_ans(segments, window: int = 16, template=None):
    """Full on-device v3 encode of per-segment (branch, bit) streams:
    sorted-branch model pass with the adv update rule, then the reverse
    rANS register chain.  Returns list of per-segment v3 stream bytes,
    bit-exact with coder.ans.ANSWriter.
    template: optional packed uint32 [ARENA_SIZE] trained-model start
    state (see model_probs_sorted)."""
    S = len(segments)
    L = max(1, max(len(i) for i, _ in segments))
    idxs = np.full((S, L), PAD, dtype=np.int32)
    bits = np.zeros((S, L), dtype=np.uint8)
    nsyms = np.zeros(S, dtype=np.int32)
    for s, (i, b) in enumerate(segments):
        idxs[s, :len(i)] = i
        bits[s, :len(b)] = b
        nsyms[s] = len(i)
    ij = jnp.asarray(idxs)
    bj = jnp.asarray(bits)
    probs = model_probs_sorted(ij, bj, 32, update="adv", template=template)
    ys, flush, padNP = ans_pass(probs, bj, jnp.asarray(nsyms), window)
    return finalize_ans_streams(ys, flush, padNP)
