#!/usr/bin/env python3
"""Compile each batch-encode v3 jit in isolation with wall-clock prints,
smallest shapes first: isolates which kernel's tunnel compile wedges."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    stamp(f"backend: {jax.devices()[0].platform}")

    from lepton_tpu.kernels import batch_encode as B

    # 1. rowpack at a small shape
    G, H, W, S_ = 1, 8, 16, 1357
    slab = np.full((G, H, W, S_), -2, np.int32)
    rng = np.random.default_rng(0)
    for h in range(H):
        for w in range(W):
            n = rng.integers(1, 40)
            slab[0, h, w, :n] = rng.integers(0, 1000, n) * 2
    rc_raw = (slab >= 0).sum(axis=(2, 3)).reshape(-1)
    rc_pad = (rc_raw + 127) & ~127
    t0 = time.time()
    out = B._rowpack_jit()(jnp.asarray(slab), jnp.asarray(rc_pad), 128,
                           1 << 18)
    np.asarray(out[:1])
    stamp(f"rowpack small: {time.time()-t0:.1f}s")

    # 2. rowpack at knee shape (one luma part)
    G, H, W = 4, 128, 128
    slab = np.full((G, H, W, S_), -2, np.int32)
    slab[..., :200] = 4
    rc_raw2 = (slab >= 0).sum(axis=(2, 3)).reshape(-1)
    rc_pad2 = (rc_raw2 + 127) & ~127
    t0 = time.time()
    out = B._rowpack_jit()(jnp.asarray(slab), jnp.asarray(rc_pad2), 256,
                           1 << 24)
    np.asarray(out[:1])
    stamp(f"rowpack knee: {time.time()-t0:.1f}s")

    # 3. assemble small + knee
    rows2d = out
    src = np.zeros((32, 64), np.int32)
    t0 = time.time()
    pk = B._assemble_rows_jit()(rows2d, jnp.asarray(src))
    np.asarray(pk[:1, :1])
    stamp(f"assemble small: {time.time()-t0:.1f}s")

    # 4. twopass_fused small
    t0 = time.time()
    r = B._twopass_fused_jit()(pk, 32, 4096)
    np.asarray(r[3])
    stamp(f"twopass_fused small [32x8192]: {time.time()-t0:.1f}s")

    # 5. twopass_fused mid [128, 65536]
    src = np.zeros((128, 512), np.int32)
    pk = B._assemble_rows_jit()(rows2d, jnp.asarray(src))
    t0 = time.time()
    r = B._twopass_fused_jit()(pk, 32, 8192)
    np.asarray(r[3])
    stamp(f"twopass_fused mid [128x65536]: {time.time()-t0:.1f}s")

    # 6. twopass_fused knee [128, 344064]
    src = np.zeros((128, 2688), np.int32)
    pk = B._assemble_rows_jit()(rows2d, jnp.asarray(src))
    t0 = time.time()
    r = B._twopass_fused_jit()(pk, 32, 57344)
    np.asarray(r[3])
    stamp(f"twopass_fused knee [128x344064]: {time.time()-t0:.1f}s")

    stamp("all compiled")


if __name__ == "__main__":
    main()
