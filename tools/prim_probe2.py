#!/usr/bin/env python3
"""Round-2 primitive probes: decompose the symbolize+block-sort jit and
test the wide-row sort merge trick + remaining gather granularities."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[:1]
    best = 1e18
    for r in range(reps):
        args2 = tuple(a + r + 1 for a in args)
        for a in args2:
            jax.block_until_ready(a)
        t0 = time.perf_counter()
        out = fn(*args2)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[-1:])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    key = jax.random.PRNGKey(0)

    # realistic-volume narrow sorts vs block-merged wide rows
    for rows, width in ((65536, 1360), (16384, 5440), (8192, 10880),
                        (2048, 43520)):
        tot = rows * width
        a = jax.device_put(jax.random.randint(
            key, (rows, width), 0, 1 << 20, dtype=jnp.int32))
        b = jax.device_put(jax.random.randint(
            key, (rows, width), 0, 1 << 20, dtype=jnp.int32))
        t = timeit(jax.jit(lambda x, y: lax.sort(
            (x, y), dimension=1, is_stable=False, num_keys=1)), a, b)
        print(f"sort2op [{rows}x{width}]: {tot/t/1e6:7.1f} M elem/s",
              flush=True)

    # sort along the MAJOR axis (the [L, S] scan-output layout)
    for rows, width in ((344064, 128), (344064, 512)):
        tot = rows * width
        if tot > 256 << 20:
            continue
        a = jax.device_put(jax.random.randint(
            key, (rows, width), 0, 1 << 20, dtype=jnp.int32))
        b = jax.device_put(jax.random.randint(
            key, (rows, width), 0, 1 << 20, dtype=jnp.int32))
        t = timeit(jax.jit(lambda x, y: lax.sort(
            (x, y), dimension=0, is_stable=False, num_keys=1)), a, b)
        print(f"sort2op dim0 [{rows}x{width}]: {tot/t/1e6:7.1f} M elem/s",
              flush=True)

    # 3D tile sort (the fused-pack shape)
    a = jax.device_put(jax.random.randint(
        key, (512, 672, 512), 0, 1 << 20, dtype=jnp.int32))
    b = jax.device_put(jax.random.randint(
        key, (512, 672, 512), 0, 1 << 20, dtype=jnp.int32))
    t = timeit(jax.jit(lambda x, y: lax.sort(
        (x, y), dimension=2, is_stable=False, num_keys=1)), a, b)
    print(f"sort2op 3D [512x672x512]: {512*672*512/t/1e6:7.1f} M elem/s",
          flush=True)

    # transpose [L, S] -> [S, L] (the scan-output pivot)
    a = jax.device_put(jax.random.randint(
        key, (344064, 128), 0, 255, dtype=jnp.int32))
    t = timeit(jax.jit(lambda x: x.T.reshape(128, -1) + 0), a)
    print(f"transpose [344064x128]: {344064*128/t/1e6:7.1f} M elem/s",
          flush=True)

    # gather row granularities 8..64
    N = 64 << 20
    flat = jax.device_put(
        jax.random.randint(key, (N,), 0, 1000, dtype=jnp.int32))
    M = 16 << 20
    for gw in (8, 16, 32, 64):
        idx = jax.device_put(jax.random.randint(
            key, (M // gw,), 0, N // gw - 1, dtype=jnp.int32))
        fg = flat.reshape(-1, gw)
        t = timeit(jax.jit(lambda f, i: f[i]), fg, idx)
        print(f"gather {gw:3}-rows: {M//gw/t/1e6:7.1f} M idx/s "
              f"({M*4/t/1e9:.2f} GB/s)", flush=True)

    # symbolize-only vs symbolize+sort at the knee shape (1 image c0)
    import bench
    blobs = bench._gen_knee_corpus(2)
    from lepton_tpu.jpeg.parser import parse_jpeg
    from lepton_tpu.jpeg.imageinfo import image_info_from_header
    from lepton_tpu.jpeg.decoder import decode_scans
    from lepton_tpu.model.context import ColorTables
    from lepton_tpu.kernels.symbolize import symbolize_slice
    parsed = parse_jpeg(blobs[0])
    info = image_info_from_header(parsed.hdrdata)
    dec = decode_scans(parsed, info)
    ct = ColorTables(info.qtables[info.cmpnfo[0].qtable_index])
    icx = tuple(int(v) for v in ct.icos_idct_edge_8192_dequantized_x)
    icy = tuple(int(v) for v in ct.icos_idct_edge_8192_dequantized_y)
    mnt = tuple(int(v) for v in ct.min_noise_threshold)
    quant = jnp.asarray(ct.quant, dtype=jnp.int32)
    H, W = dec.planes[0].shape[:2]
    G = 4
    coefs = jax.device_put(np.stack(
        [np.asarray(dec.planes[0], np.int16) + (i % 2)
         for i in range(G)]))
    rha = jnp.asarray(np.ones((G, H), bool))
    csv = jnp.zeros(G, jnp.int32)

    def sym_only(cf, quant, ra, cl):
        def one(cf1, quant, ra1, cl1):
            return symbolize_slice(cf1, 0, quant, icx, icy, mnt,
                                   jnp.int32(0), cl1, ra1)
        idx, bit = jax.vmap(one, in_axes=(0, None, 0, 0))(
            cf, quant, ra, cl)
        packed = (idx << 1) | bit.astype(jnp.int32)
        return jnp.sum(packed, axis=(1, 2, 3))

    def sym_sort(cf, quant, ra, cl):
        def one(cf1, quant, ra1, cl1):
            return symbolize_slice(cf1, 0, quant, icx, icy, mnt,
                                   jnp.int32(0), cl1, ra1)
        idx, bit = jax.vmap(one, in_axes=(0, None, 0, 0))(
            cf, quant, ra, cl)
        packed = (idx << 1) | bit.astype(jnp.int32)
        valid = idx != -1
        pos = jnp.arange(packed.shape[-1], dtype=jnp.int32)
        k = jnp.where(valid, pos, jnp.int32(1 << 30))
        _, slab = lax.sort((k, packed), dimension=3,
                           is_stable=False, num_keys=1)
        return slab[..., 0] + slab[..., -1]

    jo = jax.jit(sym_only)
    js = jax.jit(sym_sort)
    nslots = G * H * W * 1357
    t = timeit(lambda c: jo(c, quant, rha, csv), coefs)
    print(f"symbolize only [{G}x{H}x{W}]: {t:.3f}s "
          f"({nslots/t/1e6:.0f} M slots/s)", flush=True)
    t = timeit(lambda c: js(c, quant, rha, csv), coefs)
    print(f"symbolize+sort [{G}x{H}x{W}]: {t:.3f}s "
          f"({nslots/t/1e6:.0f} M slots/s)", flush=True)


if __name__ == "__main__":
    main()
