#!/usr/bin/env python3
"""Micro-benchmark the XLA primitives the batch-encode pipeline is built
from, at realistic shapes, on the real chip: per-element vs quad vs
128-row gathers, sort cost vs row width, scatter-add, cumsum, and the
scan-step rate vs lane count.  These rates decide the r5 redesign
(VERDICT items 1-3); numbers recorded in ARCHITECTURE.md.
"""
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
        # vary input on-device: the tunnel memoizes identical executions
        args2 = tuple(a + r + 1 if a.dtype != bool else a for a in args)
        for a in args2:
            jax.block_until_ready(a)
        t0 = time.perf_counter()
        out = fn(*args2)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[-1:])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    key = jax.random.PRNGKey(0)
    N = 64 << 20                       # 64M elements, ~256MB int32
    flat = jax.device_put(
        jax.random.randint(key, (N,), 0, 1000, dtype=jnp.int32))
    M = 16 << 20                       # 16M output elements

    idx1 = jax.device_put(
        jax.random.randint(key, (M,), 0, N - 1, dtype=jnp.int32))
    t = timeit(jax.jit(lambda f, i: f[i]), flat, idx1)
    print(f"gather flat 1-elem:   {M/t/1e6:7.1f} M idx/s "
          f"({M*4/t/1e9:.1f} GB/s)", flush=True)

    idx4 = jax.device_put(
        jax.random.randint(key, (M // 4,), 0, N // 4 - 1, dtype=jnp.int32))
    f4 = flat.reshape(-1, 4)
    t = timeit(jax.jit(lambda f, i: f[i]), f4, idx4)
    print(f"gather quad rows:     {M//4/t/1e6:7.1f} M idx/s "
          f"({M*4/t/1e9:.1f} GB/s)", flush=True)

    idx128 = jax.device_put(jax.random.randint(
        key, (M // 128,), 0, N // 128 - 1, dtype=jnp.int32))
    f128 = flat.reshape(-1, 128)
    t = timeit(jax.jit(lambda f, i: f[i]), f128, idx128)
    print(f"gather 128 rows:      {M//128/t/1e6:7.1f} M idx/s "
          f"({M*4/t/1e9:.1f} GB/s)", flush=True)

    idx512 = jax.device_put(jax.random.randint(
        key, (M // 512,), 0, N // 512 - 1, dtype=jnp.int32))
    f512 = flat.reshape(-1, 512)
    t = timeit(jax.jit(lambda f, i: f[i]), f512, idx512)
    print(f"gather 512 rows:      {M//512/t/1e6:7.1f} M idx/s "
          f"({M*4/t/1e9:.1f} GB/s)", flush=True)

    # 2D per-element gather in the assemble form: out[s,j] = flat[src[s,j]]
    S, L = 128, 131072
    src2 = jax.device_put(jax.random.randint(
        key, (S, L), 0, N - 1, dtype=jnp.int32))
    t = timeit(jax.jit(lambda f, i: f[i]), flat, src2)
    print(f"gather 2D [{S}x{L}]: {S*L/t/1e6:7.1f} M idx/s", flush=True)

    # sorts at the shapes that matter: [rows, width]
    for rows, width in ((1024, 1357), (1024, 1360), (2048, 512),
                        (256, 65536), (128, 344064), (512, 344064)):
        tot = rows * width
        if tot > 256 << 20:
            continue
        a = jax.random.randint(key, (rows, width), 0, 1 << 20,
                               dtype=jnp.int32)
        a = jax.device_put(a)
        b = jax.device_put(jax.random.randint(
            key, (rows, width), 0, 1 << 20, dtype=jnp.int32))
        t = timeit(jax.jit(lambda x, y: lax.sort(
            (x, y), dimension=1, is_stable=False, num_keys=1)), a, b)
        print(f"sort2op [{rows}x{width}]: {tot/t/1e6:7.1f} M elem/s",
              flush=True)
        t = timeit(jax.jit(lambda x, y: lax.sort(
            (x, y, y), dimension=1, is_stable=True, num_keys=1)[0]), a, b)
        print(f"sort3st [{rows}x{width}]: {tot/t/1e6:7.1f} M elem/s",
              flush=True)

    # scatter-add at run-table sizes
    K = 4 << 20
    sidx = jax.device_put(jax.random.randint(
        key, (K,), 0, M - 1, dtype=jnp.int32))
    vals = jax.device_put(jnp.ones((K,), jnp.int32))
    t = timeit(jax.jit(
        lambda i, v: jnp.zeros((M,), jnp.int32).at[i].add(v)), sidx, vals)
    print(f"scatter-add {K>>20}M->16M: {K/t/1e6:7.1f} M idx/s", flush=True)

    # cumsum along rows
    a = jax.device_put(jax.random.randint(
        key, (128, 1 << 20), 0, 3, dtype=jnp.int32))
    t = timeit(jax.jit(lambda x: jnp.cumsum(x, axis=1)), a)
    print(f"cumsum [128x1M]:      {(128<<20)/t/1e6:7.1f} M elem/s",
          flush=True)


if __name__ == "__main__":
    main()
