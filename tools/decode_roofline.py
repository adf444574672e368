#!/usr/bin/env python3
"""Decode roofline probes (VERDICT r4 item 4): tiny Mosaic kernels that
measure the latency-bound pieces the adaptive-arithmetic DECODE chain is
made of, on real silicon:

  1. a dependent one-hot VMEM RMW chain (the branch-arena access),
  2. the same chain interleaved K=2/4/8 ways (the lane-packing escape:
     if RMW latency pipelined across independent chains, K chains would
     approach K-fold throughput -- measured, it does not),
  3. a dependent scalar ALU chain (the vpx_read arithmetic),
  4. a mixed chain matching the real decoder's per-bit shape
     (RMW + ~12 dependent ALU ops).

The implied ceiling table goes into docs/ARCHITECTURE.md; the product
decode gates (4-segment corpus file + the 16-segment iphone16 golden)
run in bench.py on silicon.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS = 4096


def _mk_kernel(n_iter, kind, K=1):
    def kernel(out_ref, arena):
        lane1 = lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        arena[...] = jnp.full((ROWS, LANES), 0x010180, jnp.int32)

        if kind == "rmw":
            def body(i, xs):
                accs = list(xs)
                for k in range(K):
                    x = accs[k]
                    row = (x + i) & (ROWS - 1)
                    off = x & (LANES - 1)
                    tile = arena[pl.ds(row, 1), :]
                    v = jnp.sum(jnp.where(lane1 == off, tile, 0))
                    arena[pl.ds(row, 1), :] = jnp.where(
                        lane1 == off, v + 1, tile)
                    accs[k] = (x + v) & 0xFFFF
                return tuple(accs)
            accs = lax.fori_loop(0, n_iter, body,
                                 tuple(jnp.int32(7 * (k + 1))
                                       for k in range(K)))
            out_ref[0] = sum(accs)
        elif kind == "alu":
            def body(i, x):
                for _ in range(12):     # ~the vpx_step dependent ops
                    x = ((x * 5) ^ (x >> 3)) + i
                return x
            out_ref[0] = lax.fori_loop(0, n_iter, body, jnp.int32(7))
        else:                           # mixed: RMW + 12 dependent ALU
            def body(i, x):
                row = (x + i) & (ROWS - 1)
                off = x & (LANES - 1)
                tile = arena[pl.ds(row, 1), :]
                v = jnp.sum(jnp.where(lane1 == off, tile, 0))
                arena[pl.ds(row, 1), :] = jnp.where(
                    lane1 == off, v + 1, tile)
                x = (x + v) & 0xFFFF
                for _ in range(12):
                    x = ((x * 5) ^ (x >> 3)) + i
                return x
            out_ref[0] = lax.fori_loop(0, n_iter, body, jnp.int32(7))

    return kernel


def run(kind, n_iter, K=1):
    fn = jax.jit(pl.pallas_call(
        _mk_kernel(n_iter, kind, K),
        grid=(1,),
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        scratch_shapes=[pltpu.VMEM((ROWS, LANES), jnp.int32)],
    ))
    out = fn()
    np.asarray(out)
    best = 1e18
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"backend: {jax.devices()[0].platform}", flush=True)
    N = 2_000_000
    t = run("rmw", N)
    base = N / t / 1e6
    print(f"dependent one-hot RMW chain: {base:6.2f} M ops/s "
          f"({1e9*t/N:.0f} ns/op)", flush=True)
    for K in (2, 4, 8):
        t = run("rmw", N // K, K=K)
        tot = N // K * K
        print(f"  interleaved K={K}:          {tot/t/1e6:6.2f} M ops/s "
              f"({tot/t/1e6/base:.2f}x)", flush=True)
    t = run("alu", N)
    print(f"dependent ALU chain (12 ops): {N/t/1e6:6.2f} M iter/s",
          flush=True)
    t = run("mixed", N)
    mixed = N / t / 1e6
    print(f"mixed RMW+12-ALU (per-bit shape): {mixed:6.2f} M bits/s",
          flush=True)
    # ~58 adaptive bits per block on the corpus (45-80 by content)
    print(f"implied decode ceiling at 58 bits/block: "
          f"{mixed*1e3/58:.1f} kblocks/s", flush=True)


if __name__ == "__main__":
    main()
