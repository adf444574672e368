"""Phase-B lane-scaling study on the real chip (VERDICT r2 task 3).

Measures encode_streams_twopass throughput (Msym/s) across lane counts
S and window sizes W to find the operating point for the batch encode
headline.  Timing discipline per CLAUDE.md: inputs varied on-device
between reps (the axon tunnel memoizes identical executions), arrays
device-resident, min-of-N, T-contrast against a half-length run to
subtract dispatch overhead.

Usage: python tools/phaseb_scaling.py [quick]
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault("LEPTON_TPU_JAX_CACHE", "1")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lepton_tpu.kernels import vpx_scan
from lepton_tpu.model.tables import ARENA_SIZE


def synth_streams(S, L, seed=0):
    """Synthetic (idx, bit) streams with a realistic branch mix: indices
    concentrated on the hot tables (the sort cost is data-independent,
    so uniform-over-arena vs hot-subset only affects realism, not the
    measured regime)."""
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, ARENA_SIZE, size=(S, L)).astype(np.int32)
    # ~3% fixed-prob slots (marker/stop analogue)
    fixed = rng.random((S, L)) < 0.03
    idx[fixed] = vpx_scan.FIXED_PROB
    bits = (rng.random((S, L)) < 0.45).astype(np.uint8)
    return idx, bits


def time_twopass(S, L, W, reps=3):
    idx_np, bit_np = synth_streams(S, L)
    idx = jax.device_put(jnp.asarray(idx_np))
    bit = jax.device_put(jnp.asarray(bit_np))

    # on-device input variation between reps (memoization defeat): flip
    # bits via XOR with a scalar-dependent mask, jitted once
    @jax.jit
    def perturb(b, k):
        return (b ^ (k & 1)).astype(jnp.uint8)

    @jax.jit
    def reduce_out(emit, byte, carry, nbytes):
        return jnp.sum(nbytes) + jnp.sum(byte[:, ::997].astype(jnp.int32))

    def run(i, b):
        out = vpx_scan.encode_streams_twopass(i, b, window=W)
        # block_until_ready does NOT block through the axon tunnel
        # (measured 2026-08-17): force a fetch of a device-reduced scalar
        return int(np.asarray(reduce_out(*out)))

    run(idx, bit)                      # compile
    best = 1e18
    for r in range(reps):
        b2 = perturb(bit, jnp.uint8(r + 1))
        np.asarray(b2[0, 0])
        t0 = time.perf_counter()
        run(idx, b2)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    print("device:", jax.devices()[0], flush=True)
    results = []
    Ss = [512, 2048] if quick else [128, 512, 2048, 8192]
    Ws = [32] if quick else [16, 32, 64, 128]
    for S in Ss:
        # constant total work (16.7M symbols) so each config runs long
        # enough to dominate the ~30ms dispatch overhead
        L = max(4096, (1 << 24) // S)
        Lh = L // 2
        for W in Ws:
            try:
                t_full = time_twopass(S, L, W)
                t_half = time_twopass(S, Lh, W)
                per_sym = (t_full - t_half) / (S * Lh)
                msym = 1e-6 / per_sym if per_sym > 0 else float("inf")
                gross = S * L / t_full / 1e6
                print(f"S={S:5d} L={L} W={W:4d}: full={t_full*1e3:8.1f}ms "
                      f"half={t_half*1e3:8.1f}ms -> marginal "
                      f"{msym:8.1f} Msym/s (gross {gross:7.1f})",
                      flush=True)
                results.append(dict(S=S, W=W, t_full=t_full, t_half=t_half,
                                    marginal_msym=round(msym, 1),
                                    gross_msym=round(gross, 1)))
            except Exception as e:
                print(f"S={S} W={W}: FAIL {str(e)[:200]}", flush=True)
    import json
    out = "/tmp/phaseb_scaling.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
