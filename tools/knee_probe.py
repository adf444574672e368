#!/usr/bin/env python3
"""Probe the batch-encode pipeline at the 2048-lane knee shape.

Runs bench._gen_knee_corpus (or a smaller -n slice) through
api.batch_compress_tpu with LEPTON_TPU_PROFILE=2 sync marks and prints
the per-stage device seconds, the padding ratio, and the implied
device-only MB/s -- the working dashboard for VERDICT r4 items 1-3.

Usage: python tools/knee_probe.py [-n 128] [--reps 2] [--no-verify]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=128)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--segments", type=int, default=16)
    ap.add_argument("--window", type=int, default=32)
    ap.add_argument("--no-verify", action="store_true")
    ap.add_argument("--profile-only", action="store_true",
                    help="skip the unprofiled warm reps")
    args = ap.parse_args()

    import bench
    blobs = bench._gen_knee_corpus(args.n)
    mb = sum(len(b) for b in blobs) / 1e6
    print(f"corpus: {len(blobs)} files, {mb:.1f} MB", flush=True)

    from lepton_tpu.api import batch_compress_tpu, compress, decompress
    from lepton_tpu.kernels.encode_pipeline import LAST_PROFILE

    t0 = time.perf_counter()
    outs = batch_compress_tpu(blobs, num_segments=args.segments, window=args.window)
    cold = time.perf_counter() - t0
    print(f"cold: {cold:.1f}s", flush=True)

    best = 1e18
    if not args.profile_only:
        for _ in range(args.reps):
            t0 = time.perf_counter()
            outs = batch_compress_tpu(blobs, num_segments=args.segments, window=args.window)
            best = min(best, time.perf_counter() - t0)
            print(f"warm: {time.perf_counter() - t0:.1f}s", flush=True)

    os.environ["LEPTON_TPU_PROFILE"] = "2"
    t0 = time.perf_counter()
    batch_compress_tpu(blobs, num_segments=args.segments, window=args.window)
    prof_wall = time.perf_counter() - t0
    os.environ.pop("LEPTON_TPU_PROFILE", None)
    prof = dict(LAST_PROFILE)

    dev = {k[5:]: round(v, 2) for k, v in prof.items()
           if k.startswith("sync_")}
    dev_total = sum(dev.values())
    syms = prof.get("symbols", 0)
    padded = prof.get("padded_symbols", 0)
    report = dict(
        files=len(blobs), corpus_mb=round(mb, 1),
        lanes=int(prof.get("lanes", 0)),
        warm_s=round(best, 1) if best < 1e17 else None,
        warm_mbps=round(mb / best, 2) if best < 1e17 else None,
        profiled_wall_s=round(prof_wall, 1),
        device_stage_s=dev,
        device_total_s=round(dev_total, 2),
        device_only_mbps=round(mb / dev_total, 2) if dev_total else None,
        symbols=int(syms),
        padded_symbols=int(padded),
        pad_ratio=round(padded / syms, 3) if syms else None,
        chip_msym_per_s=round(syms / prof["sync_twopass"] / 1e6, 1)
        if prof.get("sync_twopass") else None,
        host_stages={k: round(v, 2) for k, v in prof.items()
                     if not k.startswith("sync_") and isinstance(v, float)},
        bytes_moved={k: int(v) for k, v in prof.items()
                     if k.endswith("_bytes")},
    )
    print(json.dumps(report, indent=1), flush=True)

    if not args.no_verify:
        t0 = time.perf_counter()
        bad = 0
        for i in range(0, len(blobs), max(1, len(blobs) // 8)):
            if decompress(outs[i]) != blobs[i]:
                bad += 1
            if outs[i] != compress(blobs[i], max_threads=args.segments):
                bad += 1
        print(f"verify (sampled): {bad} failures, "
              f"{time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
