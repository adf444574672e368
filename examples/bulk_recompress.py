#!/usr/bin/env python3
"""Bulk lossless JPEG recompression: the production serving shape.

Walks a directory, recompresses every JPEG to .lep with full verification
(every file is decoded back and compared before the .lep is kept), and
reports aggregate ratio + throughput.  On a multi-core host the segment
codec parallelizes via the GIL-dropping native calls; on a TPU host the
entropy phase can run on accelerator lanes (api.compress_tpu).

Usage: python examples/bulk_recompress.py <dir> [--tpu] [--decode]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lepton_tpu.api import compress_any, compress_tpu, decompress_all


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    use_tpu = "--tpu" in sys.argv
    decode = "--decode" in sys.argv
    root = args[0] if args else "."
    total_in = total_out = 0
    n = failures = 0
    t0 = time.perf_counter()
    for dirpath, _, files in os.walk(root):
        for fn in files:
            path = os.path.join(dirpath, fn)
            if decode and fn.lower().endswith(".lep"):
                data = open(path, "rb").read()
                out = decompress_all(data)
                open(path[:-4] + ".jpg", "wb").write(out)
                n += 1
                continue
            if not fn.lower().endswith((".jpg", ".jpeg")):
                continue
            data = open(path, "rb").read()
            try:
                if use_tpu:
                    lep = compress_tpu(data)
                    if decompress_all(lep) != data:
                        raise ValueError("verification failed")
                else:
                    lep = compress_any(data, verify=True, permissive=False,
                                       allow_progressive=True)
            except Exception as e:
                print(f"SKIP {path}: {type(e).__name__}: {e}")
                failures += 1
                continue
            open(path + ".lep", "wb").write(lep)
            total_in += len(data)
            total_out += len(lep)
            n += 1
    dt = time.perf_counter() - t0
    if total_in:
        print(f"{n} files, {total_in/1e6:.1f} MB -> {total_out/1e6:.1f} MB "
              f"({100*total_out/total_in:.1f}%), {total_in/1e6/dt:.2f} MB/s, "
              f"{failures} skipped")
    return 0


if __name__ == "__main__":
    sys.exit(main())
