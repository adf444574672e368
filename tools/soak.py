#!/usr/bin/env python
"""Randomized roundtrip soak: the "nightly larger soak" from NEXT_STEPS.

Generates seeded random JPEGs sweeping the full encoder parameter space
(mode, dimensions, quality, subsampling, optimized tables, restart
intervals, progressive scripts, container version, thread counts), then
for every file checks:

  1. bit-exact roundtrip through our codec (compress -> decompress)
  2. clean failure on a randomly truncated container (no crash/hang,
     no fabricated full-length output)
  3. clean termination on a random container bit-flip
  4. (sampled, when the reference binaries exist) byte-identical encode
     vs /tmp/refbuild[-ans]/lepton and reference cross-decode of ours

Every case is reproducible from (base seed, case index); failures are
saved under --out with a params.json + repro command.  This distills to
tests/test_synthetic_corpus.py; the soak exists to cover the space the
fixed cases can't (it found the grayscale+RST reference parity quirk).

Usage:  python tools/soak.py --n 300 --seed 0 [--ref-every 20] [--fast]
Exit:   0 all green, 1 failures (count printed), artifacts in --out.
"""
from __future__ import annotations

import argparse
import io
import json
import os
import random
import subprocess
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    print("PIL required for the soak generator", file=sys.stderr)
    sys.exit(2)

from lepton_tpu.api import compress, decompress  # noqa: E402

REF = "/tmp/refbuild/lepton"
REF_ANS = "/tmp/refbuild-ans/lepton"


def gen_image(rng: random.Random, w: int, h: int, mode: str) -> Image.Image:
    nrng = np.random.default_rng(rng.randrange(1 << 31))
    kind = rng.choice(["gradient", "noise", "flat", "blocks", "mixed"])
    if kind == "flat":
        ch = np.full((h, w), rng.randrange(256), np.uint8)
    elif kind == "noise":
        ch = nrng.integers(0, 256, size=(h, w), dtype=np.uint8)
    elif kind == "blocks":
        bs = rng.choice([4, 8, 16])
        small = nrng.integers(0, 256,
                              size=(h // bs + 1, w // bs + 1), dtype=np.uint8)
        ch = np.kron(small, np.ones((bs, bs), np.uint8))[:h, :w]
    else:
        yy, xx = np.mgrid[0:h, 0:w]
        base = (xx * 255 / max(w, 1) + yy * 255 / max(h, 1)) / 2
        noise = nrng.normal(0, rng.uniform(0, 48), size=(h, w))
        ch = np.clip(base + noise, 0, 255).astype(np.uint8)
    if mode == "L":
        return Image.fromarray(ch, "L")
    arr = np.stack([ch, np.roll(ch, 7, 0), np.roll(ch, 13, 1)], axis=-1)
    img = Image.fromarray(arr, "RGB")
    return img.convert(mode) if mode != "RGB" else img


def gen_case(rng: random.Random) -> dict:
    """Draw one (image params, save params, codec params) triple."""
    mode = rng.choices(["RGB", "L", "CMYK"], weights=[6, 2, 1])[0]
    w = rng.choice([1, 2, 7, 8, 9, 15, 16, 17, 31, 64, 65,
                    rng.randrange(1, 400), rng.randrange(1, 400)])
    h = rng.choice([1, 2, 7, 8, 9, 15, 16, 17, 31, 64, 65,
                    rng.randrange(1, 400), rng.randrange(1, 400)])
    save = {"quality": rng.choice([1, 5, 25, 50, 75, 85, 95, 100,
                                   rng.randrange(1, 101)])}
    if mode == "RGB":
        save["subsampling"] = rng.randrange(3)
    if rng.random() < 0.4:
        save["optimize"] = True
    if rng.random() < 0.3:
        save["restart_marker_blocks"] = rng.randrange(1, 9)
    progressive = rng.random() < 0.3 and mode != "CMYK"
    if progressive:
        save["progressive"] = True
    codec = {
        "max_threads": rng.choice([1, 2, 4, 8, 16]),
        "even_split": rng.random() < 0.2,
        "version": rng.choices([1, 2, 3], weights=[5, 2, 3])[0],
        "allow_progressive": progressive,
        "allow_four_colors": mode == "CMYK",
    }
    return {"mode": mode, "w": w, "h": h, "save": save, "codec": codec,
            "dqt16": rng.random() < 0.1}


def rewrite_dqt_16bit(data: bytes) -> bytes:
    """Re-encode every 8-bit DQT segment as 16-bit (same values, so scan
    data stays valid) -- covers the reference's Pq=1 parsing path, which
    PIL never emits (tests/test_synthetic_corpus.py:101)."""
    out = bytearray()
    pos = 0
    while pos < len(data) - 1:
        if data[pos] == 0xFF and data[pos + 1] == 0xDB:
            ln = (data[pos + 2] << 8) | data[pos + 3]
            seg = data[pos + 4:pos + 2 + ln]
            new = bytearray()
            i = 0
            while i < len(seg):
                pq_tq = seg[i]
                if pq_tq >> 4 != 0:   # already 16-bit; keep as-is
                    new += seg[i:i + 129]
                    i += 129
                    continue
                new.append(0x10 | (pq_tq & 0x0F))
                for v in seg[i + 1:i + 65]:
                    new += bytes([0, v])
                i += 65
            out += b"\xff\xdb" + (len(new) + 2).to_bytes(2, "big") + new
            pos += 2 + ln
        else:
            out.append(data[pos])
            pos += 1
    out.append(data[-1])
    return bytes(out)


def make_jpeg(case: dict, rng: random.Random) -> bytes:
    img = gen_image(rng, case["w"], case["h"], case["mode"])
    buf = io.BytesIO()
    img.save(buf, "JPEG", **case["save"])
    data = buf.getvalue()
    if case.get("dqt16"):
        data = rewrite_dqt_16bit(data)
    return data


def check_roundtrip(data: bytes, codec: dict) -> bytes:
    lep = compress(data, **codec)
    back = decompress(lep)
    if back != data:
        raise AssertionError(
            f"roundtrip mismatch: {len(back)} vs {len(data)} bytes")
    return lep


def check_truncation(data: bytes, lep: bytes, rng: random.Random) -> None:
    for _ in range(3):
        cut = rng.randrange(1, len(lep))
        try:
            out = decompress(lep[:cut])
        except Exception:
            continue
        # a successful decode of a truncated container is legitimate when
        # the dropped tail is reader-EOF-reproducible (flush zeros, the
        # v3 quirk word, the unused trailing size) -- the reference's
        # readers zero-fill at EOF the same way.  Only boundedness is a
        # hard invariant here.
        if len(out) > len(data) + (1 << 20):
            raise AssertionError(f"truncated container at {cut} produced "
                                 f"unbounded output ({len(out)} bytes)")


def check_bitflip(data: bytes, lep: bytes, rng: random.Random) -> None:
    for _ in range(3):
        if len(lep) <= 31:
            return
        pos = rng.randrange(30, len(lep))
        mutated = bytearray(lep)
        mutated[pos] ^= 1 << rng.randrange(8)
        try:
            out = decompress(bytes(mutated))
        except Exception:
            continue
        if len(out) > len(data) + (1 << 20):
            raise AssertionError(f"bit-flip at {pos} produced unbounded "
                                 f"output ({len(out)} bytes)")


def check_reference(data: bytes, lep: bytes, case: dict, tmpdir: str) -> None:
    """Byte-identical encode + cross-decode vs the reference binary."""
    codec = case["codec"]
    if case["mode"] == "CMYK" or codec["version"] == 2:
        return  # default reference build rejects 4-color; no v2 binary
    binpath = REF_ANS if codec["version"] == 3 else REF
    if not os.path.exists(binpath):
        return
    src = os.path.join(tmpdir, "s.jpg")
    with open(src, "wb") as f:
        f.write(data)
    reflep = os.path.join(tmpdir, "ref.lep")
    flags = ["-skipverify", "-unjailed", "-singlethread"
             if codec["max_threads"] == 1 else
             f"-maxencodethreads={codec['max_threads']}"]
    if codec["version"] == 3:
        flags.append("-ans")
    if codec["even_split"]:
        flags.append("-evensplit")
    if codec["allow_progressive"]:
        flags.append("-allowprogressive")
    r = subprocess.run([binpath, *flags, src, reflep],
                       capture_output=True, timeout=300)
    if r.returncode != 0:
        # reference rejected an input we accepted (e.g. its stricter
        # sampling gate); only flag if we *also* should have rejected
        return
    ref_bytes = open(reflep, "rb").read()
    # the 12-byte git-rev field differs by construction; mask it
    identical = (len(ref_bytes) == len(lep) and ref_bytes[:4] == lep[:4]
                 and ref_bytes[16:] == lep[16:])
    if not identical and codec["version"] >= 2:
        # v2+ headers are brotli-compressed: the vendored reference
        # brotli and the system brotli may pick different (equivalent)
        # representations.  Require the decompressed header block and
        # the mux region to be byte-identical instead.
        from lepton_tpu.container.format import read_container
        ha, ma = read_container(lep)
        hb, mb = read_container(ref_bytes)
        identical = (ma == mb and ha.hdrdata == hb.hdrdata
                     and vars(ha).keys() == vars(hb).keys())
    if not identical:
        raise AssertionError(
            f"encode differs from reference: {len(lep)} vs "
            f"{len(ref_bytes)} bytes (cmd {' '.join(flags)})")
    # cross-decode: the reference must decode OUR container bit-exactly
    ourlep = os.path.join(tmpdir, "our.lep")
    with open(ourlep, "wb") as f:
        f.write(lep)
    out = os.path.join(tmpdir, "o.jpg")
    r = subprocess.run([binpath, "-unjailed", ourlep, out],
                       capture_output=True, timeout=300)
    if r.returncode != 0 or open(out, "rb").read() != data:
        raise AssertionError("reference failed to cross-decode our .lep")


def check_aux_paths(data: bytes, lep: bytes, case: dict,
                    rng: random.Random) -> None:
    """Sampled coverage of the product paths beyond plain compress():
    streaming decode, concatenated decode, UJG, the permissive wrapper,
    and truncated-JPEG (early-EOF / EEE) roundtrips."""
    from lepton_tpu import api

    draw = rng.random()
    if draw < 0.25:
        # O(width) streaming decode must agree byte-for-byte
        if api.decompress_streaming(lep) != data:
            raise AssertionError("decompress_streaming != decompress")
    elif draw < 0.40:
        # -lepcat: two containers back to back decode to the two files
        if api.decompress_all(lep + lep) != data + data:
            raise AssertionError("concatenated decode mismatch")
    elif draw < 0.55:
        ujg = api.ujg_compress(data,
                               allow_progressive=case["codec"]
                               ["allow_progressive"])
        if api.ujg_decompress(ujg) != data:
            raise AssertionError("UJG roundtrip mismatch")
    elif draw < 0.70:
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 2048)))
        wrapped = api.compress_any(blob, permissive=True, verify=True)
        if api.decompress(wrapped) != blob:
            raise AssertionError("permissive wrapper roundtrip mismatch")
    elif draw < 0.85:
        # truncated JPEG: if the cut still compresses, EEE bookkeeping
        # must reproduce the truncated bytes exactly (jpgcoder.cc EEE)
        cut = rng.randrange(len(data) // 2, len(data))
        trunc = data[:cut]
        try:
            tlep = compress(trunc, **case["codec"])
        except Exception:
            return  # clean rejection of an unparseable slice is fine
        if decompress(tlep) != trunc:
            raise AssertionError(f"truncated-JPEG roundtrip at {cut}")
    else:
        # -startbyte slice THROUGH THE PRODUCT CONTRACT (verify on):
        # slice re-encode is not exact for every offset even in the
        # reference (e.g. an all-zero scan tail re-pads differently --
        # the reference emits the same divergent bytes and relies on its
        # verify gate to exit 41 with no output; confirmed byte-equal on
        # the soak find seed 404 case 781).  So: a verified slice must
        # decode to exactly the tail; a rejection must be clean.
        sb = rng.randrange(1, len(data))
        try:
            slep = api.compress_any(data, verify=True, start_byte=sb,
                                    **case["codec"])
        except Exception:
            return  # clean verify rejection (reference exits 41)
        if decompress(slep) != data[sb:]:
            raise AssertionError(f"-startbyte slice roundtrip at {sb}")


def run_case(idx: int, base_seed: int, args, tmpdir: str):
    seed = base_seed * 1_000_003 + idx
    rng = random.Random(seed)
    case = gen_case(rng)
    try:
        data = make_jpeg(case, rng)
    except Exception:
        return "skip", case, None  # PIL refused the combination
    try:
        lep = check_roundtrip(data, case["codec"])
        if not args.fast:
            check_truncation(data, lep, rng)
            check_bitflip(data, lep, rng)
            check_aux_paths(data, lep, case, rng)
        if args.ref_every and idx % args.ref_every == 0:
            check_reference(data, lep, case, tmpdir)
    except Exception as e:
        return "fail", case, (data, e, traceback.format_exc())
    return "ok", case, None


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--n", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ref-every", type=int, default=20,
                    help="reference cross-check every Nth case (0=never)")
    ap.add_argument("--fast", action="store_true",
                    help="roundtrip only (skip truncation/bitflip checks)")
    ap.add_argument("--out", default="/tmp/soak_failures")
    args = ap.parse_args()

    import tempfile
    tmpdir = tempfile.mkdtemp(prefix="soak_")
    t0 = time.time()
    fails = skips = 0
    for i in range(args.n):
        status, case, detail = run_case(i, args.seed, args, tmpdir)
        if status == "skip":
            skips += 1
        elif status == "fail":
            fails += 1
            os.makedirs(args.out, exist_ok=True)
            stem = os.path.join(args.out, f"case_{args.seed}_{i}")
            data, exc, tb = detail
            with open(stem + ".jpg", "wb") as f:
                f.write(data)
            with open(stem + ".json", "w") as f:
                json.dump({"case": case, "seed": args.seed, "index": i,
                           "error": repr(exc)}, f, indent=1, default=str)
            print(f"FAIL case {i}: {exc!r}\n  params: {case}\n"
                  f"  artifacts: {stem}.jpg/.json\n"
                  f"  repro: python tools/soak.py --seed {args.seed} "
                  f"--n {i + 1} 2>&1 | tail  # case {i}\n{tb}",
                  file=sys.stderr)
        if (i + 1) % 25 == 0:
            print(f"[{i + 1}/{args.n}] {fails} failures, {skips} skips, "
                  f"{time.time() - t0:.0f}s", flush=True)
    print(f"soak done: {args.n} cases, {fails} failures, {skips} skips "
          f"in {time.time() - t0:.0f}s")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
