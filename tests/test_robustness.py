"""Adversarial-input robustness: corrupt containers and streams must fail
cleanly (typed errors / STREAM_INCONSISTENT), never hang, crash, or emit
wrong bytes silently (decoder.cc:183-185 guards; container bounds checks)."""
import os
import random

import pytest

from lepton_tpu.api import compress, decompress

IMAGES = "/root/reference/images"


def _lep():
    data = open(os.path.join(IMAGES, "nofsync.jpg"), "rb").read()
    return data, compress(data)


def test_truncated_container_everywhere():
    data, lep = _lep()
    rng = random.Random(1)
    cuts = sorted(rng.sample(range(1, len(lep)), 40)) + [22, 28, 29, 40]
    for cut in cuts:
        try:
            out = decompress(lep[:cut])
        except Exception:
            continue  # clean typed failure
        # a successful parse of a truncated container must not fabricate
        # a full-length original
        assert out != data or cut == len(lep)


def test_bitflip_corruption():
    data, lep = _lep()
    rng = random.Random(2)
    for _ in range(60):
        pos = rng.randrange(30, len(lep))  # past the fixed header
        mutated = bytearray(lep)
        mutated[pos] ^= 1 << rng.randrange(8)
        try:
            out = decompress(bytes(mutated))
        except Exception:
            continue
        # arithmetic streams are self-delimiting only via handoffs; a
        # surviving decode may differ, but must terminate and stay bounded
        assert len(out) <= len(data) + 65536


def test_random_garbage_rejected():
    rng = random.Random(3)
    for n in (0, 1, 5, 100, 4096):
        blob = bytes(rng.randrange(256) for _ in range(n))
        with pytest.raises(Exception):
            decompress(b"\xcf\x84" + blob)


def test_zero_length_and_tiny_jpegs():
    for blob in (b"", b"\xff", b"\xff\xd8", b"\xff\xd8\xff\xd9"):
        with pytest.raises(Exception):
            compress(blob)


def test_four_component_rejected():
    """4-component (CMYK) JPEGs exit UNSUPPORTED_4_COLORS like the
    reference's 3-slot model build (memory.hh: code 4)."""
    base = open(os.path.join(IMAGES, "nofsync.jpg"), "rb").read()
    # patch SOF0 to claim 4 components (parse-level check; the scan data
    # no longer matches, but the guard fires before scan decode)
    i = base.find(b"\xff\xc0")
    assert i > 0
    ncomp_off = i + 9
    patched = bytearray(base)
    old_len = (base[i + 2] << 8) | base[i + 3]
    patched[ncomp_off] = 4
    patched[i + 2:i + 4] = ((old_len + 3)).to_bytes(2, "big")
    patched[ncomp_off + 1:ncomp_off + 1] = bytes([4, 0x11, 0])
    from lepton_tpu.util.exitcodes import ExitCode, classify
    try:
        compress(bytes(patched))
        raise AssertionError("expected rejection")
    except Exception as e:
        assert classify(e) in (ExitCode.UNSUPPORTED_4_COLORS,
                               ExitCode.UNSUPPORTED_JPEG)


def _malicious_dc_category_jpeg() -> bytes:
    """A syntactically valid JPEG whose DC Huffman table maps a 1-bit code
    to symbol 0xFF (DC category 255).  Categories above 11 are illegal in
    baseline JPEG; ADVICE r1 found the fused native decoder shifted by a
    negative count (UB) and could read past the scan buffer on them."""
    soi = b"\xff\xd8"
    dqt = b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + b"\x01" * 64
    sof = b"\xff\xc0" + (11).to_bytes(2, "big") + \
        b"\x08" + (8).to_bytes(2, "big") + (8).to_bytes(2, "big") + \
        b"\x01" + b"\x01\x11\x00"
    # DC table 0: one 1-bit code -> symbol 0xFF
    dht_dc = b"\xff\xc4" + (19 + 1).to_bytes(2, "big") + b"\x00" + \
        b"\x01" + b"\x00" * 15 + b"\xff"
    # AC table 0: one 1-bit code -> symbol 0x00 (EOB)
    dht_ac = b"\xff\xc4" + (19 + 1).to_bytes(2, "big") + b"\x10" + \
        b"\x01" + b"\x00" * 15 + b"\x00"
    sos = b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01\x01\x00\x00\x3f\x00"
    scan = b"\x55" * 40  # DC code + 255 "extra" bits + AC EOB
    return soi + dqt + sof + dht_dc + dht_ac + sos + scan + b"\xff\xd9"


def test_oversized_dc_category_no_crash():
    """The 255-bit DC category must not crash the native decoder (OOB
    read / UB shift); clean failure or a verified roundtrip are both
    acceptable outcomes."""
    import subprocess
    import sys as _sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = _malicious_dc_category_jpeg()
    r = subprocess.run(
        [_sys.executable, "-c",
         "import sys; sys.path.insert(0, %r)\n"
         "from lepton_tpu.api import compress, decompress\n"
         "data = sys.stdin.buffer.read()\n"
         "try:\n"
         "    lep = compress(data)\n"
         "    assert decompress(lep) == data\n"
         "    print('roundtrip')\n"
         "except Exception as e:\n"
         "    print('rejected', type(e).__name__)\n" % repo],
        input=data, capture_output=True, timeout=120)
    assert r.returncode == 0, (r.returncode, r.stderr.decode())
    assert r.stdout.strip().split()[0] in (b"roundtrip", b"rejected"), \
        r.stdout


def test_truncated_progressive_eobrun_no_hang():
    """Truncating a progressive container mid-CMP leaves garbage
    coefficients whose EOB runs the (optimized, minimal) AC table cannot
    encode; the scan re-emit must error out, not spin on a zero-decrement
    eobrun flush (found by tools/soak.py, seed 7 case 6)."""
    import io
    import subprocess
    import sys as _sys

    PIL = pytest.importorskip("PIL")
    from PIL import Image
    import numpy as np

    rng = np.random.default_rng(6)
    yy, xx = np.mgrid[0:31, 0:2]
    ch = np.clip(xx * 127 + yy * 8 + rng.normal(0, 24, (31, 2)),
                 0, 255).astype(np.uint8)
    arr = np.stack([ch, np.roll(ch, 7, 0), np.roll(ch, 13, 1)], axis=-1)
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, "JPEG", quality=95,
                                     subsampling=0, progressive=True)
    data = buf.getvalue()
    lep = compress(data, allow_progressive=True, max_threads=4)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # sweep cuts across the CMP region in a subprocess: a regression hangs
    # the child, which the timeout converts into a test failure
    r = subprocess.run(
        [_sys.executable, "-c",
         "import sys; sys.path.insert(0, %r)\n"
         "from lepton_tpu.api import decompress\n"
         "lep = sys.stdin.buffer.read()\n"
         "for cut in range(60, len(lep) - 8, 7):\n"
         "    try:\n"
         "        decompress(lep[:cut])\n"
         "    except Exception:\n"
         "        pass\n"
         "print('terminated')\n" % repo],
        input=lep, capture_output=True, timeout=120)
    assert r.returncode == 0 and b"terminated" in r.stdout, \
        (r.returncode, r.stderr.decode()[-500:])


def test_oversubscribed_dht_no_crash():
    """A corrupt DHT can oversubscribe the canonical code space (code >=
    2^len); the 16-bit peek LUT fill must treat those as dead paths like
    the reference's truncated tree (jpgcoder.cc:5575-5597), not write past
    lut[65536] (native heap smash found by tools/soak.py seed 11 case 132
    via a header bit-flip)."""
    import subprocess
    import sys as _sys

    from lepton_tpu.jpeg.huffman import HuffCodes
    # 5 codes of length 1 (max 2): canonical code overflows immediately
    counts = bytes([5] + [0] * 15)
    values = bytes([0, 1, 2, 3, 4])
    hc = HuffCodes(counts, values)
    assert hc.valid  # lengths exist, even though some paths are dead

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [_sys.executable, "-c",
         "import sys, ctypes; sys.path.insert(0, %r)\n"
         "from lepton_tpu._native import get_lib\n"
         "lib = get_lib()\n"
         "size = lib.lepton_huff_table_size()\n"
         "buf = ctypes.create_string_buffer(size)\n"
         "counts = bytes([5] + [0] * 15)\n"
         "# length-16 codes whose truncated cval still passes bounds\n"
         "counts2 = bytes([0] * 15 + [255])\n"
         "vals = bytes(range(255))\n"
         "lib.lepton_build_huff(buf, counts, vals, 5)\n"
         "lib.lepton_build_huff(buf, counts2, vals, 255)\n"
         "print('ok')\n" % repo],
        capture_output=True, timeout=300)
    assert r.returncode == 0 and b"ok" in r.stdout, \
        (r.returncode, r.stderr.decode()[-400:])


def test_header_truncation_rejected_scan_truncation_accepted():
    """The reference crystallizes header/huffman data only at EOI or at a
    mid-scan EOF (standard_eof/early_eof, jpgcoder.cc:2398,2315-2334); an
    EOF inside a header segment leaves hdrs==0 and rejects the file with
    UNSUPPORTED_JPEG.  We used to accept header-truncated JPEGs and then
    mis-roundtrip them (tools/soak.py seed 23)."""
    from lepton_tpu.util.exitcodes import ExitCode, classify

    from lepton_tpu.jpeg.parser import parse_jpeg

    data = open(os.path.join(IMAGES, "nofsync.jpg"), "rb").read()
    # the parser records (huffdata_pos -> file_pos): entry 0 is the first
    # scan byte, so anything before it is header territory
    scan_start = parse_jpeg(data).huff_input_offsets[0][1]
    for cut in (scan_start - 40, scan_start - 5, scan_start - 1):
        try:
            compress(data[:cut])
            raise AssertionError(f"header cut at {cut} was accepted")
        except AssertionError:
            raise
        except Exception as e:
            assert classify(e) == ExitCode.UNSUPPORTED_JPEG, (cut, e)
    # mid-scan cuts keep the reference's early-EOF (EEE) contract
    for cut in (scan_start + 100, len(data) - 50):
        trunc = data[:cut]
        assert decompress(compress(trunc)) == trunc, cut


def test_truncated_progressive_rst_every_cut():
    """Truncating a progressive+RST JPEG with optimized Huffman tables can
    zero-fill a tail whose recode needs an EOB-run code the table never
    contained (the original scan never emitted EOB).  The reference
    encoder emits a container for such inputs whose own decoder then
    LOOPS FOREVER re-encoding it (observed on /tmp/refbuild/lepton);
    ours must round-trip the exact truncated bytes instead
    (recode_progressive.regenerate_scans truncated= graceful stop).
    Soak find: tools/soak.py --seed 202 case 290."""
    import io

    import numpy as np
    pytest.importorskip("PIL")
    from PIL import Image

    nrng = np.random.default_rng(12345)
    h, w = 16, 15
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 255 / w + yy * 255 / h) / 2
    ch = np.clip(base + nrng.normal(0, 30, size=(h, w)), 0,
                 255).astype(np.uint8)
    arr = np.stack([ch, np.roll(ch, 7, 0), np.roll(ch, 13, 1)], axis=-1)
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(
        buf, "JPEG", quality=95, subsampling=1, progressive=True,
        restart_marker_blocks=7)
    data = buf.getvalue()
    for cut in range(len(data) // 2, len(data), 7):
        trunc = data[:cut]
        try:
            lep = compress(trunc, max_threads=2, allow_progressive=True)
        except Exception:
            continue  # clean rejection of an unparseable slice is fine
        assert decompress(lep) == trunc, cut
