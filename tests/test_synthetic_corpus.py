"""Synthetic JPEG corpus: widen coverage beyond the reference's 22 images.

PIL-generated JPEGs sweeping subsampling, quality (including q=100 where
many quantizers are 1), optimized (custom) Huffman tables, restart
intervals, progressive scan scripts, grayscale, and odd dimensions.  Every
file must roundtrip bit-exactly; a sample is cross-checked against the
reference binary.
"""
import io
import os
import subprocess

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from lepton_tpu.api import compress, decompress  # noqa: E402

REF = "/tmp/refbuild/lepton"


def _img(w, h, seed=0, mode="RGB"):
    rng = np.random.default_rng(seed)
    # mix of smooth gradient + noise so blocks have realistic coefficients
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 255 / max(w, 1) + yy * 255 / max(h, 1)) / 2
    noise = rng.normal(0, 24, size=(h, w))
    ch = np.clip(base + noise, 0, 255).astype(np.uint8)
    if mode == "L":
        return Image.fromarray(ch, "L")
    arr = np.stack([ch, np.roll(ch, 7, 0), np.roll(ch, 13, 1)], axis=-1)
    return Image.fromarray(arr, "RGB")


def _jpeg(img, **kw) -> bytes:
    buf = io.BytesIO()
    img.save(buf, "JPEG", **kw)
    return buf.getvalue()


CASES = [
    ("444_q95", dict(quality=95, subsampling=0)),
    ("422_q50", dict(quality=50, subsampling=1)),
    ("420_q75", dict(quality=75, subsampling=2)),
    ("q100_flat_quant", dict(quality=100, subsampling=0)),
    ("q5_coarse", dict(quality=5, subsampling=2)),
    ("optimized_tables", dict(quality=80, optimize=True, subsampling=2)),
    ("restart_markers", dict(quality=80, restart_marker_blocks=4,
                             subsampling=2)),
    ("progressive", dict(quality=85, progressive=True, subsampling=2)),
    ("progressive_optimized", dict(quality=85, progressive=True,
                                   optimize=True, subsampling=0)),
]


@pytest.mark.parametrize("name,kw", CASES, ids=[c[0] for c in CASES])
def test_synthetic_roundtrip(name, kw):
    data = _jpeg(_img(200, 120, seed=hash(name) % 1000), **kw)
    lep = compress(data, allow_progressive=True)
    assert decompress(lep) == data, name
    assert len(lep) < len(data)


@pytest.mark.parametrize("w,h", [(1, 1), (7, 5), (8, 8), (9, 17),
                                 (1024, 16), (16, 1024), (257, 129)])
def test_odd_dimensions_roundtrip(w, h):
    data = _jpeg(_img(w, h, seed=w * 1000 + h), quality=80, subsampling=2)
    lep = compress(data)
    assert decompress(lep) == data


def test_grayscale_roundtrip():
    data = _jpeg(_img(123, 77, seed=3, mode="L"), quality=85)
    lep = compress(data)
    assert decompress(lep) == data


@pytest.mark.skipif(not os.path.exists(REF), reason="no reference binary")
@pytest.mark.parametrize("name,kw", [CASES[0], CASES[5], CASES[6]],
                         ids=["444_q95", "optimized_tables",
                              "restart_markers"])
def test_synthetic_reference_interop(tmp_path, name, kw):
    data = _jpeg(_img(160, 96, seed=hash(name) % 997), **kw)
    src = tmp_path / "s.jpg"
    src.write_bytes(data)
    ref_lep = tmp_path / "ref.lep"
    r = subprocess.run([REF, "-skipverify", "-unjailed", str(src),
                        str(ref_lep)], capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr
    assert compress(data) == ref_lep.read_bytes(), name
    out = tmp_path / "o.jpg"
    our_lep = tmp_path / "our.lep"
    our_lep.write_bytes(compress(data))
    r = subprocess.run([REF, "-unjailed", str(our_lep), str(out)],
                       capture_output=True, timeout=300)
    assert r.returncode == 0 and out.read_bytes() == data


def test_16bit_dqt_roundtrip():
    """DQT with 16-bit precision values (supported by the parser like the
    reference's 8/16-bit DQT handling): rewrite an 8-bit table segment to
    the 16-bit encoding (same values, so scan data stays valid)."""
    data = _jpeg(_img(96, 64, seed=42), quality=80, subsampling=2)
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
                assert pq_tq >> 4 == 0  # 8-bit source table
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
    patched = bytes(out)
    lep = compress(patched)
    assert decompress(lep) == patched


def test_grayscale_rst_quirk_verify_gate():
    """PIL grayscale+restart files can carry an RST numbering quirk that
    neither we nor the reference re-emit identically (verified: our .lep is
    byte-identical to the reference's, and the reference also fails its
    roundtrip, exit 41).  The verify gate must catch it and the permissive
    wrapper must still store it losslessly."""
    from lepton_tpu.api import compress_any, decompress_all
    r = np.random.default_rng(8)
    arr = r.integers(0, 256, size=(21, 233)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, "L").save(buf, "JPEG", quality=75, subsampling=2,
                                   optimize=True, restart_marker_blocks=3)
    data = buf.getvalue()
    lep = compress(data)
    if decompress(lep) == data:
        pytest.skip("this PIL build did not produce the RST quirk")
    with pytest.raises(Exception):
        compress_any(data, verify=True, permissive=False)
    wrapped = compress_any(data, verify=True, permissive=True)
    assert decompress_all(wrapped) == data


def _cmyk_jpeg(seed=1, w=120, h=80, **kw):
    r = np.random.default_rng(seed)
    arr = r.integers(0, 256, size=(h, w, 4)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, "CMYK").save(buf, "JPEG", quality=85, **kw)
    return buf.getvalue()


def test_cmyk_roundtrip():
    """4-component (CMYK) JPEGs: 4th plane on the chroma model class
    (ALLOW_FOUR_COLORS parity — BLOCK_TYPES stays 2, arena unchanged)."""
    from lepton_tpu.api import compress as _c
    data = _cmyk_jpeg()
    with pytest.raises(Exception):
        _c(data)  # default build parity: rejected
    lep = _c(data, allow_four_colors=True)
    assert decompress(lep) == data
    assert len(lep) < len(data)
    # v3 backend too
    lep3 = _c(data, allow_four_colors=True, version=3)
    assert decompress(lep3) == data


REF4C = "/tmp/refbuild-4c/lepton"


@pytest.mark.skipif(not os.path.exists(REF4C),
                    reason="no ALLOW_FOUR_COLORS reference build")
def test_cmyk_reference_interop(tmp_path):
    """Byte-identity + bidirectional interop with the reference built with
    -DALLOW_FOUR_COLORS."""
    data = _cmyk_jpeg(seed=7)
    src = tmp_path / "c.jpg"
    src.write_bytes(data)
    ref_lep = tmp_path / "c_ref.lep"
    r = subprocess.run([REF4C, "-unjailed", "-skipverify", str(src),
                        str(ref_lep)], capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr
    ours = compress(data, allow_four_colors=True)
    assert ours == ref_lep.read_bytes()
    out = tmp_path / "c_out.jpg"
    our_lep = tmp_path / "c_ours.lep"
    our_lep.write_bytes(ours)
    r = subprocess.run([REF4C, "-unjailed", str(our_lep), str(out)],
                       capture_output=True, timeout=300)
    assert r.returncode == 0 and out.read_bytes() == data
    assert decompress(ref_lep.read_bytes()) == data


def test_cmyk_cli(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lepton = os.path.join(repo, "lepton")
    src = str(tmp_path / "c.jpg")
    open(src, "wb").write(_cmyk_jpeg(seed=9))
    r = subprocess.run([lepton, src, str(tmp_path / "c.lep")],
                       capture_output=True, timeout=300)
    assert r.returncode == 4  # UNSUPPORTED_4_COLORS without the flag
    r = subprocess.run([lepton, "-allowfourcolors", src,
                        str(tmp_path / "c.lep")], capture_output=True,
                       timeout=300)
    assert r.returncode == 0, r.stderr
    r = subprocess.run([lepton, str(tmp_path / "c.lep"),
                        str(tmp_path / "c_out.jpg")], capture_output=True,
                       timeout=300)
    assert r.returncode == 0
    assert open(str(tmp_path / "c_out.jpg"), "rb").read() == \
        open(src, "rb").read()


def _sampled_jpeg(sf_byte: int, seed=0):
    """Synthesize a JPEG whose luma uses the given SOF sampling byte by
    re-emitting random coefficients through our own recoder over a
    standard-table header (PIL, no optimize)."""
    from lepton_tpu.jpeg.decoder import ThreadHandoff, decode_scans
    from lepton_tpu.jpeg.imageinfo import image_info_from_header
    from lepton_tpu.jpeg.parser import parse_jpeg
    from lepton_tpu.jpeg.recoder import recode_baseline_jpeg
    r = np.random.default_rng(seed)
    arr = r.integers(0, 256, size=(96, 120, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, "JPEG", quality=90, subsampling=2)
    parsed = parse_jpeg(buf.getvalue())
    hdr = bytearray(parsed.hdrdata)
    i = 0
    while i < len(hdr) - 3:
        if hdr[i] == 0xFF and hdr[i + 1] in (0xC0, 0xC1):
            hdr[i + 11] = sf_byte
            break
        i += 2 + ((hdr[i + 2] << 8) | hdr[i + 3])
    hdrdata = bytes(hdr)
    info = image_info_from_header(hdrdata, allow_34=True)
    rng = np.random.default_rng(seed)
    planes = []
    for c in range(info.cmpc):
        ci = info.cmpnfo[c]
        p = rng.integers(-20, 21, size=(ci.bcv, ci.bch, 64)).astype(np.int16)
        p[rng.random(size=p.shape) < 0.85] = 0
        planes.append(p)
    th = ThreadHandoff(luma_y_start=0, luma_y_end=info.cmpnfo[0].bcv,
                       overhang_byte=0, num_overhang_bits=0,
                       last_dc=[0, 0, 0, 0])
    jpg = recode_baseline_jpeg(hdrdata, planes, [th], info, 0, None, False,
                               [], b"\xff\xd9", 10_000_000)
    # self-consistency of the synthesizer
    p2 = parse_jpeg(jpg)
    i2 = image_info_from_header(p2.hdrdata, allow_34=True)
    dec = decode_scans(p2, i2)
    assert all(np.array_equal(dec.planes[c], planes[c])
               for c in range(info.cmpc))
    return jpg


@pytest.mark.parametrize("sf_byte", [0x31, 0x13, 0x41, 0x33])
def test_34_sampling_roundtrip(sf_byte):
    """Sampling factors 3-4 (the reference's ALLOW_3_OR_4_SCALING_FACTOR
    build): accepted behind allow_34_sampling, rejected with exit 10 by
    default."""
    from lepton_tpu.util.exitcodes import ExitCode, classify
    jpg = _sampled_jpeg(sf_byte)
    with pytest.raises(Exception) as ei:
        compress(jpg)
    assert classify(ei.value) == ExitCode.SAMPLING_BEYOND_TWO_UNSUPPORTED
    lep = compress(jpg, allow_34_sampling=True)
    assert decompress(lep) == jpg


REF34 = "/tmp/refbuild-34/lepton"


@pytest.mark.skipif(not os.path.exists(REF34),
                    reason="no ALLOW_3_OR_4 reference build")
def test_34_sampling_reference_interop(tmp_path):
    jpg = _sampled_jpeg(0x31, seed=5)
    src = tmp_path / "s34.jpg"
    src.write_bytes(jpg)
    ref_lep = tmp_path / "s34.lep"
    r = subprocess.run([REF34, "-unjailed", "-skipverify", str(src),
                        str(ref_lep)], capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr
    ours = compress(jpg, allow_34_sampling=True)
    assert ours == ref_lep.read_bytes()
    out = tmp_path / "s34out.jpg"
    mine = tmp_path / "mine.lep"
    mine.write_bytes(ours)
    r = subprocess.run([REF34, "-unjailed", str(mine), str(out)],
                       capture_output=True, timeout=300)
    assert r.returncode == 0 and out.read_bytes() == jpg
    assert decompress(ref_lep.read_bytes()) == jpg


def test_progressive_q100_quirk_parity():
    """Certain q=100 grayscale progressive files hit a reference encoder
    bug (its verify gate exits 41).  We reproduce the reference
    byte-for-byte -- same .lep, same (wrong) reconstruction -- and our
    verify gate catches it the same way."""
    from lepton_tpu.api import compress_any
    r = np.random.default_rng(331)
    arr = r.integers(0, 256, size=(467, 694)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, "L").save(buf, "JPEG", quality=100, subsampling=2,
                                   progressive=True)
    data = buf.getvalue()
    lep = compress(data, allow_progressive=True)
    if decompress(lep) == data:
        pytest.skip("this PIL build did not trigger the quirk")
    with pytest.raises(Exception):
        compress_any(data, verify=True, permissive=False,
                     allow_progressive=True)
    if os.path.exists(REF):
        src = "/tmp/_prog_quirk.jpg"
        open(src, "wb").write(data)
        r1 = subprocess.run([REF, "-unjailed", "-skipverify",
                             "-allowprogressive", src,
                             "/tmp/_prog_quirk.lep"], capture_output=True,
                            timeout=300)
        assert r1.returncode == 0
        assert lep == open("/tmp/_prog_quirk.lep", "rb").read()


def test_cmyk_tpu_paths():
    """4-component JPEGs through the TPU pipelines: on-device
    symbolization + two-pass coder (compress_tpu) and the lane-parallel
    decoder (decompress_tpu), byte-identical to the host encoder."""
    from lepton_tpu.api import (compress, compress_tpu, decompress,
                                decompress_tpu)
    data = _cmyk_jpeg()
    lep = compress_tpu(data, num_segments=2, allow_four_colors=True)
    assert lep == compress(data, allow_four_colors=True)
    assert decompress(lep) == data
    assert decompress_tpu(lep) == data
