"""Corpus roundtrip + reference-binary interop gates.

Mirrors the reference's golden-corpus strategy (SURVEY.md section 4): every
supported file must roundtrip bit-exactly; when the reference binary is
available, our .lep must byte-match its output and cross-decode.
"""
import hashlib
import os
import subprocess

import pytest

from lepton_tpu.api import compress, decompress

BASELINE_FILES = [
    "colorswap.jpg", "nofsync.jpg", "narrowrst.jpg", "gray2sf.jpg",
    "androidcropoptions.jpg", "trailingrst.jpg", "trailingrst2.jpg",
    "singlerowtrunc.jpg", "truncatedzerorun.jpg",
]
PROGRESSIVE_FILES = ["iphoneprogressive2.jpg"]

GOLDEN_LEP_MD5 = {
    # md5s from the reference test suite shell scripts
    "iphone16.lep": "8ea9fcf1b2c24877aa838dd6ac1df413",
    "gold-legacy.lep": "9ffbfc24d1157d0b1ed7a9b53bef4c23",
    "narrowrst.lep": "07e9021d35114bd69f44f5bc1c3788e3",
}


@pytest.mark.parametrize("name", BASELINE_FILES)
def test_baseline_roundtrip(ref_images, name):
    data = open(os.path.join(ref_images, name), "rb").read()
    lep = compress(data)
    assert decompress(lep) == data
    assert len(lep) < len(data)


@pytest.mark.parametrize("name", PROGRESSIVE_FILES)
def test_progressive_roundtrip(ref_images, name):
    data = open(os.path.join(ref_images, name), "rb").read()
    lep = compress(data, allow_progressive=True)
    assert decompress(lep) == data
    assert len(lep) < len(data)


@pytest.mark.parametrize("name", [
    "colorswap.jpg", "narrowrst.jpg", "gray2sf.jpg", "trailingrst.jpg",
    "nofsync.jpg", "androidcrop.jpg", "androidtrail.jpg", "android.jpg",
    "iphonecrop2.jpg", "grayscale.jpg", "iphonecrop.jpg",
    "androidcropoptions.jpg", "trailingrst2.jpg", "singlerowtrunc.jpg",
    "truncatedzerorun.jpg"])
def test_lep_byte_identical_to_reference(ref_images, ref_binary, name, tmp_path):
    src = os.path.join(ref_images, name)
    data = open(src, "rb").read()
    ref_lep = tmp_path / "ref.lep"
    r = subprocess.run([ref_binary, "-skipverify", src, str(ref_lep)],
                       capture_output=True)
    assert r.returncode == 0, r.stderr
    assert compress(data) == ref_lep.read_bytes()


@pytest.mark.parametrize("name", ["nofsync.jpg", "narrowrst.jpg",
                                  "android.jpg", "grayscale.jpg",
                                  "iphonecrop.jpg", "trailingrst.jpg"])
def test_reference_decodes_our_lep(ref_images, ref_binary, name, tmp_path):
    src = os.path.join(ref_images, name)
    data = open(src, "rb").read()
    our_lep = tmp_path / "our.lep"
    our_lep.write_bytes(compress(data))
    out_jpg = tmp_path / "out.jpg"
    r = subprocess.run([ref_binary, str(our_lep), str(out_jpg)],
                       capture_output=True)
    assert r.returncode == 0, r.stderr
    assert out_jpg.read_bytes() == data


@pytest.mark.parametrize("name,md5", sorted(GOLDEN_LEP_MD5.items()))
def test_golden_lep_decode(ref_images, name, md5):
    """Format-compat gates: 16-segment, legacy v1, v2 brotli headers."""
    data = open(os.path.join(ref_images, name), "rb").read()
    out = decompress(data)
    assert hashlib.md5(out).hexdigest() == md5


@pytest.mark.parametrize("name", ["iphonecity.jpg", "slrindoor.jpg"])
def test_large_slr_phone_files(ref_images, ref_binary, name, tmp_path):
    """The two corpus files with dedicated reference targets that no
    other test covered (test_phone_outdoor = iphonecity,
    test_slow_slr = slrindoor): roundtrip bit-exact and byte-match the
    reference encoder (Makefile.am:277-279)."""
    src = os.path.join(ref_images, name)
    data = open(src, "rb").read()
    lep = compress(data)
    assert decompress(lep) == data
    ref_lep = tmp_path / "ref.lep"
    r = subprocess.run([ref_binary, "-skipverify", src, str(ref_lep)],
                       capture_output=True)
    assert r.returncode == 0, r.stderr
    assert lep == ref_lep.read_bytes()


def test_phone_outdoor_zlib_header(ref_images):
    """The reference's ZLIB_HEADER variant of the iphonecity gate
    (Makefile.am:278): the container rides in a zlepton (zeta-magic)
    wrapper and decodes through the stored-zlib output path."""
    import zlib
    from lepton_tpu import cli
    from lepton_tpu.constants import ZLEPTON_HEADER
    data = open(os.path.join(ref_images, "iphonecity.jpg"), "rb").read()
    lep = compress(data)
    zlep = ZLEPTON_HEADER + lep[2:]     # zeta magic (jpgcoder.cc:552)
    assert cli.sniff(zlep) == "zlepton"
    out, kind = cli._process(zlep, {"permissive": False})
    assert kind == "lepton"
    assert zlib.decompress(out) == data


def test_expected_failure_bad_zero_run(ref_images):
    data = open(os.path.join(ref_images, "badzerorun.jpg"), "rb").read()
    with pytest.raises(Exception):
        compress(data)


def test_arithmetic_jpeg_rejected(ref_images):
    data = open(os.path.join(ref_images, "arithmetic.jpg"), "rb").read()
    with pytest.raises(Exception):
        compress(data)
