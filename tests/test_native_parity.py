"""C fast path vs pure-Python reference-semantics parity."""
import os

import numpy as np
import pytest

from lepton_tpu.api import _color_tables, _truncation_geometry
from lepton_tpu.codec.driver import ImageData, decode_segment, encode_segment
from lepton_tpu.constants import RASTER_TO_ZIGZAG
from lepton_tpu.jpeg.decoder import decode_scans
from lepton_tpu.jpeg.imageinfo import image_info_from_header
from lepton_tpu.jpeg.parser import parse_jpeg

_native = pytest.importorskip("lepton_tpu._native")

if not _native.available():
    pytest.skip("native toolchain unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def decoded(ref_images):
    data = open(os.path.join(ref_images, "nofsync.jpg"), "rb").read()
    parsed = parse_jpeg(data)
    info = image_info_from_header(parsed.hdrdata)
    dec = decode_scans(parsed, info)
    return data, parsed, info, dec


def test_c_encoder_matches_python(decoded):
    data, parsed, info, dec = decoded
    q = [np.asarray(info.qtables[info.cmpnfo[c].qtable_index])[
        RASTER_TO_ZIGZAG] for c in range(info.cmpc)]
    mh, cs = _truncation_geometry(info, dec)
    nat = _native.NativeImage(dec.planes, q, info.mcuv, mh, cs)
    bcv = info.cmpnfo[0].bcv
    half = bcv // 2
    image = ImageData([np.ascontiguousarray(p) for p in dec.planes],
                      _color_tables(info), info.mcuv, mh, cs)
    for (a, b, last) in [(0, half, False), (half, bcv, True)]:
        cseg = nat.encode_segment(a, b, last)
        pyseg = encode_segment(image, a, b, last)
        assert cseg == pyseg


def test_c_decoder_matches_python(decoded):
    data, parsed, info, dec = decoded
    q = [np.asarray(info.qtables[info.cmpnfo[c].qtable_index])[
        RASTER_TO_ZIGZAG] for c in range(info.cmpc)]
    mh, cs = _truncation_geometry(info, dec)
    nat = _native.NativeImage(dec.planes, q, info.mcuv, mh, cs)
    bcv = info.cmpnfo[0].bcv
    seg = nat.encode_segment(0, bcv, True)

    out_c = [np.zeros_like(p) for p in dec.planes]
    nat2 = _native.NativeImage(out_c, q, info.mcuv, mh, cs)
    nat2.decode_segment(seg, 0, bcv, True)
    for a, b in zip(dec.planes, nat2.planes):
        np.testing.assert_array_equal(a, b)

    out_py = [np.zeros_like(p) for p in dec.planes]
    image = ImageData(out_py, _color_tables(info), info.mcuv, mh, cs)
    decode_segment(image, seg, 0, bcv, True)
    for a, b in zip(dec.planes, out_py):
        np.testing.assert_array_equal(a, b)


def test_python_jpeg_layer_matches_native(decoded):
    data, parsed, info, dec = decoded
    info_py = image_info_from_header(parsed.hdrdata)
    dec_py = decode_scans(parsed, info_py, use_native=False)
    for a, b in zip(dec.planes, dec_py.planes):
        np.testing.assert_array_equal(a, b)
    assert dec.padbit == dec_py.padbit
    assert len(dec.handoffs) == len(dec_py.handoffs)
    for x, y in zip(dec.handoffs, dec_py.handoffs):
        assert (x.luma_y_start, x.segment_size, x.overhang_byte,
                x.num_overhang_bits, x.last_dc[:3]) == \
            (y.luma_y_start, y.segment_size, y.overhang_byte,
             y.num_overhang_bits, y.last_dc[:3])


def test_python_full_pipeline_roundtrip(decoded):
    """Pure-Python fallback path end-to-end (no native)."""
    data, parsed, info, dec = decoded
    from lepton_tpu.jpeg.recoder import recode_baseline_jpeg
    from lepton_tpu.container.handoff import select_splits
    info2 = image_info_from_header(parsed.hdrdata)
    garbage = parsed.garbage if parsed.garbage else b"\xff\xd9"
    splits = select_splits(dec.handoffs, 2)
    splits[-1].luma_y_end = info.cmpnfo[0].bcv
    out = recode_baseline_jpeg(parsed.hdrdata, dec.planes, splits, info2,
                               dec.padbit, parsed.rst_cnt, True,
                               parsed.rst_err, garbage, len(data),
                               use_native=False)
    assert out == data


def test_coefficient_out_of_range_guard(ref_images):
    """Coefficients whose exponent exceeds MAX_EXPONENT must abort the
    encode (encoder.cc:124-126 COEFFICIENT_OUT_OF_RANGE), not emit an
    undecodable stream."""
    import numpy as np
    import os
    import pytest
    from lepton_tpu.api import _native_image, _truncation_geometry
    from lepton_tpu.jpeg.decoder import decode_scans
    from lepton_tpu.jpeg.imageinfo import image_info_from_header
    from lepton_tpu.jpeg.parser import parse_jpeg
    from lepton_tpu.util.exitcodes import ExitCode, classify
    data = open(os.path.join(ref_images, "nofsync.jpg"), "rb").read()
    parsed = parse_jpeg(data)
    info = image_info_from_header(parsed.hdrdata)
    dec = decode_scans(parsed, info)
    dec.planes[0][3, 4, 10] = 3000   # bit_length 12 > MAX_EXPONENT
    mh, cs = _truncation_geometry(info, dec)
    img = _native_image(info, dec.planes, mh, cs)
    bcv = info.cmpnfo[0].bcv
    with pytest.raises(ValueError) as ei:
        img.encode_segment(0, bcv, True)
    assert classify(ei.value) == ExitCode.COEFFICIENT_OUT_OF_RANGE
    with pytest.raises(ValueError):
        img.encode_segment_ans(0, bcv, True)
