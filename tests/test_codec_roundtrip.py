"""Self-roundtrip of the token codec over synthetic coefficient planes."""
import numpy as np
import pytest

from lepton_tpu.codec.driver import (ImageData, decode_segment, encode_segment)
from lepton_tpu.model.context import ColorTables


def _random_planes(rng, shapes, max_coef=40):
    planes = []
    for (h, w) in shapes:
        p = rng.integers(-max_coef, max_coef + 1, size=(h, w, 64))
        # make it jpeg-like: mostly sparse high frequencies
        mask = rng.random(size=(h, w, 64)) < 0.7
        p[mask] = 0
        planes.append(p.astype(np.int16))
    return planes


_QT_LUMA = [16, 11, 10, 16, 24, 40, 51, 61,
            12, 12, 14, 19, 26, 58, 60, 55,
            14, 13, 16, 24, 40, 57, 69, 56,
            14, 17, 22, 29, 51, 87, 80, 62,
            18, 22, 37, 56, 68, 109, 103, 77,
            24, 35, 55, 64, 81, 104, 113, 92,
            49, 64, 78, 87, 103, 121, 120, 101,
            72, 92, 95, 98, 112, 100, 103, 99]
_QT_CHROMA = [17, 18, 24, 47, 99, 99, 99, 99,
              18, 21, 26, 66, 99, 99, 99, 99,
              24, 26, 56, 99, 99, 99, 99, 99,
              47, 66, 99, 99, 99, 99, 99, 99,
              99, 99, 99, 99, 99, 99, 99, 99,
              99, 99, 99, 99, 99, 99, 99, 99,
              99, 99, 99, 99, 99, 99, 99, 99,
              99, 99, 99, 99, 99, 99, 99, 99]


def _image(rng, shapes):
    planes = _random_planes(rng, shapes)
    colors = [ColorTables(_QT_LUMA)] + [
        ColorTables(_QT_CHROMA) for _ in shapes[1:]]
    return ImageData(planes, colors, mcuv=shapes[0][0])


@pytest.mark.parametrize("shapes,mcuv", [
    ([(4, 6)], 4),                       # grayscale
    ([(4, 4), (4, 4), (4, 4)], 4),       # 4:4:4
    ([(8, 8), (4, 4), (4, 4)], 4),       # 4:2:0
])
def test_single_segment_roundtrip(shapes, mcuv):
    rng = np.random.default_rng(42)
    planes = _random_planes(rng, shapes)
    colors = [ColorTables(_QT_LUMA)] + [
        ColorTables(_QT_CHROMA) for _ in shapes[1:]]
    image = ImageData(planes, colors, mcuv=mcuv)
    data = encode_segment(image, 0, image.heights[0], True)

    out_planes = [np.zeros_like(p) for p in planes]
    out = ImageData(out_planes, colors, mcuv=mcuv)
    decode_segment(out, data, 0, image.heights[0], True)
    for a, b in zip(planes, out_planes):
        np.testing.assert_array_equal(a, b)


def test_multi_segment_roundtrip():
    shapes = [(8, 8), (4, 4), (4, 4)]
    rng = np.random.default_rng(3)
    planes = _random_planes(rng, shapes)
    colors = [ColorTables(_QT_LUMA),
              ColorTables(_QT_CHROMA), ColorTables(_QT_CHROMA)]
    image = ImageData(planes, colors, mcuv=4)
    # two segments split at luma row 4 (mcu row boundary)
    seg0 = encode_segment(image, 0, 4, False)
    seg1 = encode_segment(image, 4, 8, True)

    out_planes = [np.zeros_like(p) for p in planes]
    out = ImageData(out_planes, colors, mcuv=4)
    decode_segment(out, seg0, 0, 4, False)
    decode_segment(out, seg1, 4, 8, True)
    for a, b in zip(planes, out_planes):
        np.testing.assert_array_equal(a, b)


def test_segments_are_independent():
    # a segment decodes identically whether or not other segments decoded
    shapes = [(8, 4)]
    rng = np.random.default_rng(9)
    planes = _random_planes(rng, shapes)
    colors = [ColorTables(_QT_LUMA)]
    image = ImageData(planes, colors, mcuv=8)
    seg1 = encode_segment(image, 4, 8, True)

    out_planes = [np.zeros_like(p) for p in planes]
    out = ImageData(out_planes, colors, mcuv=8)
    decode_segment(out, seg1, 4, 8, True)
    np.testing.assert_array_equal(planes[0][4:], out_planes[0][4:])
    assert not out_planes[0][:4].any()
