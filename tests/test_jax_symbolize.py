"""JAX symbolization parity: the on-device (branch, bit) emission must
match the native C symbolizer stream-exactly, and compress_tpu with the
JAX symbolizer must produce byte-identical containers.

Mirrors the reference's determinism strategy (SURVEY.md section 5:
DEBUG_ARICODER bit-trace diffing between implementations).
"""
import os

import numpy as np
import pytest

import lepton_tpu._native as _native
from lepton_tpu.api import (_native_image, _truncation_geometry, compress,
                            compress_tpu, decompress, image_info_from_header,
                            parse_jpeg)
from lepton_tpu.jpeg.decoder import decode_scans
from lepton_tpu.kernels import symbolize as S
from lepton_tpu.kernels.encode_pipeline import symbolize_image
from lepton_tpu.model.context import ColorTables

IMAGES = "/root/reference/images"

pytestmark = pytest.mark.skipif(not _native.available(),
                                reason="native oracle unavailable")


def _setup(name):
    data = open(os.path.join(IMAGES, name), "rb").read()
    parsed = parse_jpeg(data)
    info = image_info_from_header(parsed.hdrdata)
    dec = decode_scans(parsed, info)
    mh, cs = _truncation_geometry(info, dec)
    return data, parsed, info, dec, mh, cs


@pytest.mark.parametrize("name,splits", [
    ("nofsync.jpg", [0]),            # truncated (early EOF), color
    ("nofsync.jpg", [0, 4, 8]),      # multi-segment over truncation
    ("androidcrop.jpg", [0, 13, 26, 39]),
])
def test_symbol_stream_parity(name, splits):
    """JAX emission == native C symbolizer, stream-exactly, per segment."""
    data, parsed, info, dec, mh, cs = _setup(name)
    colors = [ColorTables(info.qtables[info.cmpnfo[c].qtable_index])
              for c in range(info.cmpc)]
    segs, _ = symbolize_image(list(dec.planes), colors, info.mcuv,
                              mh, cs, splits)
    native = _native_image(info, dec.planes, mh, cs)
    bcv = info.cmpnfo[0].bcv
    bounds = list(splits) + [bcv]
    for s in range(len(splits)):
        idx_ref, bit_ref = _native.native_symbolize_segment(
            native, bounds[s], bounds[s + 1], s == len(splits) - 1)
        ji, jb = segs[s]
        assert len(ji) == len(idx_ref), (s, len(ji), len(idx_ref))
        assert np.array_equal(ji, np.asarray(idx_ref))
        assert np.array_equal(jb.astype(np.uint8),
                              np.asarray(bit_ref).astype(np.uint8))


def test_compress_tpu_jax_byte_identical():
    """compress_tpu(symbolizer='jax') == compress_tpu(symbolizer='native')
    == host compress with the same segmentation, and roundtrips."""
    data = open(os.path.join(IMAGES, "androidcrop.jpg"), "rb").read()
    lep_jax = compress_tpu(data, num_segments=4)
    lep_nat = compress_tpu(data, num_segments=4, symbolizer="native")
    assert lep_jax == lep_nat
    # choose_num_threads downgrades this 96K image to one segment
    # on both paths (jpgcoder.cc small-image thread rule)
    lep_host = compress(data)
    assert lep_jax == lep_host
    assert decompress(lep_jax) == data


def test_compress_tpu_jax_truncated_roundtrip():
    """Early-EOF bookkeeping flows through the JAX symbolizer."""
    data = open(os.path.join(IMAGES, "nofsync.jpg"), "rb").read()
    lep = compress_tpu(data, num_segments=2)
    assert decompress(lep) == data
    assert lep == compress_tpu(data, num_segments=2, symbolizer="native")


def test_compress_tpu_v3_rans():
    """TPU rANS (v3) path: on-device adv-model pass + reverse rANS chain
    must match the host ANS encoder byte-for-byte and roundtrip."""
    data = open(os.path.join(IMAGES, "nofsync.jpg"), "rb").read()
    v3 = compress_tpu(data, num_segments=2, version=3)
    assert v3 == compress(data, version=3)
    assert decompress(v3) == data


def test_tpu_rans_reference_interop(ref_binary_ans=None):
    """The TPU-produced v3 container decodes in the ANS reference build
    (bidirectional interop gate, reference jpgcoder.cc:1121-1127)."""
    import subprocess
    binpath = "/tmp/refbuild-ans/lepton"
    if not os.path.exists(binpath):
        pytest.skip("ANS reference build unavailable")
    data = open(os.path.join(IMAGES, "androidcrop.jpg"), "rb").read()
    lep = compress_tpu(data, num_segments=4, version=3)
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        lp = os.path.join(d, "x.lep")
        jp = os.path.join(d, "x.jpg")
        open(lp, "wb").write(lep)
        r = subprocess.run([binpath, "-unjailed", lp, jp],
                           capture_output=True, timeout=300)
        assert r.returncode == 0, r.stderr.decode()[-500:]
        assert open(jp, "rb").read() == data


@pytest.mark.parametrize("name", ["trailingrst.jpg", "gray2sf.jpg",
                                  "singlerowtrunc.jpg"])
def test_tpu_paths_edge_corpus(name):
    """Edge-case corpus through both TPU pipelines: RST-heavy, 2-sampling
    grayscale, mid-row truncation -- byte-identical encode + TPU decode."""
    from lepton_tpu.api import decompress_tpu
    data = open(os.path.join(IMAGES, name), "rb").read()
    lep = compress_tpu(data, num_segments=4)
    assert lep == compress_tpu(data, num_segments=4, symbolizer="native")
    assert decompress(lep) == data
    assert decompress_tpu(lep) == data


def test_batch_compress_tpu():
    """Multi-image batch encode: all images' segments share one phase-B
    invocation; per-image output byte-identical to compress_tpu."""
    from lepton_tpu.api import batch_compress_tpu
    blobs = [open(os.path.join(IMAGES, n), "rb").read()
             for n in ("nofsync.jpg", "androidcrop.jpg")]
    leps = batch_compress_tpu(blobs, num_segments=4)
    for blob, lep in zip(blobs, leps):
        assert lep == compress_tpu(blob, num_segments=4)
        assert decompress(lep) == blob


def test_batch_compress_tpu_v3():
    """rANS (format v3) lanes in the batch pipeline: byte-identical to
    the host v3 encoder and to compress_tpu(version=3)."""
    from lepton_tpu.api import batch_compress_tpu, compress
    blobs = [open(os.path.join(IMAGES, n), "rb").read()
             for n in ("nofsync.jpg", "androidcrop.jpg")]
    leps = batch_compress_tpu(blobs, num_segments=4, version=3)
    for blob, lep in zip(blobs, leps):
        assert lep == compress(blob, max_threads=4, version=3)
        assert decompress(lep) == blob


def test_batch_outcap_overflow_fallback(monkeypatch):
    """A lane whose coder output exceeds the fused path's static OUTCAP
    must fall back to the unfused sort-compacted pack and still produce
    byte-identical containers (the adversarial-input guard)."""
    from lepton_tpu.api import batch_compress_tpu
    monkeypatch.setenv("LEPTON_TPU_OUTCAP_DIV", "4096")  # outcap floor
    # androidcrop's ~32KB-per-lane output far exceeds the 4096 floor
    blob = open(os.path.join(IMAGES, "androidcrop.jpg"), "rb").read()
    lep = batch_compress_tpu([blob], num_segments=4)[0]
    monkeypatch.delenv("LEPTON_TPU_OUTCAP_DIV")
    assert lep == compress_tpu(blob, num_segments=4)
    assert decompress(lep) == blob
