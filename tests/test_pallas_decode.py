"""Pallas decode kernel parity: the Mosaic block decoder
(kernels/pallas_decode) must produce exactly the planes of the XLA
decode kernel / host decoder.  Runs in Pallas interpret mode on a tiny
synthetic image (the real-silicon gates live in bench.py and the slow
TPU suite)."""
import io
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from lepton_tpu.api import (  # noqa: E402
    _color_tables, _truncation_geometry, compress, decompress)
from lepton_tpu.container.format import read_container  # noqa: E402
from lepton_tpu.container.mux import MuxReader  # noqa: E402
from lepton_tpu.jpeg.imageinfo import image_info_from_header  # noqa: E402


def _tiny_jpeg(w=32, h=24, seed=3, subsampling=2, quality=85):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 255 / w + yy * 255 / h) / 2
    ch = np.clip(base + rng.normal(0, 30, (h, w)), 0, 255).astype(np.uint8)
    arr = np.stack([ch, np.roll(ch, 3, 0), np.roll(ch, 5, 1)], -1)
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, "JPEG", quality=quality,
                                     subsampling=subsampling)
    return buf.getvalue()


def _demux(lep):
    """Container -> (streams, geometry) exactly as decompress_tpu does."""
    hdr, mux_region = read_container(lep)
    info = image_info_from_header(hdr.hdrdata, allow_34=True)
    max_heights, comp_sizes = _truncation_geometry(info, hdr)
    handoffs = hdr.handoffs
    handoffs[-1].luma_y_end = info.cmpnfo[0].bcv
    demux = MuxReader(mux_region)
    streams = [bytes(demux.buffers[i]) for i in range(len(handoffs))]
    splits_y = [th.luma_y_start for th in handoffs]
    shapes = [(info.cmpnfo[c].bcv, info.cmpnfo[c].bch)
              for c in range(info.cmpc)]
    return (streams, shapes, _color_tables(info), info.mcuv,
            max_heights, comp_sizes, splits_y)


@pytest.mark.parametrize("nseg", [1, 2])
def test_pallas_decode_parity_interpret(nseg):
    from lepton_tpu.kernels.pallas_decode import decode_segments_pallas
    from lepton_tpu.kernels.vpx_decode import decode_segments_tpu

    data = _tiny_jpeg()
    lep = compress(data, max_threads=nseg, min_threads=nseg)
    assert decompress(lep) == data
    args = _demux(lep)
    want, err_w = decode_segments_tpu(
        *args, color_index=lambda c: 0 if c == 0 else 1)
    got, err_g = decode_segments_pallas(
        *args, color_index=lambda c: 0 if c == 0 else 1, interpret=True)
    assert not err_w.any() and not err_g.any()
    for c, (w, g) in enumerate(zip(want, got)):
        assert np.array_equal(w, g), (
            c, np.argwhere(w != g)[:5], w[w != g][:5], g[w != g][:5])


@pytest.mark.parametrize("coder", ["vpx", "ans"])
def test_pallas_decode_template_parity_interpret(coder, synth_model,
                                                 monkeypatch):
    """Trained-model arena init: the Mosaic kernel's template copy and
    the XLA kernel's templated state_init produce the host decoder's
    planes exactly (LEPTON_COMPRESSION_MODEL, model.cc:407-421)."""
    from lepton_tpu import api
    from lepton_tpu.kernels.pallas_decode import decode_segments_pallas
    from lepton_tpu.kernels.vpx_decode import decode_segments_tpu

    monkeypatch.setenv("LEPTON_COMPRESSION_MODEL", synth_model)
    monkeypatch.delenv("LEPTON_COMPRESSION_MODEL_OUT", raising=False)
    tpl = api._model_template_packed()
    data = _tiny_jpeg(seed=11)
    lep = compress(data, max_threads=2, min_threads=2,
                   version=3 if coder == "ans" else 1)
    assert decompress(lep) == data
    args = _demux(lep)
    want, err_w = decode_segments_tpu(
        *args, color_index=lambda c: 0 if c == 0 else 1, coder=coder,
        template=tpl)
    got, err_g = decode_segments_pallas(
        *args, color_index=lambda c: 0 if c == 0 else 1, interpret=True,
        coder=coder, template=tpl)
    assert not err_w.any() and not err_g.any()
    for c, (w, g) in enumerate(zip(want, got)):
        assert np.array_equal(w, g), (
            c, np.argwhere(w != g)[:5], w[w != g][:5], g[w != g][:5])


def test_pallas_decode_multi_heterogeneous_interpret():
    """Serving decode batching (VERDICT r4 item 5): TWO containers with
    different geometry/qtables decode in ONE multi-request kernel call,
    each request's planes matching the XLA kernel's exactly (rowdesc
    comp_tab routes each lane to its own image's color tables)."""
    from lepton_tpu.kernels.pallas_decode import \
        decode_segments_pallas_multi
    from lepton_tpu.kernels.vpx_decode import decode_segments_tpu

    data_a = _tiny_jpeg(seed=5)
    data_b = _tiny_jpeg(w=48, h=16, seed=7, quality=70)
    reqs = []
    wants = []
    for data, nseg in ((data_a, 2), (data_b, 1)):
        lep = compress(data, max_threads=nseg, min_threads=nseg)
        assert decompress(lep) == data
        (streams, shapes, colors, mcuv, mh, cs, splits_y) = _demux(lep)
        ci = lambda c: 0 if c == 0 else 1  # noqa: E731
        reqs.append(dict(streams=streams, plane_shapes=shapes,
                         color_tables=colors, mcuv=mcuv,
                         max_coded_heights=mh, component_sizes=cs,
                         splits_y=splits_y, color_index=ci))
        want, err_w = decode_segments_tpu(
            streams, shapes, colors, mcuv, mh, cs, splits_y,
            color_index=ci)
        assert not err_w.any()
        wants.append(want)
    res = decode_segments_pallas_multi(reqs, interpret=True)
    assert len(res) == 2
    for want, (got, err_g) in zip(wants, res):
        assert not err_g.any()
        for c, (w, g) in enumerate(zip(want, got)):
            assert np.array_equal(w, g), (
                c, np.argwhere(w != g)[:5])


def test_batch_decompress_tpu_mixed():
    """api.batch_decompress_tpu: mode-Z and mode-Y containers mixed; the
    device-coverable ones ride the batch, mode Y falls back to the host
    decoder, and every reply is the original JPEG."""
    from lepton_tpu.api import batch_decompress_tpu, generic_compress

    data_a = _tiny_jpeg(seed=13)
    data_b = _tiny_jpeg(w=40, h=40, seed=17)
    lep_a = compress(data_a, max_threads=2, min_threads=2)
    lep_b = compress(data_b, max_threads=1)
    lep_y = generic_compress(b"not a jpeg at all")      # mode Y
    outs = batch_decompress_tpu([lep_a, lep_y, lep_b])
    assert outs[0] == data_a
    assert outs[1] == b"not a jpeg at all"
    assert outs[2] == data_b


@pytest.mark.parametrize("nseg", [1, 2])
def test_pallas_decode_ans_parity_interpret(nseg):
    """The Mosaic rANS forward reader (coder='ans') matches the XLA ANS
    kernel's planes on a v3 container."""
    from lepton_tpu.kernels.pallas_decode import decode_segments_pallas
    from lepton_tpu.kernels.vpx_decode import decode_segments_tpu

    data = _tiny_jpeg(seed=9)
    lep = compress(data, max_threads=nseg, min_threads=nseg, version=3)
    assert decompress(lep) == data
    args = _demux(lep)
    want, err_w = decode_segments_tpu(
        *args, color_index=lambda c: 0 if c == 0 else 1, coder="ans")
    got, err_g = decode_segments_pallas(
        *args, color_index=lambda c: 0 if c == 0 else 1, interpret=True,
        coder="ans")
    assert not err_w.any() and not err_g.any()
    for c, (w, g) in enumerate(zip(want, got)):
        assert np.array_equal(w, g), (
            c, np.argwhere(w != g)[:5], w[w != g][:5], g[w != g][:5])
