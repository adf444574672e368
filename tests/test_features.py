"""Feature-level tests: permissive wrapper, UJG, truncation, concat, CLI."""
import os
import subprocess
import sys

import pytest

from lepton_tpu.api import (compress, compress_any, decompress,
                            decompress_all, generic_compress, ujg_compress,
                            ujg_decompress)


def test_generic_compress_roundtrip():
    payload = bytes(range(256)) * 37
    lep = generic_compress(payload)
    assert decompress(lep) == payload


def test_generic_compress_via_reference(ref_binary, tmp_path):
    payload = b"arbitrary \x00\xff bytes" * 99
    lep = generic_compress(payload)
    f = tmp_path / "g.lep"
    f.write_bytes(lep)
    out = tmp_path / "g.out"
    r = subprocess.run([ref_binary, str(f), str(out)], capture_output=True)
    assert r.returncode == 0, r.stderr
    assert out.read_bytes() == payload


def test_compress_any_permissive_fallback():
    data = b"not a jpeg at all"
    with pytest.raises(Exception):
        compress_any(data, permissive=False)


def test_ujg_roundtrip(ref_images):
    data = open(os.path.join(ref_images, "nofsync.jpg"), "rb").read()
    assert ujg_decompress(ujg_compress(data)) == data


def test_truncated_input_roundtrip(ref_images):
    data = open(os.path.join(ref_images, "androidcrop.jpg"), "rb").read()
    for n in (30000, 50001):
        prefix = data[:n]
        assert decompress(compress(prefix)) == prefix


def test_concatenated_decode(ref_images):
    a = open(os.path.join(ref_images, "colorswap.jpg"), "rb").read()
    b = open(os.path.join(ref_images, "nofsync.jpg"), "rb").read()
    blob = compress(a) + compress(b)
    assert decompress_all(blob) == a + b


def test_cli_roundtrip(ref_images, tmp_path):
    src = os.path.join(ref_images, "nofsync.jpg")
    lep = tmp_path / "x.lep"
    jpg = tmp_path / "x.jpg"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    r = subprocess.run([sys.executable, os.path.join(repo, "lepton"),
                        src, str(lep)], capture_output=True, env=env)
    assert r.returncode == 0, r.stderr
    r = subprocess.run([sys.executable, os.path.join(repo, "lepton"),
                        str(lep), str(jpg)], capture_output=True, env=env)
    assert r.returncode == 0, r.stderr
    assert jpg.read_bytes() == open(src, "rb").read()


def test_cli_alias_flags_and_jailed_billing(ref_images, tmp_path):
    """Reference flag aliases (-skipvalidation/-roundtrip/-v<i>/-p/-d/-dev/
    -o/-ujpg, jpgcoder.cc:1001-1151) parse, and -v2's print_bill runs
    INSIDE the default-on jail (regression: billing imported modules
    post-jail, so openat died with SIGSYS instead of printing the bill)."""
    src = os.path.join(ref_images, "nofsync.jpg")
    lep = tmp_path / "a.lep"
    jpg = tmp_path / "a.jpg"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, os.path.join(repo, "lepton"),
                        "-skipvalidation", "-roundtrip", "-v5", "-p", "-d",
                        "-dev", "-o", src, str(lep)], capture_output=True)
    assert r.returncode == 0, (r.returncode, r.stderr)
    assert b"TOTAL" in r.stderr          # the 26-category bill printed
    r = subprocess.run([sys.executable, os.path.join(repo, "lepton"),
                        "-verification", str(lep), str(jpg)],
                       capture_output=True)
    assert r.returncode == 0, r.stderr
    assert jpg.read_bytes() == open(src, "rb").read()


def test_cli_zlepton_decode_jailed(ref_images, tmp_path):
    """zlepton (zeta-magic) input decodes to a stored-zlib stream INSIDE
    the default-on jail (jpgcoder.cc:552,2204-2220).  Regression: the
    zlib0 wrapper module was imported post-jail, so openat died with
    SIGSYS (exit 159) instead of producing output."""
    import zlib
    data = open(os.path.join(ref_images, "nofsync.jpg"), "rb").read()
    zlep = tmp_path / "z.lep"
    zlep.write_bytes(bytes([0xCE, 0xB6]) + compress(data)[2:])
    out = tmp_path / "z.out"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, os.path.join(repo, "lepton"),
                        str(zlep), str(out)], capture_output=True)
    assert r.returncode == 0, (r.returncode, r.stderr)
    assert zlib.decompress(out.read_bytes()) == data


def test_sixteen_segment_encode(ref_images, ref_binary, tmp_path):
    """More segments than reference worker threads (logical>physical)."""
    data = open(os.path.join(ref_images, "androidcrop.jpg"), "rb").read()
    lep = compress(data, max_threads=16, min_threads=16)
    assert lep[4] == 16
    assert decompress(lep) == data
    f = tmp_path / "s16.lep"
    f.write_bytes(lep)
    out = tmp_path / "s16.jpg"
    r = subprocess.run([ref_binary, str(f), str(out)], capture_output=True)
    assert r.returncode == 0, r.stderr
    assert out.read_bytes() == data


def test_billing_accounting(ref_images):
    import numpy as np
    from lepton_tpu import _native
    from lepton_tpu.api import _truncation_geometry
    from lepton_tpu.constants import RASTER_TO_ZIGZAG
    from lepton_tpu.jpeg.decoder import decode_scans
    from lepton_tpu.jpeg.imageinfo import image_info_from_header
    from lepton_tpu.jpeg.parser import parse_jpeg
    from lepton_tpu.util.billing import bill_symbol_stream
    if not _native.available():
        pytest.skip("needs native")
    data = open(os.path.join(ref_images, "colorswap.jpg"), "rb").read()
    parsed = parse_jpeg(data)
    info = image_info_from_header(parsed.hdrdata)
    dec = decode_scans(parsed, info)
    q = [np.asarray(info.qtables[info.cmpnfo[c].qtable_index])[
        RASTER_TO_ZIGZAG] for c in range(info.cmpc)]
    mh, cs = _truncation_geometry(info, dec)
    nat = _native.NativeImage(dec.planes, q, info.mcuv, mh, cs)
    idx, bit = _native.native_symbolize_segment(
        nat, 0, info.cmpnfo[0].bcv, True)
    bill = bill_symbol_stream(idx)
    assert sum(bill.values()) == len(idx)
    assert bill["NZ_7x7"] == 6 * sum(
        p.shape[0] * p.shape[1] for p in dec.planes)


def test_ans_v3_roundtrip(ref_images):
    """rANS entropy backend (format v3, SURVEY.md section 2.4)."""
    data = open(os.path.join(ref_images, "colorswap.jpg"), "rb").read()
    lep = compress(data, version=3)
    assert lep[2] == 3
    assert decompress(lep) == data


def test_ans_coder_unit():
    """rANS bool coding roundtrip (reference test_invariants.cc:346)."""
    import random
    from lepton_tpu.coder.ans import ANSReader, ANSWriter, adv_update_branch
    rng = random.Random(3)
    bits = [rng.randrange(2) for _ in range(4001)]
    state = (1, 1, 128)
    w = ANSWriter()
    for b in bits:
        w.put_bit(b, state[2])
        state = adv_update_branch(state[0], state[1], bool(b))
    data = w.finish()
    r = ANSReader(data)
    state = (1, 1, 128)
    for b in bits:
        assert r.get_bit(state[2]) == b
        state = adv_update_branch(state[0], state[1], True if b else False)


def test_streaming_decode_byte_identical(ref_images):
    """O(width) streaming decode (api.decompress_streaming) must produce
    the same JPEG bytes as the full-framebuffer path, including on
    reference-produced multi-segment and legacy containers."""
    import os
    from lepton_tpu.api import compress, decompress, decompress_streaming
    for name in ("android.jpg", "iphonecrop.jpg", "gray2sf.jpg",
                 "narrowrst.jpg", "trailingrst.jpg"):
        data = open(os.path.join(ref_images, name), "rb").read()
        lep = compress(data)
        assert decompress_streaming(lep) == decompress(lep) == data, name
    for f in ("gold-legacy.lep", "iphone16.lep", "narrowrst.lep"):
        lep = open(os.path.join(ref_images, f), "rb").read()
        assert decompress_streaming(lep) == decompress(lep), f


def test_recodememory_streaming_bound(tmp_path, ref_images):
    """A bound big enough for the streaming decode but far below the full
    framebuffer must pass and decode bit-exactly (the -recodememory
    contract, jpgcoder.cc:1236-1330)."""
    import os
    import subprocess
    import sys as _sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lepton = os.path.join(repo, "lepton")
    src = os.path.join(ref_images, "slrhills.jpg")
    lep = str(tmp_path / "s.lep")
    jpg = str(tmp_path / "s.jpg")
    assert subprocess.run([lepton, src, lep], capture_output=True,
                          timeout=600).returncode == 0
    r = subprocess.run([lepton, "-recodememory=24M", lep, jpg],
                       capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr
    assert open(jpg, "rb").read() == open(src, "rb").read()
    # full-framebuffer would need ~64M of planes alone; 2M must refuse
    r = subprocess.run([lepton, "-recodememory=2M", lep,
                        str(tmp_path / "t.jpg")], capture_output=True,
                       timeout=600)
    assert r.returncode == 38


def test_ans_native_reference_interop(ref_images, tmp_path):
    """v3 (.lep ANS) bidirectional interop with the ANS-enabled reference
    build, through the native C backend."""
    import subprocess
    ref = "/tmp/refbuild-ans/lepton"
    if not os.path.exists(ref):
        pytest.skip("reference ANS build not present")
    src = os.path.join(ref_images, "nofsync.jpg")
    data = open(src, "rb").read()
    ours = compress(data, version=3)
    lep = str(tmp_path / "o.lep")
    open(lep, "wb").write(ours)
    out = str(tmp_path / "o.jpg")
    r = subprocess.run([ref, "-unjailed", lep, out], capture_output=True,
                       timeout=300)
    assert r.returncode == 0 and open(out, "rb").read() == data
    rl = str(tmp_path / "r.lep")
    r = subprocess.run([ref, "-ans", "-skipverify", "-unjailed", src, rl],
                       capture_output=True, timeout=300)
    assert r.returncode == 0
    assert decompress(open(rl, "rb").read()) == data


def test_custom_model_roundtrip(ref_images, tmp_path):
    """test_custom_table.sh equivalent: train a model on one image
    (LEPTON_COMPRESSION_MODEL_OUT), then encode+decode another image with
    the trained model preloaded (LEPTON_COMPRESSION_MODEL)."""
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lepton = os.path.join(repo, "lepton")
    model = str(tmp_path / "model.bin")
    env = dict(os.environ, LEPTON_COMPRESSION_MODEL_OUT=model)
    env.pop("LEPTON_COMPRESSION_MODEL", None)
    train = os.path.join(ref_images, "androidcrop.jpg")
    r = subprocess.run([lepton, "-skipverify", train,
                        str(tmp_path / "t.lep")], env=env,
                       capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr
    from lepton_tpu.model.tables import ARENA_SIZE
    assert os.path.getsize(model) == ARENA_SIZE * 3

    src = os.path.join(ref_images, "nofsync.jpg")
    data = open(src, "rb").read()
    env = dict(os.environ, LEPTON_COMPRESSION_MODEL=model)
    env.pop("LEPTON_COMPRESSION_MODEL_OUT", None)
    lep = str(tmp_path / "m.lep")
    jpg = str(tmp_path / "m.jpg")
    r = subprocess.run([lepton, src, lep], env=env, capture_output=True,
                       timeout=300)
    assert r.returncode == 0, r.stderr
    r = subprocess.run([lepton, lep, jpg], env=env, capture_output=True,
                       timeout=300)
    assert r.returncode == 0, r.stderr
    assert open(jpg, "rb").read() == data
    # a trained model changes the bitstream (and a plain decode without
    # the model must fail or mismatch)
    plain = compress(data)
    assert open(lep, "rb").read() != plain


def test_trained_model_tpu_paths(ref_images, synth_model, monkeypatch):
    """LEPTON_COMPRESSION_MODEL flows through the DEVICE kernels (VERDICT
    r4 item 5): compress_tpu / batch_compress_tpu are byte-identical to
    the host encoder under a trained model (v1 and v3), and
    decompress_tpu decodes the trained-model container bit-exactly --
    no host fallback anywhere."""
    from lepton_tpu import api
    from lepton_tpu.api import (batch_compress_tpu, compress, compress_tpu,
                                decompress, decompress_tpu)
    monkeypatch.setenv("LEPTON_COMPRESSION_MODEL", synth_model)
    monkeypatch.delenv("LEPTON_COMPRESSION_MODEL_OUT", raising=False)
    assert api._model_template_packed() is not None
    data = open(os.path.join(ref_images, "nofsync.jpg"), "rb").read()
    host = compress(data, max_threads=4)
    # the template must actually change the stream
    monkeypatch.delenv("LEPTON_COMPRESSION_MODEL")
    assert compress(data, max_threads=4) != host
    monkeypatch.setenv("LEPTON_COMPRESSION_MODEL", synth_model)

    tpu = compress_tpu(data, num_segments=4)
    assert tpu == host
    assert decompress_tpu(tpu, backend="xla") == data

    host3 = compress(data, max_threads=4, version=3)
    tpu3 = compress_tpu(data, num_segments=4, version=3)
    assert tpu3 == host3
    assert decompress_tpu(tpu3, backend="xla") == data

    data2 = open(os.path.join(ref_images, "iphonecrop.jpg"), "rb").read()
    batch = batch_compress_tpu([data, data2], num_segments=4)
    assert batch[0] == host
    assert batch[1] == compress(data2, max_threads=4)
    # the native-symbolizer variant shares the template path too
    assert compress_tpu(data, num_segments=4,
                        symbolizer="native") == host


def test_thread_pool_segment_path():
    """Exercise the multi-worker segment path (taken on multi-CPU hosts):
    results must match the serial path bit-for-bit."""
    from lepton_tpu import api
    data = open(os.path.join("/root/reference/images", "iphonecrop.jpg"),
                "rb").read()
    serial = compress(data)
    old = api._MAX_WORKERS
    try:
        api._MAX_WORKERS = 4
        pooled = compress(data)
        assert pooled == serial
        assert decompress(pooled) == data
    finally:
        api._MAX_WORKERS = old


def test_ans_v3_corpus_roundtrip(ref_images):
    """Native rANS backend roundtrips the full supported corpus."""
    import os as _os
    skip = {"arithmetic.jpg", "badzerorun.jpg", "roundtripfail.jpg"}
    n = 0
    for name in sorted(_os.listdir(ref_images)):
        if not name.endswith(".jpg") or name in skip:
            continue
        data = open(_os.path.join(ref_images, name), "rb").read()
        lep = compress(data, version=3, allow_progressive=True)
        assert decompress(lep) == data, name
        n += 1
    assert n >= 20
