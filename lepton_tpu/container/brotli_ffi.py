"""Minimal ctypes binding to the system brotli libraries.

Used for format v2+ compressed header blocks (the reference links a vendored
brotli; we bind the system's libbrotli{enc,dec} one-shot APIs).
"""
from __future__ import annotations

import ctypes
import ctypes.util

_enc = None
_dec = None


def _load():
    global _enc, _dec
    if _dec is None:
        dec_name = ctypes.util.find_library("brotlidec") or "libbrotlidec.so.1"
        enc_name = ctypes.util.find_library("brotlienc") or "libbrotlienc.so.1"
        _dec = ctypes.CDLL(dec_name)
        _enc = ctypes.CDLL(enc_name)
        _dec.BrotliDecoderDecompress.restype = ctypes.c_int
        _enc.BrotliEncoderCompress.restype = ctypes.c_int
        _enc.BrotliEncoderMaxCompressedSize.restype = ctypes.c_size_t
    return _enc, _dec


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def decompress(data: bytes, max_size: int = 1 << 28) -> bytes:
    _, dec = _load()
    size = min(max(len(data) * 8, 1 << 20), max_size)
    while True:
        out = ctypes.create_string_buffer(size)
        out_len = ctypes.c_size_t(size)
        # 1 == BROTLI_DECODER_RESULT_SUCCESS
        rc = dec.BrotliDecoderDecompress(
            ctypes.c_size_t(len(data)), data, ctypes.byref(out_len), out)
        if rc == 1:
            return out.raw[:out_len.value]
        if size >= max_size:
            raise ValueError("brotli decompress failed")
        size *= 4


def compress(data: bytes, quality: int = 10, lgwin: int = None) -> bytes:
    # reference defaults: quality 10, lgwin = bit_length(size)+1 clamped
    # (BrotliCompression.cc:48-68, BrotliCompression.hh:47)
    if lgwin is None:
        lgwin = max(10, min(24, len(data).bit_length() + 1))
    enc, _ = _load()
    max_size = enc.BrotliEncoderMaxCompressedSize(ctypes.c_size_t(len(data)))
    out = ctypes.create_string_buffer(max_size or len(data) + 1024)
    out_len = ctypes.c_size_t(len(out))
    rc = enc.BrotliEncoderCompress(
        ctypes.c_int(quality), ctypes.c_int(lgwin), ctypes.c_int(0),
        ctypes.c_size_t(len(data)), data, ctypes.byref(out_len), out)
    if rc != 1:
        raise ValueError("brotli compress failed")
    return out.raw[:out_len.value]
