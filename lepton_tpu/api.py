"""Top-level compress/decompress API (the `lepton in out` equivalent).

Pipeline (reference call stacks, SURVEY.md section 3):
  compress:   JPEG bytes -> parse -> Huffman-decode to coefficient planes +
              handoffs -> select thread splits -> per-segment model encode ->
              mux interleave -> .lep container
  decompress: .lep -> container parse -> per-segment model decode ->
              Huffman re-emit with handoff stitching -> original JPEG bytes
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from .codec.driver import ImageData, decode_segment, encode_segment
from .container.format import (ContainerError, LeptonHeader, read_container,
                               write_container)
from .container.handoff import choose_num_threads, select_splits
from .container.mux import MuxReader, mux_streams
from .jpeg.decoder import DecodedScanData, ThreadHandoff, decode_scans
from .jpeg.imageinfo import ImageInfo, image_info_from_header
from .jpeg.parser import ParsedJpeg, parse_jpeg
from .jpeg.recoder import recode_baseline_jpeg
from .model.context import ColorTables


class LeptonError(Exception):
    pass


def _native_image(info: ImageInfo, planes, max_heights, comp_sizes):
    """Native (C) segment codec when available, else None."""
    try:
        from . import _native
        if not _native.available():
            return None
        from .constants import RASTER_TO_ZIGZAG
        qtables_raster = [
            np.asarray(info.qtables[info.cmpnfo[c].qtable_index])[
                RASTER_TO_ZIGZAG]
            for c in range(info.cmpc)]
        return _native.NativeImage(planes, qtables_raster, info.mcuv,
                                   max_heights, comp_sizes)
    except Exception:
        return None


def _color_tables(info: ImageInfo) -> List[ColorTables]:
    return [ColorTables(info.qtables[info.cmpnfo[c].qtable_index])
            for c in range(info.cmpc)]


def _truncation_geometry(info: ImageInfo, hdr_or_dec) -> tuple:
    """trunc_bcv / trunc_bc per component (set_block_count_dpos,
    uncompressed_components.hh:168-179)."""
    max_coded_heights = []
    component_sizes = []
    for c in range(info.cmpc):
        ci = info.cmpnfo[c]
        if hdr_or_dec.early_eof:
            trunc_bc = hdr_or_dec.max_dpos[c] + 1
            vertical = min(-(-trunc_bc // ci.bch), ci.bcv)
            ratio = ci.bcv // info.mcuv
            while vertical % ratio != 0 and vertical + 1 <= ci.bcv:
                vertical += 1
            max_coded_heights.append(vertical)
            component_sizes.append(trunc_bc)
        else:
            max_coded_heights.append(ci.bcv)
            component_sizes.append(ci.bc)
    return max_coded_heights, component_sizes


def compress(jpeg_data: bytes, max_threads: int = 8,
             min_threads: int = 1, even_split: bool = False,
             allow_progressive: bool = False) -> bytes:
    parsed = parse_jpeg(jpeg_data)
    info = image_info_from_header(parsed.hdrdata)
    dec = decode_scans(parsed, info, allow_progressive=allow_progressive)

    row_handoffs = dec.handoffs
    fb_size = row_handoffs[-1].segment_size - row_handoffs[0].segment_size
    num_threads = choose_num_threads(len(row_handoffs), fb_size,
                                     max_threads, min_threads)
    splits = select_splits(row_handoffs, num_threads, even_split)

    max_heights, comp_sizes = _truncation_geometry(info, dec)
    native = _native_image(info, dec.planes, max_heights, comp_sizes)
    if native is None:
        colors = _color_tables(info)
        image = ImageData([np.ascontiguousarray(p) for p in dec.planes],
                          colors, info.mcuv, max_heights, comp_sizes)

    streams = []
    for i, th in enumerate(splits):
        is_last = i == len(splits) - 1
        end_y = (splits[i + 1].luma_y_start if not is_last
                 else info.cmpnfo[0].bcv)
        if native is not None:
            streams.append(native.encode_segment(th.luma_y_start, end_y,
                                                 is_last))
        else:
            streams.append(encode_segment(image, th.luma_y_start, end_y,
                                          is_last))

    hdr = LeptonHeader()
    hdr.version = 1
    hdr.mode = ord("Z") if dec.is_baseline else ord("X")
    hdr.num_threads = num_threads
    hdr.original_size = parsed.jpgfilesize
    hdr.hdrdata = parsed.hdrdata
    hdr.padbit = dec.padbit
    hdr.handoffs = splits
    hdr.rst_cnt = parsed.rst_cnt
    hdr.rst_err = parsed.rst_err
    hdr.garbage = parsed.garbage if parsed.garbage else b"\xff\xd9"
    hdr.early_eof = dec.early_eof
    if dec.early_eof:
        hdr.max_cmp = dec.max_cmp
        hdr.max_bpos = dec.max_bpos
        hdr.max_sah = dec.max_sah
        hdr.max_dpos = dec.max_dpos
    return write_container(hdr, mux_streams(streams, hdr.version))


def decompress(lep_data: bytes) -> bytes:
    hdr, mux_region = read_container(lep_data)
    info = image_info_from_header(hdr.hdrdata)
    max_heights, comp_sizes = _truncation_geometry(info, hdr)
    planes = [np.zeros((info.cmpnfo[c].bcv, info.cmpnfo[c].bch, 64),
                       dtype=np.int16) for c in range(info.cmpc)]
    native = _native_image(info, planes, max_heights, comp_sizes)
    if native is not None:
        planes = native.planes
    else:
        colors = _color_tables(info)
        image = ImageData(planes, colors, info.mcuv, max_heights, comp_sizes)

    handoffs = hdr.handoffs
    if not handoffs:
        # legacy file: no 'H' record -- a mark byte + (mark-1) LE16 luma
        # splits precede the mux data (vp8_decoder.cc:337-363); overhang
        # state is unknown, forcing continuous single-threaded re-emit
        mark = mux_region[0]
        if mark == 0:
            raise LeptonError("legacy file with zero threads")
        splits = [int.from_bytes(mux_region[1 + 2 * i:3 + 2 * i], "little")
                  for i in range(mark - 1)]
        mux_region = mux_region[1 + 2 * (mark - 1):]
        bounds = [0] + splits + [info.cmpnfo[0].bcv]
        handoffs = [
            ThreadHandoff(luma_y_start=bounds[i], luma_y_end=bounds[i + 1],
                          num_overhang_bits=ThreadHandoff.LEGACY_OVERHANG_BITS)
            for i in range(mark)]
    if handoffs:
        handoffs[-1].luma_y_end = info.cmpnfo[0].bcv
    demux = MuxReader(mux_region)
    for i, th in enumerate(handoffs):
        is_last = i == len(handoffs) - 1
        end_y = handoffs[i + 1].luma_y_start if not is_last else \
            info.cmpnfo[0].bcv
        data = bytes(demux.buffers[i])
        if native is not None:
            native.decode_segment(data, th.luma_y_start, end_y, is_last)
        else:
            decode_segment(image, data, th.luma_y_start, end_y, is_last)

    info2 = image_info_from_header(hdr.hdrdata)
    if hdr.mode == ord("X"):
        from .jpeg.recode_progressive import recode_progressive_jpeg
        return recode_progressive_jpeg(
            hdr.hdrdata, planes, info2, hdr.padbit, hdr.rst_cnt,
            hdr.rst_cnt_set, hdr.rst_err, hdr.garbage, hdr.original_size,
            hdr.prefix_garbage or None, hdr.embedded_jpeg)
    return recode_baseline_jpeg(
        hdr.hdrdata, planes, handoffs, info2, hdr.padbit,
        hdr.rst_cnt, hdr.rst_cnt_set, hdr.rst_err, hdr.garbage,
        hdr.original_size, hdr.prefix_garbage or None, hdr.embedded_jpeg)
