"""Multi-host encode: per-host segment sharding + host-0 stream gather.

The codec's cross-host communication pattern (SURVEY.md section 5): the
probability priors and qtables derive from the JPEG header (pure
broadcast -- every host parses the same bytes), thread-segments are
independent arithmetic streams, and the only data movement on the
critical path is gathering the per-segment compressed byte streams to
host 0 in file order (the MuxWriter role, reference vp8_encoder.cc:
576-594) over DCN.  No collective rides the hot loop.

Processes coordinate through jax.distributed (the same runtime that
backs pod-slice jobs); the byte-stream gather uses a max-padded uint8
all-gather.  Works on any backend -- the test harness runs two CPU
processes on one machine, a pod slice runs one process per host.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np


def init_distributed(coordinator: str, num_processes: int,
                     process_id: int) -> None:
    """jax.distributed.initialize wrapper (idempotent)."""
    import jax
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        if "already" not in str(e):
            raise


_BARRIER_SEQ = [0]


def _pre_collective_barrier(timeout_ms: int = 600_000) -> None:
    """Align processes via the COORDINATION SERVICE before the first
    Gloo collective.

    Gloo's context init rendezvous has a fixed ~30s key-exchange window;
    each process reaches its first collective only after compiling the
    whole device pipeline, and on a loaded host that compile skew can
    exceed the window (observed: DEADLINE_EXCEEDED on GetKeyValue).  The
    coordination-service barrier takes an explicit long timeout and no
    Gloo context, so processes enter the collective near-simultaneously."""
    try:
        from jax._src import distributed as _dist
        client = _dist.global_state.client
        if client is not None:
            _BARRIER_SEQ[0] += 1
            client.wait_at_barrier(
                f"lepton_gather_{_BARRIER_SEQ[0]}", timeout_ms)
    except Exception:
        pass                      # best-effort: older/newer jax internals


def gather_streams_to_host0(streams: List[bytes]) -> Optional[List[bytes]]:
    """All-gather per-segment byte streams across processes, file order.

    Every process contributes its (contiguous) share of segment streams;
    returns the full ordered list on every process (host 0 writes the
    container; returning everywhere keeps the API collective-shaped).
    """
    import jax
    from jax.experimental import multihost_utils

    nproc = jax.process_count()
    if nproc == 1:
        return streams
    _pre_collective_barrier()
    # pad locally to a common (count, length) then all-gather as uint8
    local_n = len(streams)
    local_max = max((len(s) for s in streams), default=0)
    dims = multihost_utils.process_allgather(
        np.asarray([local_n, local_max], np.int32))       # [P, 2]
    n_max = int(dims[:, 0].max())
    l_max = max(1, int(dims[:, 1].max()))
    buf = np.zeros((n_max, l_max), np.uint8)
    lens = np.zeros(n_max, np.int32)
    for i, s in enumerate(streams):
        buf[i, :len(s)] = np.frombuffer(s, np.uint8)
        lens[i] = len(s)
    all_buf = multihost_utils.process_allgather(buf)      # [P, n_max, l_max]
    all_len = multihost_utils.process_allgather(lens)     # [P, n_max]
    out = []
    for p in range(nproc):
        for i in range(int(dims[p, 0])):
            out.append(all_buf[p, i, :int(all_len[p, i])].tobytes())
    return out


def distributed_compress(jpeg_data: bytes, num_segments: int = 8,
                         engine: str = "device") -> bytes:
    """Cooperative encode: each process encodes its contiguous share of
    thread-segments, streams gather to every process, and the container
    is assembled identically everywhere (host 0 typically writes it).

    engine="device" (default) runs each process's share through the
    accelerator kernels (device symbolization + lane-parallel phase-B,
    kernels/encode_pipeline) -- each host feeds its own chip(s) and only
    the finished byte streams cross DCN.  engine="host" keeps the C
    segment codec (the mechanics gate).  Byte-identical to the
    single-process encoder with the same splits either way.
    """
    import jax

    from ..api import (LeptonHeader, _native_image, _truncation_geometry,
                       image_info_from_header, parse_jpeg, select_splits,
                       write_container)
    from ..container.mux import mux_streams
    from ..jpeg.decoder import decode_scans

    parsed = parse_jpeg(jpeg_data)
    info = image_info_from_header(parsed.hdrdata)
    dec = decode_scans(parsed, info)
    splits = select_splits(dec.handoffs, num_segments, even_split=True)
    S = len(splits)
    bounds = [th.luma_y_start for th in splits] + [info.cmpnfo[0].bcv]

    pid = jax.process_index()
    nproc = jax.process_count()
    lo = S * pid // nproc
    hi = S * (pid + 1) // nproc

    mh, cs = _truncation_geometry(info, dec)
    if engine == "device":
        # device symbolization covers the whole plane (cheap, data-
        # parallel); assembly + phase-B run only this process's lanes
        from ..model.context import ColorTables
        from ..kernels.encode_pipeline import symbolize_image_device
        colors = [ColorTables(info.qtables[info.cmpnfo[c].qtable_index])
                  for c in range(info.cmpc)]
        local = symbolize_image_device(
            list(dec.planes), colors, info.mcuv, mh, cs,
            [th.luma_y_start for th in splits],
            color_index=(lambda c: 0 if c == 0 else 1),
            segment_range=(lo, hi))
    else:
        native = _native_image(info, dec.planes, mh, cs)
        local = []
        for i in range(lo, hi):
            if native is not None:
                local.append(native.encode_segment(
                    bounds[i], bounds[i + 1], i == S - 1))
            else:
                from ..codec.driver import ImageData, encode_segment
                from ..model.context import ColorTables
                colors = [ColorTables(
                    info.qtables[info.cmpnfo[c].qtable_index])
                    for c in range(info.cmpc)]
                img = ImageData(list(dec.planes), colors, info.mcuv,
                                mh, cs)
                local.append(encode_segment(
                    img, bounds[i], bounds[i + 1], i == S - 1))

    streams = gather_streams_to_host0(local)

    hdr = LeptonHeader()
    hdr.version = 1
    hdr.mode = ord("Z")
    hdr.num_threads = S
    hdr.original_size = parsed.jpgfilesize
    hdr.hdrdata = parsed.hdrdata
    hdr.padbit = dec.padbit
    hdr.handoffs = splits
    hdr.rst_cnt = parsed.rst_cnt
    hdr.rst_err = parsed.rst_err
    hdr.garbage = parsed.garbage if parsed.garbage else b"\xff\xd9"
    hdr.early_eof = dec.early_eof
    if dec.early_eof:
        hdr.max_cmp, hdr.max_bpos = dec.max_cmp, dec.max_bpos
        hdr.max_sah, hdr.max_dpos = dec.max_sah, dec.max_dpos
    return write_container(hdr, mux_streams(streams, hdr.version))
