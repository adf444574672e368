"""Multi-device / multi-host parallelism for the codec.

The codec's parallel structure (SURVEY.md section 2.5): images are
embarrassingly parallel, and within an image up to 255 thread-segments are
independent arithmetic streams.  On a pod slice this maps to a 2D
('data', 'seg') mesh: probability priors and quantization tables derive
from the header (pure broadcast), phase-A context kernels and per-segment
coder lanes run on the owning device, and the per-segment compressed
streams gather to the host in file order (the MuxWriter role).  No
NCCL-style collectives are required on the critical path -- the only
cross-device data is the final size-prefixed stream gather.
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence

import numpy as np


def batch_compress(jpeg_blobs: Sequence[bytes], max_workers: int = 0,
                   **kw) -> List[bytes]:
    """Host-parallel compression of many images (fork/threads over the
    GIL-dropping native codec)."""
    from ..api import compress
    import os
    if max_workers <= 0:
        max_workers = min(16, os.cpu_count() or 1)
    if max_workers == 1 or len(jpeg_blobs) <= 1:
        return [compress(b, **kw) for b in jpeg_blobs]
    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        return list(ex.map(lambda b: compress(b, **kw), jpeg_blobs))


def batch_decompress(lep_blobs: Sequence[bytes],
                     max_workers: int = 0) -> List[bytes]:
    from ..api import decompress
    import os
    if max_workers <= 0:
        max_workers = min(16, os.cpu_count() or 1)
    if max_workers == 1 or len(lep_blobs) <= 1:
        return [decompress(b) for b in lep_blobs]
    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        return list(ex.map(decompress, lep_blobs))


def make_mesh(n_devices: Optional[int] = None, data_axis: int = 0):
    """A ('data', 'seg') mesh over the available devices."""
    import jax
    from jax.sharding import Mesh
    devices = jax.devices()
    if n_devices:
        devices = devices[:n_devices]
    n = len(devices)
    d = int(np.sqrt(n))
    while n % d:
        d -= 1
    return Mesh(np.array(devices).reshape(d, n // d), ("data", "seg"))


def sharded_phase_a(coef_batch, quant, icos_x, icos_y, mesh):
    """Phase-A context kernels over [data, seg, H, W, 64] shards.

    Each (data, seg) shard is an independent segment: no halo exchange is
    needed because segment boundaries reset neighbor context by design
    (is_top_row semantics, lepton_codec.hh:173-181).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..kernels.contexts import phase_a

    sharding = NamedSharding(mesh, P("data", "seg"))
    coef_batch = jax.device_put(coef_batch, sharding)

    @jax.jit
    def run(c):
        return jax.vmap(jax.vmap(
            lambda x: phase_a(x, quant, icos_x, icos_y)))(c)

    with mesh:
        return run(coef_batch)


def gather_streams_in_file_order(per_segment_streams):
    """The MuxWriter role: concatenate per-segment compressed streams in
    file order (host-side; cross-host this is a DCN gather of byte blobs).
    """
    from ..container.mux import mux_streams
    return mux_streams(list(per_segment_streams))
