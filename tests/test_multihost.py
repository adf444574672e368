"""Multi-host scaffolding: two real processes under jax.distributed
cooperatively encode one JPEG, gathering per-segment streams to every
process (the DCN MuxWriter gather), byte-identical to single-process.

This is the reference's "multi-node without a cluster" strategy
(SURVEY.md section 4 item 6) adapted to jax.distributed: real process
boundaries, real coordination service, one machine.
"""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
IMAGES = "/root/reference/images"

WORKER = r"""
import sys
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
from lepton_tpu.parallel.multihost import (distributed_compress,
                                           init_distributed)
init_distributed(%(coord)r, 2, int(sys.argv[1]))
data = open(%(src)r, "rb").read()
lep = distributed_compress(data, num_segments=4)
if jax.process_index() == 0:
    open(%(out)r, "wb").write(lep)
jax.distributed.shutdown()
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cooperative_encode(tmp_path):
    src = os.path.join(IMAGES, "androidcrop.jpg")
    out = str(tmp_path / "dist.lep")
    coord = f"127.0.0.1:{_free_port()}"
    script = WORKER % dict(repo=REPO, coord=coord, src=src, out=out)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               LEPTON_TPU_JAX_CACHE="1",
               LEPTON_TPU_JAX_CACHE_DIR="/tmp/lepton_tpu_jaxcache_tests")
    procs = [subprocess.Popen([sys.executable, "-c", script, str(pid)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE)
             for pid in (0, 1)]
    outs = [p.communicate(timeout=1500) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]
    lep = open(out, "rb").read()

    # byte-identical to the single-process encoder with the same splits
    sys.path.insert(0, REPO)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from lepton_tpu.api import decompress
    from lepton_tpu.parallel.multihost import distributed_compress
    data = open(src, "rb").read()
    # the host C engine with the same splits must produce the same
    # bytes: the device share ran device symbolize + phase-B, so this
    # gate spans both implementations
    single = distributed_compress(data, num_segments=4, engine="host")
    assert lep == single
    assert decompress(lep) == data
