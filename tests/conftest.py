import os
import sys

# TPU sharding tests run on a virtual 8-device CPU mesh; set before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# the persistent compile cache targets the TPU tunnel; under the forced-CPU
# suite its CPU-AOT reloads warn about host-feature mismatches -- skip it
os.environ.setdefault("LEPTON_TPU_JAX_CACHE", "0")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:
    # the axon TPU plugin ignores JAX_PLATFORMS; force CPU via config
    import jax
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"
REFERENCE_IMAGES = os.path.join(REFERENCE_DIR, "images")
REFERENCE_BINARY = "/tmp/refbuild/lepton"


@pytest.fixture(scope="session")
def ref_images():
    if not os.path.isdir(REFERENCE_IMAGES):
        pytest.skip("reference images not available")
    return REFERENCE_IMAGES


def _try_build_reference() -> bool:
    """Build the reference oracle on a fresh machine so the interop gates
    run instead of silently skipping."""
    import shutil
    import subprocess
    if not (os.path.isdir(REFERENCE_DIR) and shutil.which("cmake")
            and shutil.which("ninja")):
        return False
    try:
        os.makedirs("/tmp/refbuild", exist_ok=True)
        subprocess.run(["cmake", REFERENCE_DIR, "-DCMAKE_BUILD_TYPE=Release",
                        "-G", "Ninja"], cwd="/tmp/refbuild",
                       capture_output=True, timeout=600, check=True)
        subprocess.run(["ninja", "lepton"], cwd="/tmp/refbuild",
                       capture_output=True, timeout=1200, check=True)
        return os.path.exists(REFERENCE_BINARY)
    except Exception:
        return False


@pytest.fixture(scope="session")
def ref_binary():
    if not os.path.exists(REFERENCE_BINARY) and not _try_build_reference():
        pytest.skip("reference lepton binary not built")
    return REFERENCE_BINARY


@pytest.fixture(scope="session")
def synth_model(tmp_path_factory):
    """A synthetic trained-model file exercising the FULL branch-state
    domain: random counts 0..255 (load-normalization can yield 0), prob
    bytes restricted to 1..254 (0/255 first-use probs are degenerate for
    both coder backends -- freq 0 breaks the rANS interval in the host C
    coder too, so real trained models avoid them the same way)."""
    import numpy as np
    from lepton_tpu.model.tables import ARENA_SIZE
    rng = np.random.default_rng(42)
    raw = rng.integers(0, 256, (ARENA_SIZE, 3), dtype=np.uint8)
    raw[:, 2] = 1 + raw[:, 2] % 254
    path = tmp_path_factory.mktemp("model") / "synth_model.bin"
    path.write_bytes(raw.tobytes())
    return str(path)
