"""lepton_tpu: TPU-native lossless JPEG recompression (lepton-compatible)."""

import os

__version__ = "0.1.0"


def _configure_jax_cache() -> None:
    """Enable JAX's persistent compilation cache for the codec kernels.

    Per-geometry compiles through the TPU tunnel cost minutes; the cache
    makes them one-time per machine (measured 274s -> 57s across
    processes for the phase-B coder).  Opt out with
    LEPTON_TPU_JAX_CACHE=0; the directory is overridable with
    LEPTON_TPU_JAX_CACHE_DIR.
    """
    global _JAX_CACHE_DONE
    if _JAX_CACHE_DONE or os.environ.get("LEPTON_TPU_JAX_CACHE", "1") == "0":
        return
    _JAX_CACHE_DONE = True
    try:
        import jax
        path = os.environ.get(
            "LEPTON_TPU_JAX_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "lepton_tpu_jax"))
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # jax absent or too old: the host codec needs none of this


_JAX_CACHE_DONE = False

# Deliberately NOT called at import: eager `import jax` costs seconds on a
# small host and mutates global jax.config for embedders.  The TPU entry
# points (api.compress_tpu / decompress_tpu / kernels) call it lazily.
