"""TPU kernels (JAX/Pallas).  Importing this package enables the
persistent JAX compilation cache -- the host-only codec path never pays
the `import jax` cost (deferred from package import per ADVICE r2)."""

from .. import _configure_jax_cache

_configure_jax_cache()
