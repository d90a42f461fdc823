"""TPU render engine: scene flattening, JAX wavefront kernels, packing."""

import os

import jax

# The first compile of the frame kernel is expensive (and on tunneled TPU
# setups goes through a remote compile service with high variance); persist
# compiled executables across processes unless the user configured a cache.
if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/ntracer_tpu_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:  # pragma: no cover - older jax
        pass
