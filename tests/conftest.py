"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The TPU image's sitecustomize registers the axon (TPU) PJRT plugin and
exports JAX_PLATFORMS=axon before any user code runs, so env vars set here
are too late — the jax.config overrides below are not.  Sharding tests run
on 8 virtual CPU devices; the real chip is exercised by bench.py and the
driver's compile checks.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# persistent compile cache: the 1-core host recompiles are the slow part
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
