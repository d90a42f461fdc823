"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set the flags before jax initializes, per the multi-chip testing
strategy (sharding correctness is validated on virtual CPU devices; the
real TPU is exercised by bench.py and the driver's compile checks).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
