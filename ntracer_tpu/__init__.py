"""ntracer_tpu: a TPU-native hyper-spatial (n-dimensional) ray tracer.

A from-scratch rebuild of the capabilities of NTracer (an SSE/AVX CPython
extension) as a JAX/XLA framework: scenes flatten to SoA device arrays,
whole tiles of rays advance in lockstep through vectorized
intersection/shading kernels on the TPU's VPU/MXU, and multi-chip rendering
shards pixel tiles over a ``jax.sharding.Mesh``.

The public API mirrors the reference package: ``Color``, ``Material``,
``Channel``, ``ImageFormat``, ``CallbackRenderer``, ``BlockingRenderer``,
``NTracer``, ``CUBE``, ``SPHERE`` (reference lib/ntracer/__init__.py:8-9).
"""

import os as _os

if _os.environ.get("NTRACER_PLATFORM"):
    # Force a jax backend at import time.  JAX_PLATFORMS alone is not
    # reliable on images whose sitecustomize config-updates the platform
    # programmatically (this repo's test image does); subprocess tests
    # pass NTRACER_PLATFORM=cpu to stay hermetic when the TPU tunnel is
    # slow or down.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["NTRACER_PLATFORM"])

from .render import (Color, Material, Channel, ImageFormat, CallbackRenderer,
                     BlockingRenderer)
from .wrapper import NTracer, CUBE, SPHERE
from . import render
from . import wrapper

__all__ = ["Color", "Material", "Channel", "ImageFormat", "CallbackRenderer",
           "BlockingRenderer", "NTracer", "CUBE", "SPHERE", "render",
           "wrapper"]

from ._version import __version__  # noqa: E402  (derived, not hardcoded)
