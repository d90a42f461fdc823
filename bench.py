#!/usr/bin/env python
"""Flagship benchmark: 4-D 120-cell ({5,3,3}) at 1024x1024, rotating camera.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The baseline is the patched C++ reference measured on this machine's host
CPU (single core): 0.959 s/frame at 1024x1024 => 1.09 Mrays/s
(scripts/polytope.py 5 3 3 --benchmark -s 1024x1024; see BASELINE.md).
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# default platform (TPU when available); persistent compile cache
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

REF_SEC_PER_FRAME = 0.959  # C++ reference, this host's CPU, 1024x1024
W = H = 1024
FRAMES = 8


def main():
    from ntracer import NTracer, Material, ImageFormat, Channel, BlockingRenderer
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "scripts"))
    from polytope import polytope_vertices, hull_prototypes

    nt = NTracer(4)
    material = Material((1, 0.5, 0.5))
    verts = polytope_vertices([5, 3, 3])
    protos = hull_prototypes(nt, verts, material)
    scene = nt.build_composite_scene(protos)

    cam_distance = -4.0
    camera = nt.Camera()
    camera.translate(nt.Vector.axis(2, cam_distance))
    scene.set_camera(camera)
    scene.set_fov(0.8)

    fmt = ImageFormat(W, H, [Channel(8, 1, 0, 0), Channel(8, 0, 1, 0),
                             Channel(8, 0, 0, 1)])
    buf = bytearray(fmt.pitch * fmt.height)
    renderer = BlockingRenderer()

    incr = 2 * math.pi / FRAMES
    hcoef = 1 / math.sqrt(3)

    def advance():
        a2 = camera.axes[0] * hcoef + camera.axes[1] * hcoef \
            + camera.axes[3] * hcoef
        camera.transform(nt.Matrix.rotation(camera.axes[2], a2, incr))
        camera.normalize()
        camera.origin = camera.axes[2] * cam_distance
        scene.set_camera(camera)

    # warmup (compile)
    renderer.render(buf, fmt, scene)
    advance()

    total = 0.0
    for _ in range(FRAMES):
        t0 = time.perf_counter()
        renderer.render(buf, fmt, scene)
        total += time.perf_counter() - t0
        advance()

    sec_per_frame = total / FRAMES

    # --- on-device time (no host link): queue FRAMES dispatches, then pull
    # a 4-byte reduction of the last output (the device executes in order,
    # so the pull waits for the whole queue).  block_until_ready does not
    # reliably synchronize through the tunneled backend.
    import jax
    import jax.numpy as jnp
    from ntracer_tpu.engine import wavefront

    def sync(dev):
        return float(jnp.sum(dev[:64].astype(jnp.int32)))

    sync(wavefront.frame_device_arrays(scene, fmt))  # compile + warm
    advance()
    t0 = time.perf_counter()
    last = None
    for _ in range(FRAMES):
        last = wavefront.frame_device_arrays(scene, fmt)
        advance()
    sync(last)
    dev_sec = (time.perf_counter() - t0) / FRAMES

    # per-stage counters, one frame (instrumentation.hpp analogue)
    counters = wavefront.frame_stats(scene, W, H)

    print(json.dumps({
        "metric": "120-cell 4D @1024^2 primary rays",
        "value": round((W * H) / sec_per_frame / 1e6, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(REF_SEC_PER_FRAME / sec_per_frame, 3),
        "e2e_ms_per_frame": round(sec_per_frame * 1000, 2),
        "on_device_ms_per_frame": round(dev_sec * 1000, 2),
        "on_device_mrays": round((W * H) / dev_sec / 1e6, 3),
        "counters": counters,
    }))


if __name__ == "__main__":
    main()
