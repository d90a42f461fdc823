#!/usr/bin/env python
"""Large-mesh benchmark: a tessellated sphere of N triangles (the OBJ-scale
workload), rotating camera.  Prints one JSON line with e2e / on-device /
pipelined frame times.

    python scripts/bench_mesh.py [--tris 100000] [--size 1024x1024]
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def sphere_mesh(n_target):
    """Lat/long tessellated unit sphere with ~n_target triangles."""
    rows = max(4, int(math.sqrt(n_target / 4)))
    cols = 2 * rows
    th = np.linspace(0, math.pi, rows + 1)
    ph = np.linspace(0, 2 * math.pi, cols + 1)
    v = np.empty((rows + 1, cols + 1, 3), np.float32)
    v[..., 0] = np.sin(th)[:, None] * np.cos(ph)[None, :]
    v[..., 1] = np.sin(th)[:, None] * np.sin(ph)[None, :]
    v[..., 2] = np.cos(th)[:, None]
    tris = []
    for i in range(rows):
        for j in range(cols):
            a, b, c, d = v[i, j], v[i + 1, j], v[i + 1, j + 1], v[i, j + 1]
            if i:
                tris.append((a, b, c))
            if i != rows - 1:
                tris.append((a, c, d))
    tris = np.asarray(tris, np.float32)
    area = np.linalg.norm(np.cross(tris[:, 1] - tris[:, 0],
                                   tris[:, 2] - tris[:, 0]), axis=1)
    return tris[area > 1e-10]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=100000)
    ap.add_argument("--size", default="1024x1024")
    ap.add_argument("--frames", type=int, default=4)
    args = ap.parse_args()
    w, _, h = args.size.partition("x")
    w, h = int(w), int(h)

    from ntracer import (NTracer, Material, ImageFormat, Channel,
                         BlockingRenderer)
    from ntracer_tpu.engine import wavefront

    nt = NTracer(3)
    mat = Material((1, 0.6, 0.4))
    tris = sphere_mesh(args.tris)
    t0 = time.perf_counter()
    from ntracer_tpu.primitives import TrianglePrototype
    protos = TrianglePrototype.batch_from_points(tris, mat)
    t_proto = time.perf_counter() - t0
    t0 = time.perf_counter()
    scene = nt.build_composite_scene(protos)
    t_build = time.perf_counter() - t0
    cam = nt.Camera()
    cam.translate(nt.Vector(0, 0, -3))
    scene.set_camera(cam)

    cfg, device, _ = wavefront.get_device_scene(scene)
    kern = sorted(k.split("_")[0] for k in device
                  if k.startswith(("res_gt", "kern_gt")))

    fmt = ImageFormat(w, h, [Channel(8, 1, 0, 0), Channel(8, 0, 1, 0),
                             Channel(8, 0, 0, 1)])
    buf = bytearray(fmt.pitch * fmt.height)
    r = BlockingRenderer()
    r.render(buf, fmt, scene)  # compile

    incr = 2 * math.pi / max(args.frames, 1)

    def advance():
        cam.transform(nt.Matrix.rotation(nt.Vector.axis(0),
                                         nt.Vector.axis(2), incr))
        cam.normalize()
        scene.set_camera(cam)

    total = 0.0
    for _ in range(args.frames):
        t0 = time.perf_counter()
        r.render(buf, fmt, scene)
        total += time.perf_counter() - t0
        advance()
    sec = total / args.frames

    import jax.numpy as jnp

    def sync(dev):
        return float(jnp.sum(dev[:64].astype(jnp.int32)))

    sync(wavefront.frame_device_arrays(scene, fmt))
    t0 = time.perf_counter()
    last = None
    for _ in range(args.frames):
        last = wavefront.frame_device_arrays(scene, fmt)
        advance()
    sync(last)
    dev_sec = (time.perf_counter() - t0) / args.frames

    print(json.dumps({
        "config": f"sphere mesh {len(tris)} tris {w}x{h}",
        "kernels": kern,
        "proto_s": round(t_proto, 2),
        "kd_build_s": round(t_build, 2),
        "ms_per_frame": round(sec * 1000, 2),
        "on_device_ms": round(dev_sec * 1000, 2),
        "on_device_mrays": round(w * h / dev_sec / 1e6, 3),
    }))


if __name__ == "__main__":
    main()
