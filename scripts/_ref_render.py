#!/usr/bin/env python
"""Render one frame with the ORIGINAL C++ ntracer from a scene spec.

Run with PYTHONPATH pointing at the reference build (no repo paths), e.g.
    PYTHONPATH=/tmp/refbuild/build/lib.linux-x86_64-cpython-312 \
        python scripts/_ref_render.py spec.npz out.raw

The spec (.npz) carries: kind ("box"|"tris"), d, width, height, fov,
cam_origin (d,), cam_axes (d, d) row-per-axis, and for "tris":
tri_points (N, d, d) + mat_color (3,).  Output: raw RGB24 bytes.
"""

import sys

import numpy as np


def main():
    spec = np.load(sys.argv[1])
    out_path = sys.argv[2]

    from ntracer import (NTracer, Material, ImageFormat, Channel,
                         BlockingRenderer)

    d = int(spec["d"])
    nt = NTracer(d)
    kind = str(spec["kind"])
    if kind == "box":
        scene = nt.BoxScene()
        cam = scene.get_camera()
    else:
        mat = Material(tuple(float(c) for c in spec["mat_color"]))
        protos = [nt.TrianglePrototype([nt.Vector(*map(float, p))
                                        for p in tri], mat)
                  for tri in spec["tri_points"]]
        scene = nt.build_composite_scene(protos)
        scene.set_fov(float(spec["fov"]))
        cam = nt.Camera()

    cam.origin = nt.Vector(*map(float, spec["cam_origin"]))
    axes = spec["cam_axes"]
    for i in range(d):
        cam.axes[i] = nt.Vector(*map(float, axes[i]))
    scene.set_camera(cam)

    w, h = int(spec["width"]), int(spec["height"])
    fmt = ImageFormat(w, h, [Channel(8, 1, 0, 0), Channel(8, 0, 1, 0),
                             Channel(8, 0, 0, 1)])
    buf = bytearray(fmt.pitch * fmt.height)
    BlockingRenderer().render(buf, fmt, scene)
    with open(out_path, "wb") as f:
        f.write(bytes(buf))
    print("ok", len(buf))


if __name__ == "__main__":
    main()
