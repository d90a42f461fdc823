#!/usr/bin/env python
"""Full-frame bit-parity gate: render the five BASELINE configs with BOTH
implementations (identical geometry + camera) and compare every 8-bit
pixel.  Writes PARITY_FRAMES.json with per-config diff statistics.

    python scripts/frame_parity.py [--ref-path PATH] [--out PARITY_FRAMES.json]

The reference renders in a subprocess (the two packages shadow the same
``ntracer`` module name); ntracer_tpu renders in-process on the default
backend (TPU when available).

Expected outcome: identical except a small set of boundary pixels where
float32 summation-order differences flip a ROUNDING_FUZZ-tight edge test
or land on an exact 8-bit quantization boundary; the JSON records every
differing pixel count and the worst channel delta so the claim is
auditable rather than asserted.
"""

import argparse
import json
import math
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

DEFAULT_REF = "/tmp/refbuild/build/lib.linux-x86_64-cpython-312"


def box_spec(d, w, h):
    cam_origin = np.zeros(d, np.float32)
    cam_origin[2] = -math.sqrt(d) * 1.2
    return dict(kind="box", d=d, width=w, height=h, fov=0.8,
                cam_origin=cam_origin,
                cam_axes=np.eye(d, dtype=np.float32))


def cell120_spec(w, h):
    from ntracer import NTracer, Material
    from polytope import polytope_vertices, hull_prototypes
    nt = NTracer(4)
    protos = hull_prototypes(nt, polytope_vertices([5, 3, 3]),
                             Material((1, 0.5, 0.5)))
    pts = np.asarray([pr._points for pr in protos], np.float32)
    cam_origin = np.array([0, 0, -4.0, 0], np.float32)
    return dict(kind="tris", d=4, width=w, height=h, fov=0.8,
                cam_origin=cam_origin, cam_axes=np.eye(4, dtype=np.float32),
                tri_points=pts, mat_color=np.array([1, 0.5, 0.5], np.float32))


def render_ours(spec):
    from ntracer import (NTracer, Material, ImageFormat, Channel,
                         BlockingRenderer)
    d = int(spec["d"])
    nt = NTracer(d)
    if spec["kind"] == "box":
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
    for i in range(d):
        cam.axes[i] = nt.Vector(*map(float, spec["cam_axes"][i]))
    scene.set_camera(cam)
    w, h = int(spec["width"]), int(spec["height"])
    fmt = ImageFormat(w, h, [Channel(8, 1, 0, 0), Channel(8, 0, 1, 0),
                             Channel(8, 0, 0, 1)])
    buf = bytearray(fmt.pitch * fmt.height)
    assert BlockingRenderer().render(buf, fmt, scene)
    return np.frombuffer(bytes(buf), np.uint8).reshape(h, w, 3)


def render_ref(spec, ref_path):
    with tempfile.TemporaryDirectory() as td:
        spec_path = os.path.join(td, "spec.npz")
        out_path = os.path.join(td, "out.raw")
        np.savez(spec_path, **spec)
        env = dict(os.environ, PYTHONPATH=ref_path)
        env.pop("JAX_PLATFORMS", None)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/_ref_render.py"),
             spec_path, out_path],
            env=env, capture_output=True)
        w, h = int(spec["width"]), int(spec["height"])
        data = (np.fromfile(out_path, np.uint8)
                if os.path.exists(out_path) else np.zeros(0, np.uint8))
        if data.size != w * h * 3:
            # a short/absent file is a real failure; a bad exit code alone
            # is not (the C++ extension can segfault at interpreter
            # teardown on large scenes, after the frame is fully written)
            raise RuntimeError(
                f"reference render failed: rc={proc.returncode} "
                f"{proc.stderr.decode()[-500:]}")
        return data.reshape(h, w, 3)


def compare(name, ours, ref):
    diff = ours.astype(np.int16) - ref.astype(np.int16)
    bad = np.any(diff != 0, axis=2)
    n_bad = int(bad.sum())
    ys, xs = np.nonzero(bad)
    out = {
        "config": name,
        "pixels": int(bad.size),
        "diff_pixels": n_bad,
        "diff_ppm": round(n_bad / bad.size * 1e6, 2),
        "max_channel_delta": int(np.abs(diff).max()),
        "bit_identical": n_bad == 0,
        "sample_coords": [[int(x), int(y)] for x, y in
                          list(zip(xs, ys))[:20]],
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-path", default=DEFAULT_REF)
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY_FRAMES.json"))
    ap.add_argument("--configs", default="1,2,3,4,5")
    args = ap.parse_args()

    specs = {
        "1": ("3D cube 320x240", box_spec(3, 320, 240)),
        "2": ("4D tesseract 640x480", box_spec(4, 640, 480)),
        "3": ("120-cell 4D 1024x1024", None),  # built lazily (slow)
        "4": ("6D hypercube 1024x1024", box_spec(6, 1024, 1024)),
        "5": ("10D hypercube 1920x1080", box_spec(10, 1920, 1080)),
    }
    results = []
    for key in args.configs.split(","):
        name, spec = specs[key]
        if spec is None:
            spec = cell120_spec(1024, 1024)
        ours = render_ours(spec)
        ref = render_ref(spec, args.ref_path)
        results.append(compare(name, ours, ref))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
