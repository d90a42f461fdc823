#!/usr/bin/env python
"""Stage decomposition of the 6-D lit+shadows config (bench_suite 4b):
how much of the frame is trace vs the shadow-occlusion passes vs shade.

Stages (each timed as a queued batch of 4 dispatches + one sync, RTT
amortized — the bench.py round-4 methodology):

  * noop              — sync-pull floor
  * trace             — raw-slot walk over the primary wavefront
  * frame_no_shadows  — full packed frame with shadows OFF (same scene
                        mutated; trace + camera-light-free shade)
  * frame             — full packed frame, shadows ON (2 point lights +
                        1 global light => up to 3 occlusion passes)

    python scripts/lit_split.py [--size 1024]

Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ntracer import (NTracer, Material, ImageFormat, Channel)
    from ntracer_tpu.engine import wavefront
    from ntracer_tpu.engine import resident_kernels as rk

    d, n, seed = 6, 900, 3
    nt = NTracer(d)
    mat = Material((0.9, 0.6, 0.3))
    rng = np.random.RandomState(seed)
    protos = []
    for _ in range(n):
        base = rng.uniform(-2, 2, d)
        pts = [nt.Vector(*(base + rng.uniform(-0.7, 0.7, d)))
               for _ in range(d)]
        protos.append(nt.TrianglePrototype(pts, mat))
    scene = nt.build_composite_scene(protos)
    camera = nt.Camera()
    camera.translate(nt.Vector.axis(2, -8.0))
    scene.set_camera(camera)
    scene.add_light(nt.PointLight(nt.Vector.axis(1, 5), (1, 0.9, 0.7)))
    scene.add_light(nt.PointLight(nt.Vector.axis(0, -5), (0.4, 0.5, 0.9)))
    scene.add_light(nt.GlobalLight(nt.Vector.axis(1, -1), (0.2, 0.2, 0.3)))
    scene.set_shadows(True)

    W = H = args.size
    fmt = ImageFormat(W, H, [Channel(8, 1, 0, 0), Channel(8, 0, 1, 0),
                             Channel(8, 0, 0, 1)])

    cfg, device, _ = wavefront.get_device_scene(scene)
    res = wavefront._res_dict(device)
    scene._set_view_size(W, H)
    fovI, half_w, half_h = wavefront._fov_params(W, H, scene.fov)
    cam_o = jnp.asarray(scene._cam._origin)
    cam_t = jnp.asarray(scene._cam._t)
    pctx = wavefront.primary_ctx(device, cfg, cam_o)
    kw = dict(order=pctx["order"], dmin=pctx["dmin"], sh=pctx["sh_res"])

    def sync(x):
        while isinstance(x, (tuple, list)):
            x = x[0]
        return float(jnp.sum(x.reshape(-1)[:64].astype(jnp.int32)))

    @jax.jit
    def noop():
        return jnp.zeros((64,), jnp.float32)

    @jax.jit
    def trace():
        xs, ys, _ = wavefront._ray_coords(jnp.int32(0), W, count=W * H)
        o, dirs = wavefront.make_rays(cam_o, cam_t, fovI, half_w, half_h,
                                      xs, ys)
        skip = jnp.full((W * H,), -1, jnp.int32)
        t, slot, vis = rk.nearest_hit(res, o, dirs, skip, cfg.d,
                                      raw_slot=True, **kw)
        return t + slot

    def frame():
        return wavefront.frame_device_arrays(scene, fmt)

    def timed_batch(f, nb=4):
        t0 = time.perf_counter()
        last = None
        for _ in range(nb):
            last = f()
        sync(last)
        return (time.perf_counter() - t0) / nb

    # compile the shadows-ON frame first (the scene is in that state)
    sync(frame())
    sync(trace())
    sync(noop())

    best = {}
    for _ in range(args.rounds):
        best["noop"] = min(best.get("noop", 9e9), timed_batch(noop))
        best["trace"] = min(best.get("trace", 9e9), timed_batch(trace))
        best["frame_shadows"] = min(best.get("frame_shadows", 9e9),
                                    timed_batch(frame))

    # shadows OFF — same geometry/device cache (config mutation only)
    scene.set_shadows(False)
    sync(frame())
    for _ in range(args.rounds):
        best["frame_no_shadows"] = min(best.get("frame_no_shadows", 9e9),
                                       timed_batch(frame))
        best["noop2"] = min(best.get("noop2", 9e9), timed_batch(noop))
    scene.set_shadows(True)

    rtt = min(best["noop"], best["noop2"])
    ms = {k: round((v - rtt) * 1000, 2) for k, v in best.items()
          if not k.startswith("noop")}
    ms["rtt_floor"] = round(rtt * 1000, 2)
    st = wavefront.frame_stats(scene, W, H)
    print(json.dumps({
        "experiment": "lit_split", "size": W, "ms": ms,
        "derived_ms": {
            "trace": ms["trace"],
            "shadow_occlusion": round(ms["frame_shadows"]
                                      - ms["frame_no_shadows"], 2),
            "shade+glue": round(ms["frame_no_shadows"] - ms["trace"], 2),
        },
        "counters": {k: int(v) for k, v in st.items()},
    }))


if __name__ == "__main__":
    main()
