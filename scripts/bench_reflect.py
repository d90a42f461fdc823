#!/usr/bin/env python
"""Reflective+shadowed scene benchmark + bounce-occupancy counters.

Reproduces round-3's ad-hoc data point (BASELINE.md "Reflective + shadowed
scene": 1000 random d=3 simplices, reflectivity 0.4, point light + shadows,
1024^2) as a repeatable script, and adds the VERDICT-r3 #5 instrumentation:
per-depth live rays vs live RAY_BLOCKs, so the secondary-ray occupancy
question is answered with data (a block with one live ray pays the full
walk; rays/block << RAY_BLOCK would argue for compacting continuations).

    python scripts/bench_reflect.py [--size 1024] [--rounds 4]

Prints one JSON line.  Counters are window-independent; the ms/frame is
min-of-rounds on whatever backend is active.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def build_scene():
    from ntracer import NTracer, Material

    nt = NTracer(3)
    rng = np.random.RandomState(11)
    mat = Material((0.8, 0.8, 0.9), reflectivity=0.4)
    protos = []
    for _ in range(1000):
        base = rng.uniform(-3, 3, 3)
        pts = [nt.Vector(*(base + rng.uniform(-0.6, 0.6, 3)))
               for _ in range(3)]
        protos.append(nt.TrianglePrototype(pts, mat))
    scene = nt.build_composite_scene(protos)
    cam = nt.Camera()
    cam.translate(nt.Vector(0, 0, -9))
    scene.set_camera(cam)
    scene.add_light(nt.PointLight(nt.Vector(0, 5, -2), (1, 0.9, 0.8)))
    scene.set_shadows(True)
    return scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    import jax
    from ntracer_tpu.engine import wavefront
    from ntracer_tpu.engine.resident_kernels import RAY_BLOCK

    scene = build_scene()
    W = H = args.size

    # ---- counters (exact, window-independent) ----
    st = wavefront.frame_stats(scene, W, H)
    occ = {}
    total_rays = W * H
    bounce_rays = 0
    for d in range(1, 16):
        rk, bk = f"bounce_live_rays_d{d}", f"bounce_live_blocks_d{d}"
        if rk not in st:
            break
        bounce_rays += st[rk]
        occ[f"d{d}_rays"] = st[rk]
        occ[f"d{d}_blocks"] = st[bk]
        occ[f"d{d}_occupancy"] = round(st[rk] / max(st[bk] * RAY_BLOCK, 1), 4)
        # blocks a perfect cross-block compaction would dispatch instead
        occ[f"d{d}_blocks_compacted"] = -(-st[rk] // RAY_BLOCK)

    # ---- on-device frame time, min of interleaved rounds ----
    from ntracer import ImageFormat, Channel
    fmt = ImageFormat(W, H, [Channel(8, 1, 0, 0), Channel(8, 0, 1, 0),
                             Channel(8, 0, 0, 1)])
    import jax.numpy as jnp

    def sync(dev):
        # block_until_ready does not reliably synchronize through the
        # tunneled backend (bench.py); pull a tiny reduction instead
        return float(jnp.sum(dev.reshape(-1)[:64].astype(jnp.int32)))

    sync(wavefront.frame_device_arrays(scene, fmt))   # compile + warm
    best = float("inf")
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        sync(wavefront.frame_device_arrays(scene, fmt))
        best = min(best, time.perf_counter() - t0)

    traced = st.get("rays_traced", 0)
    shadow = st.get("shadow_rays", 0)
    out = {
        "scene": "reflective+shadowed d=3 n=1000",
        "size": args.size,
        "on_device_ms": round(best * 1000, 2),
        "rays_primary": total_rays,
        "rays_traced": traced,
        "shadow_rays": shadow,
        "mrays_s_all_types": round((traced + shadow) / best / 1e6, 2),
        "chunks_visited": st.get("chunks_visited", 0),
        "occl_chunks_visited": st.get("occl_chunks_visited", 0),
        **occ,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
