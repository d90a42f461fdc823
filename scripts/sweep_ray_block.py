#!/usr/bin/env python
"""Hardware A/B: RAY_BLOCK 512 vs 1024 (flagship trace + frame).

RAY_BLOCK is an import-time constant (NTRACER_RAY_BLOCK), so the A/B
alternates SUBPROCESSES: 512, 1024, 512, 1024 — adjacent runs share the
window closely enough that drift shows up as disagreement between the
two passes.  Each child measures batched-sync min-of-rounds (bench.py
methodology).

    python scripts/sweep_ray_block.py

Prints one JSON line per child plus a summary.
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CHILD = r'''
import json, os, sys, time
sys.path.insert(0, %(repo)r); sys.path.insert(0, %(scripts)r)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import jax, jax.numpy as jnp
from ntracer import NTracer, Material, ImageFormat, Channel
from ntracer_tpu.engine import wavefront
from ntracer_tpu.engine import resident_kernels as rk
from polytope import polytope_vertices, hull_prototypes

nt = NTracer(4)
protos = hull_prototypes(nt, polytope_vertices([5, 3, 3]),
                         Material((1, .5, .5)))
scene = nt.build_composite_scene(protos)
cam = nt.Camera(); cam.translate(nt.Vector.axis(2, -4.0))
scene.set_camera(cam); scene.set_fov(0.8)
W = H = 1024
fmt = ImageFormat(W, H, [Channel(8,1,0,0), Channel(8,0,1,0),
                         Channel(8,0,0,1)])
cfg, device, _ = wavefront.get_device_scene(scene)
res = wavefront._res_dict(device)
scene._set_view_size(W, H)
fovI, half_w, half_h = wavefront._fov_params(W, H, scene.fov)
xs, ys, _ = wavefront._ray_coords(jnp.int32(0), W, count=W*H)
o, dirs = wavefront.make_rays(jnp.asarray(scene._cam._origin),
                              jnp.asarray(scene._cam._t), fovI, half_w,
                              half_h, xs, ys)
skip = jnp.full((W*H,), -1, jnp.int32)
pctx = wavefront.primary_ctx(device, cfg, o[0])
kw = dict(order=pctx["order"], dmin=pctx["dmin"], sh=pctx["sh_res"])

def sync(x):
    while isinstance(x, tuple): x = x[0]
    return float(jnp.sum(x.reshape(-1)[:64].astype(jnp.int32)))

@jax.jit
def trace():
    t, slot, vis = rk.nearest_hit(res, o, dirs, skip, cfg.d,
                                  raw_slot=True, **kw)
    return t + slot, vis

def frame():
    return wavefront.frame_device_arrays(scene, fmt)

@jax.jit
def noop():
    return jnp.zeros((64,), jnp.float32)

sync(trace()); sync(frame()); sync(noop())
tout = trace()
visits = int(jnp.sum(tout[1]))

def batch(f, n=4):
    t0 = time.perf_counter()
    last = None
    for _ in range(n): last = f()
    sync(last)
    return (time.perf_counter() - t0) / n

best = {}
for _ in range(3):
    for nm, f in (("noop", noop), ("trace", trace), ("frame", frame)):
        best[nm] = min(best.get(nm, 9e9), batch(f))
rtt = best["noop"]
print(json.dumps({"ray_block": rk.RAY_BLOCK,
                  "visits": visits,
                  "trace_ms": round((best["trace"]-rtt)*1000, 2),
                  "frame_ms": round((best["frame"]-rtt)*1000, 2)}),
      flush=True)
''' % dict(repo=os.path.dirname(HERE), scripts=HERE)


def main():
    results = []
    for rb in ("512", "1024", "512", "1024"):
        env = dict(os.environ, NTRACER_RAY_BLOCK=rb,
                   JAX_COMPILATION_CACHE_DIR="/tmp/jaxcache")
        if int(rb) > 512:
            # the wider walk's unrolled stack exceeds Mosaic's ~16 MiB
            # default scoped-vmem limit (measured 17 MB at 1024)
            env["NTRACER_VMEM_LIMIT"] = "48"
        p = subprocess.run([sys.executable, "-c", CHILD], env=env,
                           capture_output=True, text=True, timeout=3000)
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("{")]
        if not line:
            print(json.dumps({"ray_block": rb, "error": True,
                              "stderr": p.stderr[-500:]}))
            continue
        r = json.loads(line[-1])
        results.append(r)
        print(json.dumps(r), flush=True)
    by = {}
    for r in results:
        by.setdefault(r["ray_block"], []).append(r["trace_ms"])
    print(json.dumps({"summary_trace_ms": {str(k): v
                                           for k, v in by.items()}}))


if __name__ == "__main__":
    main()
