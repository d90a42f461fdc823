#!/usr/bin/env python
"""Hardware sweep: walk-kernel sub-block count (SB) at a raised Mosaic
scoped-vmem limit (NTRACER_VMEM_LIMIT), flagship 120-cell trace.

Round-3 found SB=4 overflows the DEFAULT ~16 MiB scoped-vmem (17.4 MB
stack); v5e has 128 MiB VMEM.  With the limit raised, higher SB amortizes
the ~2.4-3.5 us fixed cost per grid step further.  All timings are
interleaved min-of-rounds in one process (one window).

    NTRACER_VMEM_LIMIT=64 python scripts/sweep_sb.py [--sbs 2,4,8]

Prints one JSON line.
"""

import argparse
import json
import math
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sbs", default="2,4,8")
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--size", type=int, default=1024)
    args = ap.parse_args()
    sbs = [int(s) for s in args.sbs.split(",")]

    import jax
    import jax.numpy as jnp
    from ntracer import NTracer, Material
    from ntracer_tpu.engine import wavefront
    from ntracer_tpu.engine import resident_kernels as rk
    from polytope import polytope_vertices, hull_prototypes

    nt = NTracer(4)
    verts = polytope_vertices([5, 3, 3])
    protos = hull_prototypes(nt, verts, Material((1, 0.5, 0.5)))
    scene = nt.build_composite_scene(protos)
    cam = nt.Camera()
    cam.translate(nt.Vector.axis(2, -4.0))
    scene.set_camera(cam)
    scene.set_fov(0.8)

    cfg, device, _ = wavefront.get_device_scene(scene)
    assert "res_gt" in device and "res_is_hbm" not in device
    res = wavefront._res_dict(device)
    W = H = args.size
    scene._set_view_size(W, H)
    fovI, half_w, half_h = wavefront._fov_params(W, H, scene.fov)
    xs, ys, _ = wavefront._ray_coords(jnp.int32(0), W, count=W * H)
    o, dirs = wavefront.make_rays(jnp.asarray(scene._cam._origin),
                                  jnp.asarray(scene._cam._t), fovI,
                                  half_w, half_h, xs, ys)
    skip = jnp.full((W * H,), -1, jnp.int32)
    pctx = wavefront.primary_ctx(device, cfg, o[0])
    kw = dict(order=pctx["order"], dmin=pctx["dmin"], sh=pctx["sh_res"])

    def sync(x):
        return float(jnp.sum(x[:64].astype(jnp.int32)))

    fns = {}
    for sb in sbs:
        os.environ["NTRACER_SB"] = str(sb)

        @jax.jit
        def trace_only(o=o, dirs=dirs, skip=skip):
            t, gid, pay, vis = rk.nearest_hit(
                res, o, dirs, skip, cfg.d, payload=True, **kw)
            return t
        t0 = time.perf_counter()
        sync(trace_only())  # compile
        print(f"# SB={sb} compiled in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        fns[sb] = trace_only

    best = {sb: float("inf") for sb in sbs}
    for _ in range(args.rounds):
        for sb in sbs:
            t0 = time.perf_counter()
            sync(fns[sb]())
            best[sb] = min(best[sb], time.perf_counter() - t0)

    print(json.dumps({
        "experiment": "sb_sweep_trace_only",
        "vmem_limit_mib": os.environ.get("NTRACER_VMEM_LIMIT"),
        "size": W,
        "trace_ms": {str(sb): round(v * 1000, 2) for sb, v in best.items()},
    }))


if __name__ == "__main__":
    main()
