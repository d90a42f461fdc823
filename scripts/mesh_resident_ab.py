#!/usr/bin/env python
"""Hardware A/B: 100k-triangle mesh, HBM-streaming walk vs a
VMEM-resident pool (VERDICT-r3 #4 follow-up; basis for the round-4
default POOL_VMEM_BUDGET=48 MiB).

The 100k mesh's pool is ~12.8 MB — over the OLD 8 MiB resident budget
(so rounds 1-3 always streamed it from HBM) but far under v5e's 128 MiB
VMEM.  This builds BOTH layouts in one process (one window) by
overriding rk.POOL_VMEM_BUDGET between flattens, and interleaves
trace-only and full-frame timings.

    python scripts/mesh_resident_ab.py

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

from bench_mesh import sphere_mesh  # noqa: E402


def build_scene(tris_np):
    from ntracer import NTracer, Material
    nt = NTracer(3)
    mat = Material((1, 0.6, 0.4))
    from ntracer_tpu.primitives import TrianglePrototype
    protos = TrianglePrototype.batch_from_points(tris_np, mat)
    scene = nt.build_composite_scene(protos)
    cam = nt.Camera()
    cam.translate(nt.Vector(0, 0, -3))
    scene.set_camera(cam)
    return scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=100000)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--rounds", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ntracer import ImageFormat, Channel
    from ntracer_tpu.engine import wavefront
    from ntracer_tpu.engine import resident_kernels as rk

    tris_np = sphere_mesh(args.tris)
    print(f"# {len(tris_np)} triangles, pool bytes "
          f"{rk.pool_vmem_bytes(len(tris_np), 3) / 2**20:.1f} MiB",
          file=sys.stderr)

    W = H = args.size
    fmt = ImageFormat(W, H, [Channel(8, 1, 0, 0), Channel(8, 0, 1, 0),
                             Channel(8, 0, 0, 1)])

    def prep(scene, name):
        cfg, device, _ = wavefront.get_device_scene(scene)
        is_hbm = "res_is_hbm" in device
        print(f"# {name}: res={'HBM' if is_hbm else 'VMEM'} "
              f"gt={device['res_gt'].shape}", file=sys.stderr)
        res = wavefront._res_dict(device)
        scene._set_view_size(W, H)
        fovI, half_w, half_h = wavefront._fov_params(W, H, scene.fov)
        xs, ys, _ = wavefront._ray_coords(jnp.int32(0), W, count=W * H)
        o, dirs = wavefront.make_rays(jnp.asarray(scene._cam._origin),
                                      jnp.asarray(scene._cam._t), fovI,
                                      half_w, half_h, xs, ys)
        skip = jnp.full((W * H,), -1, jnp.int32)
        pctx = wavefront.primary_ctx(device, cfg, o[0])
        kw = dict(order=pctx["order"], dmin=pctx["dmin"], sh=pctx["sh_res"])
        nearest = rk.nearest_hit_hbm if is_hbm else rk.nearest_hit

        @jax.jit
        def trace_only():
            t, gid, pay, vis = nearest(res, o, dirs, skip, cfg.d,
                                       payload=True, **kw)
            return t, vis

        def frame():
            return wavefront.frame_device_arrays(scene, fmt)
        return trace_only, frame, is_hbm

    def sync(x):
        x = x[0] if isinstance(x, tuple) else x
        return float(jnp.sum(x[:64].astype(jnp.int32)))

    # A: tiny budget -> HBM streaming walk (the rounds-1-3 default path)
    old = rk.POOL_VMEM_BUDGET
    rk.POOL_VMEM_BUDGET = 1 << 20
    try:
        scene_a = build_scene(tris_np)
        tr_a, fr_a, hbm_a = prep(scene_a, "A(1 MiB budget)")
    finally:
        rk.POOL_VMEM_BUDGET = old
    # B: current default -> VMEM-resident walk
    scene_b = build_scene(tris_np)
    tr_b, fr_b, hbm_b = prep(scene_b, f"B(default {old / 2**20:.0f} MiB)")

    for name, f in (("A trace", tr_a), ("B trace", tr_b),
                    ("A frame", fr_a), ("B frame", fr_b)):
        t0 = time.perf_counter()
        va = sync(f())
        print(f"# {name} compiled in {time.perf_counter()-t0:.1f}s "
              f"(sync={va})", file=sys.stderr)

    agree = abs(sync(tr_a()) - sync(tr_b())) == 0

    best = {}
    for _ in range(args.rounds):
        for name, f in (("hbm_trace", tr_a), ("resident_trace", tr_b),
                        ("hbm_frame", fr_a), ("resident_frame", fr_b)):
            t0 = time.perf_counter()
            sync(f())
            dt = time.perf_counter() - t0
            best[name] = min(best.get(name, float("inf")), dt)

    print(json.dumps({
        "experiment": "mesh_resident_ab",
        "tris": int(len(tris_np)),
        "size": W,
        "paths": {"a_hbm": hbm_a, "b_hbm": hbm_b},
        "t_reduction_agrees": agree,
        **{k + "_ms": round(v * 1000, 2) for k, v in best.items()},
    }))


if __name__ == "__main__":
    main()
