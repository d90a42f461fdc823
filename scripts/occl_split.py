"""Occlusion-call bisection on the 6-D lit scene, RTT-free.

The lit stage split attributes ~9-10 ms/frame to three per-light
occlusion calls whose walks visit ~40 chunks total — nearly all of the
cost is per-call fixed overhead.  This probe splits ONE point-light
occlusion call into additive stages (all jitted whole-programs; stage
cost = difference of queued-batch timings, so the tunnel RTT cancels):

  base        trace + shade-side light prep (lv, dist, want) only
  +ldist      ... + the ldist/liveness glue occlusion() runs pre-kernel
  +kernel     ... + the occluded() Pallas call
  +finish     ... + _occlusion_finish (solids loop; n_solids=0 here)
  full3       trace + ALL THREE lights' occlusion calls (the frame shape)

Run on the real chip: python scripts/occl_split.py [--rounds 4]
"""
import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ntracer import NTracer, Material
    from ntracer_tpu.engine import wavefront
    from ntracer_tpu.engine import resident_kernels as rk
    f32 = jnp.float32

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
    cfg, device, _ = wavefront.get_device_scene(scene)
    scene._set_view_size(W, H)
    fovI, half_w, half_h = wavefront._fov_params(W, H, scene.fov)
    cam_o = jnp.asarray(scene._cam._origin)
    cam_t = jnp.asarray(scene._cam._t)

    def trace_prep():
        """Primary trace + the shade-side per-light prep (lv/dist/want),
        shared by every stage."""
        xs, ys, _ = wavefront._ray_coords(jnp.int32(0), W, count=W * H)
        o, dirs = wavefront.make_rays(cam_o, cam_t, fovI, half_w, half_h,
                                      xs, ys)
        pctx = wavefront.primary_ctx(device, cfg, cam_o)
        r = wavefront.trace_pool(device, cfg, o, dirs, jnp.full(
            (W * H,), -1, jnp.int32), shared_origin=o[0], pctx=pctx)
        dist_m = wavefront.aabb_distance(cfg, device, o, dirs)
        active = r["hit"] & (dist_m >= 0)
        pointT = r["point"].T if r["point"].shape[0] == W * H else r["point"]
        normalT = r["normal"].T if r["normal"].shape[0] == W * H \
            else r["normal"]
        return o, dirs, r, pointT, normalT, active

    def light_prep(pointT, normalT, active, li):
        plp = device["pl_pos"][li]
        plc = device["pl_color"][li]
        lv = pointT - plp[:, None]
        dist = jnp.sqrt(jnp.sum(lv * lv, axis=0))
        lv = lv / dist[None, :]
        sine = jnp.sum(normalT * lv, axis=0)
        strength = 1.0 / jnp.power(dist, cfg.d - 1)
        want = (sine > 0) & (jnp.max(plc) * strength * sine
                             > wavefront.LIGHT_THRESHOLD) & active
        return lv, dist, want

    res_k = wavefront._res_dict(device)

    def stage(level, lights=1):
        @jax.jit
        def f():
            o, dirs, r, pointT, normalT, active = trace_prep()
            acc = r["t"] + pointT[0]
            for li in range(lights):
                lv, dist, want = light_prep(pointT, normalT, active, li)
                acc = acc + lv[0] + dist * want
                if level == 0:
                    continue
                ldist = jnp.where(want, dist, 0.0)
                pool_ldist = ldist           # clamp_exit=False (point light)
                live = pool_ldist > 0
                ni = (W * H) // rk.RAY_BLOCK
                blive = (jnp.max(pool_ldist.reshape(ni, rk.RAY_BLOCK),
                                 axis=1) > 0).astype(jnp.int32)
                acc = acc + jnp.any(live) + jnp.sum(blive)
                if level == 1:
                    continue
                skip_local = r["pid"] - device["tri_base"]
                if level >= 2:
                    def walk(_):
                        blk, vis = rk.occluded(res_k, pointT.T, lv.T,
                                               pool_ldist, skip_local, cfg.d)
                        return blk, jnp.sum(vis)

                    def no_work(_):
                        return jnp.zeros((W * H,), bool), jnp.int32(0)

                    blk, nvis = jax.lax.cond(jnp.any(live), walk, no_work,
                                             None)
                    acc = acc + blk + nvis
                if level >= 3:
                    carry = dict(blocked=blk, filt=jnp.ones((W * H,), f32))
                    blocked, filt = wavefront._occlusion_finish(
                        device, cfg, pointT.T, lv.T, ldist, r["pid"], carry)
                    acc = acc + blocked + filt
            return jnp.sum(acc[:64])
        return f

    def full_frame():
        from ntracer import ImageFormat, Channel
        fmt = ImageFormat(W, H, [Channel(8, 1, 0, 0), Channel(8, 0, 1, 0),
                                 Channel(8, 0, 0, 1)])

        def f():
            return wavefront.frame_device_arrays(scene, fmt)
        return f

    stages = [
        ("prep_only", stage(0)),
        ("plus_ldist_glue", stage(1)),
        ("plus_kernel", stage(2)),
        ("plus_finish", stage(3)),
        ("prep3", stage(0, lights=2)),
        ("kernel3", stage(3, lights=2)),
        ("frame", full_frame()),
    ]

    def sync(x):
        while isinstance(x, (tuple, list)):
            x = x[0]
        return float(jnp.sum(jnp.ravel(x)[:64].astype(jnp.int32)))

    for name, f in stages:
        sync(f())  # compile + warm

    best = {name: float("inf") for name, _ in stages}
    for r_ in range(args.rounds):
        for name, f in stages:
            t0 = time.perf_counter()
            last = None
            for _ in range(args.frames):
                last = f()
            sync(last)
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / args.frames * 1e3)
    out = {k: round(v, 2) for k, v in best.items()}
    import json
    d1 = best["plus_ldist_glue"] - best["prep_only"]
    d2 = best["plus_kernel"] - best["plus_ldist_glue"]
    d3 = best["plus_finish"] - best["plus_kernel"]
    print(json.dumps({"experiment": "occl_split", "ms": out,
                      "derived_one_light_ms": {
                          "ldist_glue": round(d1, 2),
                          "kernel_call": round(d2, 2),
                          "finish": round(d3, 2)}}))


if __name__ == "__main__":
    main()
