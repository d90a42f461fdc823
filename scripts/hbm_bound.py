#!/usr/bin/env python
"""HBM-walk bound analysis for the 100k-triangle mesh (VERDICT-r3 #4).

Decides fetch-bound vs pair-bound with data:

  * REAL walk     — production nearest_hit_hbm over a full frame of
                    primary rays; time (min-of-rounds) + visit counters.
  * PROBE walk    — the same kernel with ``probe=True``: identical
                    candidate scan, fetch schedule, and DMA waits, but the
                    pair test replaced by a buffer touch.  Its per-visit
                    time is the walk's fetch+sync floor (its bound never
                    tightens, so it visits MORE chunks — per-visit cost is
                    the comparable number).

Derived: pairs/frame, DMA bytes/frame and GB/s, per-visit costs, the
pair-test share (real - probe per-visit), and the modeled floor
= real_visits x probe_per_visit.  All timings are same-process
interleaved; counters are window-independent.

    python scripts/hbm_bound.py [--tris 100000] [--size 1024]

Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)

import numpy as np

from bench_mesh import sphere_mesh  # noqa: E402  (same scene as the bench)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=100000)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ntracer import NTracer, Material
    from ntracer_tpu.engine import wavefront
    from ntracer_tpu.engine import resident_kernels as rk

    # Round 4 made the 100k mesh VMEM-resident by default (48 MiB pool
    # budget); this probe bounds the HBM *streaming* walk, the path pools
    # >48 MiB (~370k+ tris) still take — force its layout regardless.
    rk.POOL_VMEM_BUDGET = min(rk.POOL_VMEM_BUDGET, 1 << 20)

    nt = NTracer(3)
    mat = Material((1, 0.6, 0.4))
    tris = sphere_mesh(args.tris)
    from ntracer_tpu.primitives import TrianglePrototype
    protos = TrianglePrototype.batch_from_points(tris, mat)
    scene = nt.build_composite_scene(protos)
    cam = nt.Camera()
    cam.translate(nt.Vector(0, 0, -3))
    scene.set_camera(cam)

    cfg, device, _ = wavefront.get_device_scene(scene)
    assert "res_is_hbm" in device, "pool fit VMEM; not the HBM path"
    res = wavefront._res_dict(device)
    d = cfg.d

    W = H = args.size
    scene._set_view_size(W, H)
    fovI, half_w, half_h = wavefront._fov_params(W, H, scene.fov)
    # production swizzled ray order: each 512-ray block is a 32x16 px tile
    # (block coherence drives the visit counts)
    xs, ys, _swz = wavefront._ray_coords(jnp.int32(0), W, count=W * H)
    o, dirs = wavefront.make_rays(jnp.asarray(scene._cam._origin),
                                  jnp.asarray(scene._cam._t), fovI, half_w,
                                  half_h, xs, ys)
    R = o.shape[0]
    skip = jnp.full((R,), -1, jnp.int32)
    pctx = wavefront.primary_ctx(device, cfg, o[0])
    kw = dict(order=pctx["order"], dmin=pctx["dmin"], sh=pctx["sh_res"])

    nc, pr, ck = res["gt"].shape
    bytes_per_visit = (pr + 2 * rk.C_PAD) * ck * 4

    def run(probe):
        t_, id_, vis = rk.nearest_hit_hbm(res, o, dirs, skip, d,
                                          probe=probe, **kw)
        # block_until_ready does not reliably synchronize through the
        # tunneled backend (bench.py) — pull a tiny reduction instead;
        # the device executes in order, so this waits for the walk
        float(jnp.sum(t_[:64].astype(jnp.int32)))
        return t_, id_, vis

    # compile both
    run(False)
    run(True)
    best = {False: float("inf"), True: float("inf")}
    vis = {}
    for _ in range(args.rounds):
        for probe in (False, True):
            t0 = time.perf_counter()
            _, _, v = run(probe)
            best[probe] = min(best[probe], time.perf_counter() - t0)
            vis[probe] = int(np.sum(np.asarray(v)))

    real_s, probe_s = best[False], best[True]
    real_v, probe_v = vis[False], vis[True]
    per_real = real_s / max(real_v, 1)
    per_probe = probe_s / max(probe_v, 1)
    floor_s = per_probe * real_v
    out = {
        "scene": f"sphere mesh {len(tris)} tris, {W}x{H} primary rays",
        "chunks": int(nc), "ck": int(ck),
        "real_ms": round(real_s * 1e3, 2),
        "real_visits": real_v,
        "pairs_g": round(real_v * rk.RAY_BLOCK * ck / 1e9, 3),
        "probe_ms": round(probe_s * 1e3, 2),
        "probe_visits": probe_v,
        "per_visit_real_us": round(per_real * 1e6, 3),
        "per_visit_probe_us": round(per_probe * 1e6, 3),
        "pair_test_share": round(1 - per_probe / per_real, 3),
        "dma_bytes_per_visit": bytes_per_visit,
        "dma_gb_s_real": round(real_v * bytes_per_visit / real_s / 1e9, 2),
        "fetch_sync_floor_ms": round(floor_s * 1e3, 2),
        "verdict": ("fetch/sync-bound" if per_probe / per_real > 0.6
                    else "pair-compute-bound"),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
