#!/usr/bin/env python
"""Reflective-scene per-depth decomposition, RTT-free by construction.

The reflective+shadowed scene (bench_reflect.py) runs TEN walk
invocations per frame (5 bounce traces + 5 shadow occlusions) at
~31.7 Gpairs/s aggregate vs the flagship's ~53 — this script attributes
the gap per depth.  It times a ladder of cumulative bounce-loop
programs (max_reflect_depth = 0..4, shadows off/on; every timing
includes exactly one sync pull so successive differences cancel the
tunnel RTT, stage_split.py's method) and takes exact per-depth visit
counters from the same config sweep, giving per-visit cost for each
invocation class:

  * depth-0 trace: shared-origin rows hoisted (the primary-path halving)
  * depth-k traces: per-ray origins — the hoist CANNOT apply; the pair
    test recomputes the origin dots per visit (~2x FLOPs per pair)
  * occlusions: per-ray origins (hit points), any-hit with per-block
    saturation exit (resident_kernels._occlusion_walk find_next)

If bounce/occlusion per-visit cost clusters at ~2x the depth-0 cost,
the scene is at its intrinsic compute floor and the remaining lever
would be per-visit FLOPs, not scheduling.

    python scripts/reflect_split.py [--size 1024] [--rounds 5]

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ntracer_tpu.engine import wavefront
    from bench_reflect import build_scene

    scene = build_scene()
    W = H = args.size

    scene._set_view_size(W, H)
    fovI, half_w, half_h = wavefront._fov_params(W, H, scene.fov)
    cam_o = jnp.asarray(scene._cam._origin)
    cam_t = jnp.asarray(scene._cam._t)
    dyn = wavefront._scene_dyn(scene)

    @jax.jit
    def noop():
        return jnp.zeros((64,), jnp.float32)

    def make_stage(max_depth, shadows):
        # snapshot a cfg at this (depth, shadows) config; the device
        # buffers are shared across configs (_mutate_config keeps them)
        scene.set_max_reflect_depth(max_depth)
        scene.set_shadows(shadows)
        cfg, device, _ = wavefront.get_device_scene(scene)

        @jax.jit
        def stage():
            xs, ys, _ = wavefront._ray_coords(jnp.int32(0), W, count=W * H)
            o, dirs = wavefront.make_rays(cam_o, cam_t, fovI, half_w,
                                          half_h, xs, ys)
            pctx = wavefront.primary_ctx(device, cfg, cam_o)
            colors = wavefront.ray_colors(device, cfg, dyn, o, dirs,
                                          pctx=pctx)
            return colors[:, 0]
        return stage

    # exact per-depth counters from the same config ladder
    # (window-independent): diffs across max_depth give per-depth trace
    # visits; shadows on/off at each depth gives occlusion visits
    stats = {}
    for sh in (False, True):
        for k in range(5):
            scene.set_max_reflect_depth(k)
            scene.set_shadows(sh)
            st = wavefront.frame_stats(scene, W, H)
            stats[(k, sh)] = dict(
                trace=int(st.get("chunks_visited", 0)),
                occl=int(st.get("occl_chunks_visited", 0)),
                shadow_rays=int(st.get("shadow_rays", 0)))

    stages = [("noop", noop)]
    for k in range(5):
        stages.append((f"d{k}_noshadow", make_stage(k, False)))
    for k in range(5):
        stages.append((f"d{k}_shadow", make_stage(k, True)))
    # restore the benchmark config
    scene.set_max_reflect_depth(4)
    scene.set_shadows(True)

    def sync(x):
        x = x.reshape(-1)
        return float(jnp.sum(x[:64].astype(jnp.int32)))

    for name, f in stages:
        t0 = time.perf_counter()
        sync(f())
        print(f"# {name} compiled in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

    best = {}
    for _ in range(args.rounds):
        for name, f in stages:
            t0 = time.perf_counter()
            sync(f())
            best[name] = min(best.get(name, float("inf")),
                             time.perf_counter() - t0)

    ms = {k: round(v * 1000, 2) for k, v in best.items()}

    from ntracer_tpu.engine import resident_kernels as rk
    pair = rk.RAY_BLOCK * rk.CK  # pair tests per visit

    derived = {}
    per_depth = []
    for k in range(5):
        tr_ms = ms[f"d{k}_noshadow"] - (ms[f"d{k-1}_noshadow"]
                                        if k else ms["noop"])
        full_ms = ms[f"d{k}_shadow"] - (ms[f"d{k-1}_shadow"]
                                        if k else ms["noop"])
        occ_ms = ms[f"d{k}_shadow"] - ms[f"d{k}_noshadow"] \
            - (ms[f"d{k-1}_shadow"] - ms[f"d{k-1}_noshadow"] if k else 0)
        tr_vis = stats[(k, False)]["trace"] - (
            stats[(k - 1, False)]["trace"] if k else 0)
        oc_vis = stats[(k, True)]["occl"] - (
            stats[(k - 1, True)]["occl"] if k else 0)
        row = dict(
            depth=k,
            trace_shade_ms=round(tr_ms, 2),
            with_shadow_ms=round(full_ms, 2),
            occl_ms=round(occ_ms, 2),
            trace_visits=tr_vis,
            occl_visits=oc_vis,
            trace_us_per_visit=round(tr_ms * 1000 / tr_vis, 2)
            if tr_vis else None,
            occl_us_per_visit=round(occ_ms * 1000 / oc_vis, 2)
            if oc_vis else None,
            trace_gpairs_s=round(tr_vis * pair / tr_ms / 1e6, 1)
            if tr_ms > 0 else None,
            occl_gpairs_s=round(oc_vis * pair / occ_ms / 1e6, 1)
            if occ_ms > 0 else None,
        )
        per_depth.append(row)
    derived["per_depth"] = per_depth
    derived["frame_compute_ms"] = round(ms["d4_shadow"] - ms["noop"], 2)

    print(json.dumps({
        "experiment": "reflect_split",
        "size": W,
        "rtt_floor_ms": ms["noop"],
        "raw_ms": ms,
        "derived": derived,
    }))


if __name__ == "__main__":
    main()
