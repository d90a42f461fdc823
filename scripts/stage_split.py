#!/usr/bin/env python
"""Frame-stage decomposition on hardware, RTT-free by construction.

Times a nested chain of jitted programs at one fixed view — noop,
raygen, raygen+trace (payload on/off), +shade, full packed frame — all
interleaved min-of-rounds in one window.  Every timing includes exactly
one sync pull, so SUCCESSIVE DIFFERENCES cancel the tunnel RTT and give
per-stage compute time (CLAUDE.md round-4: single-call timings carry the
~25 ms tunnel RTT).

    python scripts/stage_split.py [--size 1024]

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
    ap.add_argument("--rounds", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ntracer import NTracer, Material, ImageFormat, Channel
    from ntracer_tpu.engine import wavefront
    from ntracer_tpu.engine import resident_kernels as rk
    from ntracer_tpu.engine import packing
    from polytope import polytope_vertices, hull_prototypes

    nt = NTracer(4)
    verts = polytope_vertices([5, 3, 3])
    protos = hull_prototypes(nt, verts, Material((1, 0.5, 0.5)))
    scene = nt.build_composite_scene(protos)
    cam = nt.Camera()
    cam.translate(nt.Vector.axis(2, -4.0))
    scene.set_camera(cam)
    scene.set_fov(0.8)

    W = H = args.size
    fmt = ImageFormat(W, H, [Channel(8, 1, 0, 0), Channel(8, 0, 1, 0),
                             Channel(8, 0, 0, 1)])
    cfg, device, _ = wavefront.get_device_scene(scene)
    res = wavefront._res_dict(device)
    scene._set_view_size(W, H)
    fovI, half_w, half_h = wavefront._fov_params(W, H, scene.fov)
    cam_o = jnp.asarray(scene._cam._origin)
    cam_t = jnp.asarray(scene._cam._t)
    pctx0 = wavefront.primary_ctx(device, cfg,
                                  jnp.zeros((cfg.d,), jnp.float32) + cam_o)
    kw = dict(order=pctx0["order"], dmin=pctx0["dmin"], sh=pctx0["sh_res"])

    @jax.jit
    def noop():
        return jnp.zeros((64,), jnp.float32)

    @jax.jit
    def raygen():
        xs, ys, _ = wavefront._ray_coords(jnp.int32(0), W, count=W * H)
        o, dirs = wavefront.make_rays(cam_o, cam_t, fovI, half_w, half_h,
                                      xs, ys)
        return o + dirs  # keep both live

    def make_trace(payload=False, raw=False):
        @jax.jit
        def trace():
            xs, ys, _ = wavefront._ray_coords(jnp.int32(0), W, count=W * H)
            o, dirs = wavefront.make_rays(cam_o, cam_t, fovI, half_w,
                                          half_h, xs, ys)
            skip = jnp.full((W * H,), -1, jnp.int32)
            out = rk.nearest_hit(res, o, dirs, skip, cfg.d,
                                 payload=payload, raw_slot=raw, **kw)
            return out[0] + out[1]   # keep t and id/gid live
        return trace

    slot_pack = jnp.asarray(device["res_slot_pack"])

    @jax.jit
    def trace_raw_gather():
        xs, ys, _ = wavefront._ray_coords(jnp.int32(0), W, count=W * H)
        o, dirs = wavefront.make_rays(cam_o, cam_t, fovI, half_w, half_h,
                                      xs, ys)
        skip = jnp.full((W * H,), -1, jnp.int32)
        t, slot, vis = rk.nearest_hit(res, o, dirs, skip, cfg.d,
                                      raw_slot=True, **kw)
        row = slot_pack[jnp.clip(slot, 0, None)]
        return t + row[:, 0] + row[:, cfg.d + 1]    # keep the gather live

    def make_pool_stage(level):
        """Production trace_pool + incremental shading levels:
        1 = trace_pool (incl. _trace_finish hit geometry)
        2 = + aabb_distance mask
        3 = + shade_local + background + compose
        """
        @jax.jit
        def stage():
            xs, ys, _ = wavefront._ray_coords(jnp.int32(0), W, count=W * H)
            o, dirs = wavefront.make_rays(cam_o, cam_t, fovI, half_w,
                                          half_h, xs, ys)
            skip = jnp.full((W * H,), -1, jnp.int32)
            pctx = wavefront.primary_ctx(device, cfg, cam_o)
            r = wavefront.trace_pool(device, cfg, o, dirs, skip,
                                     shared_origin=o[0], pctx=pctx)
            if level == 1:
                return r["t"] + r["normal"][:, 0]
            dist = wavefront.aabb_distance(cfg, device, o, dirs)
            hit = r["hit"] & (dist >= 0)
            if level == 2:
                return r["t"] + hit
            local, _, _ = wavefront.shade_local(
                device, cfg, dirs, r["point"], r["normal"], r["pid"],
                r["mat"], 0, dyn, active=hit)
            bg = wavefront.background(cfg, dyn, dirs)
            return jnp.where(hit[:, None], local, bg)[:, 0]
        return stage

    n_tiles = -(-(W * H) // wavefront.TILE)
    key = packing.format_key(fmt)
    dyn = wavefront._scene_dyn(scene)

    def frame():
        return wavefront._frame_packed_composite(
            device, cfg, dyn, cam_o, cam_t, (fovI, half_w, half_h),
            jnp.int32(0), W, n_tiles, key)

    def frame_unpacked():
        # full shading pipeline but raw float colors (no device packing)
        return wavefront._frame_packed_composite(
            device, cfg, dyn, cam_o, cam_t, (fovI, half_w, half_h),
            jnp.int32(0), W, n_tiles, None)

    @jax.jit
    def pool3_transposed():
        # EXPERIMENT: same math as pool3 but all post-trace elementwise
        # work on (k, R) transposed tensors (R on the lane axis)
        xs, ys, _ = wavefront._ray_coords(jnp.int32(0), W, count=W * H)
        o, dirs = wavefront.make_rays(cam_o, cam_t, fovI, half_w, half_h,
                                      xs, ys)
        skip = jnp.full((W * H,), -1, jnp.int32)
        t, slot, vis = rk.nearest_hit(res, o, dirs, skip, cfg.d,
                                      raw_slot=True, **kw)
        spT = jnp.asarray(device["res_slot_pack"]).T     # (d+2, NS)
        rowT = spT[:, jnp.clip(slot, 0, None)]           # (d+2, R)
        dT = dirs.T                                      # (d, R)
        fnT = rowT[:cfg.d]
        mi = rowT[cfg.d].astype(jnp.int32)
        hit = slot >= 0
        # view-facing unit normal
        denom = jnp.sum(fnT * dT, axis=0)
        nrm = jnp.sqrt(jnp.sum(fnT * fnT, axis=0))
        nT = fnT / nrm[None, :] * jnp.where(denom > 0, -1.0, 1.0)[None, :]
        sine = -jnp.sum(dT * nT, axis=0)
        row10 = jnp.asarray(device["mat_pack"]).T[:, mi] \
            if "mat_pack" in device else None
        mcT = row10[0:3]
        mspecT = row10[3:6]
        spec_int = row10[8]
        spec_exp = row10[9]
        cl = jnp.maximum(sine, 0.0)
        base = jnp.power(cl, spec_exp) * spec_int
        mask = (sine > 0) & (spec_int != 0)
        spec = jnp.where(mask[None, :], mspecT * base[None, :], 0.0)
        spec_a = jnp.where(mask, base, 0.0)
        r0 = mcT * cl[None, :]
        localT = spec + (1 - spec_a)[None, :] * r0
        inten = dT[cfg.bg_axis]
        bg1 = dyn["bg1"][:, None]
        bg2 = dyn["bg2"][:, None]
        bg3 = dyn["bg3"][:, None]
        bgT = jnp.where(inten[None, :] >= 0,
                        bg1 * inten[None, :] + bg2 * (1 - inten)[None, :],
                        bg3 * (-inten)[None, :] + bg2 * (1 + inten)[None, :])
        out = jnp.where(hit[None, :], localT, bgT)
        return out[0]

    @jax.jit
    def frame_pack_after():
        # EXPERIMENT: permute packed per-pixel u32 words instead of the
        # (R, 3) float colors (bit-identical stream)
        xs, ys, swz = wavefront._ray_coords(jnp.int32(0), W, count=W * H)
        o, dirs = wavefront.make_rays(cam_o, cam_t, fovI, half_w, half_h,
                                      xs, ys)
        pctx = wavefront.primary_ctx(device, cfg, cam_o)
        colors = wavefront.ray_colors(device, cfg, dyn, o, dirs, pctx=pctx)
        return packing.pack_device_stream(colors, key, permute=swz)

    stages = [
        ("noop", noop),
        ("raygen", raygen),
        ("trace_raw", make_trace(raw=True)),
        ("trace_nopay", make_trace()),
        ("trace_pay", make_trace(payload=True)),
        ("trace_raw_gather", trace_raw_gather),
        ("pool1_finish", make_pool_stage(1)),
        ("pool2_aabb", make_pool_stage(2)),
        ("pool3_shade", make_pool_stage(3)),
        ("pool3_transposed", pool3_transposed),
        ("frame_unpacked", frame_unpacked),
        ("frame", frame),
        ("frame_pack_after", frame_pack_after),
    ]

    def sync(x):
        while isinstance(x, (tuple, list)):
            x = x[0]
        x = x.reshape(-1)
        return float(jnp.sum(x[:64].astype(jnp.int32)))

    for name, f in stages:
        t0 = time.perf_counter()
        sync(f())
        print(f"# {name} compiled in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

    eq = bool(jax.device_get(jnp.array_equal(frame(), frame_pack_after())))

    best = {}
    for _ in range(args.rounds):
        for name, f in stages:
            t0 = time.perf_counter()
            sync(f())
            best[name] = min(best.get(name, float("inf")),
                             time.perf_counter() - t0)

    ms = {k: round(v * 1000, 2) for k, v in best.items()}
    print(json.dumps({
        "experiment": "stage_split",
        "size": W,
        "pack_after_bitexact": eq,
        "raw_ms": ms,
        "derived_ms": {
            "rtt_floor": ms["noop"],
            "raygen": round(ms["raygen"] - ms["noop"], 2),
            "trace(raw slot)": round(ms["trace_raw"] - ms["raygen"], 2),
            "gid_map_gather": round(ms["trace_nopay"] - ms["trace_raw"], 2),
            "payload_epilogue": round(ms["trace_pay"] - ms["trace_raw"], 2),
            "slot_gather": round(ms["trace_raw_gather"] - ms["trace_raw"],
                                 2),
            "trace_finish": round(ms["pool1_finish"]
                                  - ms["trace_raw_gather"], 2),
            "aabb_mask": round(ms["pool2_aabb"] - ms["pool1_finish"], 2),
            "shade_bg_compose": round(ms["pool3_shade"] - ms["pool2_aabb"],
                                      2),
            "unswizzle+glue": round(ms["frame_unpacked"] - ms["pool3_shade"],
                                    2),
            "shade+bg+glue": round(ms["frame_unpacked"]
                                   - ms["trace_raw_gather"], 2),
            "device_pack": round(ms["frame"] - ms["frame_unpacked"], 2),
            "frame_compute": round(ms["frame"] - ms["noop"], 2),
        },
    }))


if __name__ == "__main__":
    main()
