#!/usr/bin/env python
"""Numpy simulator of the resident chunk walk — a window-independent way
to explore culling structure (the tunneled TPU's wall-clock drifts up to
~9x between sessions, but chunk-visit counts and pair-test work are
machine-independent).

Simulates, per RAY_BLOCK of the tiled frame, the kernel's front-to-back
candidate walk (emin bound vs max best_t, serial candidates) for a given
(ray-block size, chunk size) and reports:
  visits, pair-work (visits * R * ck), modeled kernel ms using constants
  measured in a healthy window (0.9 us per 512x128 visit ~ VPU roofline,
  ~6 us per-block fixed for the entry pass, ~1.5 us per iteration).

    python scripts/walk_sim.py [--scene 120cell|mesh] [--views 3]
        [--rb 512] [--ck 128] [--size 1024]
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

f32 = np.float32
BIG = np.float32(3e37)
INF = np.float32(np.inf)
ROUNDING_FUZZ = np.float32(np.finfo(np.float32).eps * 10)


def build_scene(kind):
    from ntracer import NTracer, Material
    if kind == "120cell":
        from polytope import polytope_vertices, hull_prototypes
        nt = NTracer(4)
        protos = hull_prototypes(nt, polytope_vertices([5, 3, 3]),
                                 Material((1, 0.5, 0.5)))
        scene = nt.build_composite_scene(protos)
        cam = nt.Camera()
        cam.translate(nt.Vector.axis(2, -4.0))
        scene.set_camera(cam)
        scene.set_fov(0.8)
        return nt, scene, -4.0
    else:
        from bench_mesh import sphere_mesh
        nt = NTracer(3)
        tris = sphere_mesh(100000)
        mat = Material((1, 0.6, 0.4))
        protos = [nt.TrianglePrototype([nt.Vector(*p) for p in t], mat)
                  for t in tris]
        scene = nt.build_composite_scene(protos)
        cam = nt.Camera()
        cam.translate(nt.Vector.axis(2, -3.0))
        scene.set_camera(cam)
        return nt, scene, -3.0


def pool_arrays(scene):
    from ntracer_tpu.engine import wavefront
    cfg, device, flat = wavefront.get_device_scene(scene)
    a = flat.arrays
    return cfg, (np.asarray(a["tri_p1"]), np.asarray(a["tri_fn"]),
                 np.asarray(a["tri_en"]), np.asarray(a["tri_dc"]),
                 np.asarray(a["cull_lo"]), np.asarray(a["cull_hi"]))


def tiled_rays(scene, W, H, rb_w, rb_h):
    """All frame rays in (rb_w x rb_h)-tile order, float32."""
    from ntracer_tpu.engine import wavefront
    scene._set_view_size(W, H)
    fovI, hw, hh = wavefront._fov_params(W, H, scene.fov)
    cam_t = np.asarray(scene._cam._t, f32)
    o = np.asarray(scene._cam._origin, f32)
    xs, ys = np.meshgrid(np.arange(W, dtype=f32), np.arange(H, dtype=f32))
    # tile order (within-tile index secondary, tile index primary)
    tx = (xs // rb_w).astype(int)
    ty = (ys // rb_h).astype(int)
    order = np.lexsort((
        ((ys % rb_h) * rb_w + (xs % rb_w)).ravel(),
        (ty * (W // rb_w) + tx).ravel()))
    xs = xs.ravel()[order]
    ys = ys.ravel()[order]
    dirs = (cam_t[2][None, :]
            + cam_t[0][None, :] * (fovI * (xs - hw))[:, None]
            - cam_t[1][None, :] * (fovI * (ys - hh))[:, None]).astype(f32)
    dirs /= np.sqrt((dirs * dirs).sum(1, keepdims=True)).astype(f32)
    return o, dirs


def make_bins(pool, ck):
    from ntracer_tpu.engine import resident_kernels as rk
    p1, fn, en, dc, lo, hi = pool
    fn_norm = np.linalg.norm(fn, axis=1)
    bins = rk.centroid_bins(lo, hi, fn_norm, ck)
    klo = np.stack([b[0] for b in bins])
    khi = np.stack([b[1] for b in bins])
    ids = [np.asarray(b[2], int) for b in bins]
    return klo.astype(f32), khi.astype(f32), ids


def entry_block(o, dirs, klo, khi):
    """(R, nc) slab entry, INF on miss."""
    R = dirs.shape[0]
    nc = klo.shape[0]
    tn = np.full((R, nc), -BIG, f32)
    tf = np.full((R, nc), BIG, f32)
    for c in range(dirs.shape[1]):
        dcm = dirs[:, c:c + 1]
        par = dcm == 0
        inv = np.where(par, 0, 1.0 / np.where(par, 1, dcm)).astype(f32)
        a = (klo[None, :, c] - o[c]) * inv
        b = (khi[None, :, c] - o[c]) * inv
        ins = (o[c] >= klo[None, :, c]) & (o[c] <= khi[None, :, c])
        t0 = np.where(par, np.where(ins, -BIG, BIG), np.minimum(a, b))
        t1 = np.where(par, np.where(ins, BIG, -BIG), np.maximum(a, b))
        tn = np.maximum(tn, t0)
        tf = np.minimum(tf, t1)
    entry = np.maximum(tn, 0.0)
    ok = (tf >= entry) & (tf >= 0)
    return np.where(ok, entry, INF).astype(f32)


def scene_exit(o, dirs, b_lo, b_hi):
    e = entry_block(o, dirs, b_lo[None, :], b_hi[None, :])[:, 0]
    # exit distance: recompute tf
    R = dirs.shape[0]
    tf = np.full((R,), BIG, f32)
    tn = np.full((R,), -BIG, f32)
    for c in range(dirs.shape[1]):
        dcm = dirs[:, c]
        par = dcm == 0
        inv = np.where(par, 0, 1.0 / np.where(par, 1, dcm)).astype(f32)
        a = (b_lo[c] - o[c]) * inv
        b = (b_hi[c] - o[c]) * inv
        ins = (o[c] >= b_lo[c]) & (o[c] <= b_hi[c])
        t0 = np.where(par, np.where(ins, -BIG, BIG), np.minimum(a, b))
        t1 = np.where(par, np.where(ins, BIG, -BIG), np.maximum(a, b))
        tn = np.maximum(tn, t0)
        tf = np.minimum(tf, t1)
    hit = (tf >= np.maximum(tn, 0.0)) & (tf >= 0)
    return np.where(hit, tf * (1 + 16 * ROUNDING_FUZZ), 0.0).astype(f32)


def pair_min_t(o, dirs, p1, fn, en, dc, ids):
    """Per-ray nearest valid t against the triangles `ids` (f32)."""
    g_fn = fn[ids]
    denom = dirs @ g_fn.T                              # (R, n)
    O0 = (o[None, :] * g_fn).sum(1)                    # (n,)
    tt = -(O0[None, :] + dc[ids][None, :]) / np.where(denom != 0, denom, 1)
    valid = (denom != 0) & (tt > 0)
    tot = np.zeros_like(tt)
    for i in range(en.shape[1]):
        e = en[ids][:, i]
        ci = (e * p1[ids]).sum(1)
        a = ci[None, :] - (o[None, :] * e).sum(1)[None, :] - tt * (dirs @ e.T)
        valid &= (a >= -ROUNDING_FUZZ) & (a <= 1 + ROUNDING_FUZZ)
        tot += a
    valid &= tot <= 1 + ROUNDING_FUZZ
    return np.where(valid, tt, INF).min(axis=1).astype(f32)


def simulate(scene, pool, W, H, rb_w, rb_h, ck, p_cand=4, quiet=False):
    p1, fn, en, dc, lo, hi = pool
    klo, khi, ids = make_bins(pool, ck)
    nc = len(ids)
    real = np.linalg.norm(fn, axis=1) > 0
    b_lo = lo[real].min(0)
    b_hi = hi[real].max(0)

    o, dirs = tiled_rays(scene, W, H, rb_w, rb_h)
    R = rb_w * rb_h
    n_blocks = dirs.shape[0] // R

    # front-to-back order from the shared origin
    cl = np.minimum(klo, khi)
    ch = np.maximum(klo, khi)
    p = np.clip(o[None, :], cl, ch)
    dmin = np.linalg.norm(p - o[None, :], axis=1)
    order = np.argsort(dmin, kind="stable")

    visits = 0
    iters = 0
    for b in range(n_blocks):
        db = dirs[b * R:(b + 1) * R]
        entry = entry_block(o, db, klo, khi)[:, order]
        emin = entry.min(axis=0)
        best = scene_exit(o, db, b_lo, b_hi)
        k = 0
        while True:
            # packed candidate selection with the stale bound: take the
            # next p_cand candidates at once
            bound = best.max()
            cand = np.nonzero(emin[k:] < bound)[0]
            if cand.size == 0:
                break
            take = cand[:p_cand] + k
            iters += 1
            for kk in take:
                ci = order[kk]
                t = pair_min_t(o, db, p1, fn, en, dc, np.asarray(ids[ci]))
                best = np.minimum(best, t)
                visits += 1
            k = int(take[-1]) + 1
    # model: per-visit pair cost scales with R*ck; entry pass with R*nc
    a_us = 0.9 * (R * ck) / (512 * 128)
    b_us = 6.0 * (R * max(nc, 128)) / (512 * 128)
    c_us = 1.5
    model_ms = (visits * a_us + n_blocks * b_us + iters * c_us) / 1000
    out = dict(rb=(rb_w, rb_h), ck=ck, nc=nc, blocks=n_blocks,
               visits=visits, visits_per_block=round(visits / n_blocks, 2),
               pair_work=visits * R * ck,
               model_ms=round(model_ms, 2))
    if not quiet:
        print(out, flush=True)
    return out


def per_ray_termination(scene, pool, W, H, rb_w, rb_h, ck,
                        groups=(1, 8, 64, None), quiet=False):
    """Model TRUE per-group front-to-back termination at several bound
    granularities (VERDICT-r3 #2: the production kernel's bound is the
    whole-block max, ``best.max()`` above; this answers what finer bounds
    would save).

    For group size g, the block's rays are split into R/g groups; each
    group walks the chunks in ITS OWN emin-sorted order and visits chunk
    c only while ``emin_g(c) < max_{r in g} best_r`` — i.e. a
    hypothetical kernel with an independent walk + bound per group
    (g=1: true per-ray stop-at-first-hit; g=R: the shipped kernel, up to
    visit-order differing from the shared global sort).  Reports visits
    and pair work = visits * g * ck per granularity."""
    p1, fn, en, dc, lo, hi = pool
    klo, khi, ids = make_bins(pool, ck)
    nc = len(ids)
    real = np.linalg.norm(fn, axis=1) > 0
    b_lo = lo[real].min(0)
    b_hi = hi[real].max(0)

    o, dirs = tiled_rays(scene, W, H, rb_w, rb_h)
    R = rb_w * rb_h
    n_blocks = dirs.shape[0] // R
    groups = [R if g is None else g for g in groups]

    visits = {g: 0 for g in groups}
    for b in range(n_blocks):
        db = dirs[b * R:(b + 1) * R]
        entry = entry_block(o, db, klo, khi)         # (R, nc), INF on miss
        best0 = scene_exit(o, db, b_lo, b_hi)        # (R,)
        # nearest valid t per (ray, chunk), only where the chunk can
        # matter for that ray (entry < the ray's scene-exit bound)
        t = np.full((R, nc), INF, f32)
        for c in range(nc):
            rows = np.nonzero(entry[:, c] < best0)[0]
            if rows.size:
                t[rows, c] = pair_min_t(o, db[rows], p1, fn, en, dc,
                                        np.asarray(ids[c]))
        for g in groups:
            G = R // g
            eg = entry.reshape(G, g, nc).min(axis=1)          # (G, nc)
            ordg = np.argsort(eg, axis=1, kind="stable")      # (G, nc)
            e_s = np.take_along_axis(eg, ordg, 1)             # (G, nc)
            t_s = np.take_along_axis(
                t.reshape(G, g, nc), ordg[:, None, :], 2)     # (G, g, nc)
            best = best0.reshape(G, g).copy()
            alivev = np.ones(G, bool)
            for k in range(nc):
                vis = alivev & (e_s[:, k] < best.max(axis=1))
                visits[g] += int(vis.sum())
                upd = np.minimum(best, t_s[:, :, k])
                best = np.where(vis[:, None], upd, best)
                # sorted e ascending + non-increasing bound: the first
                # failed test is permanent, so a failed group is done
                alivev = vis
                if not alivev.any():
                    break
    out = dict(rb=(rb_w, rb_h), ck=ck, nc=nc, blocks=n_blocks)
    gmax = max(groups)
    for g in groups:
        out[f"visits_g{g}"] = visits[g]
        out[f"pairs_g{g}"] = visits[g] * g * ck
    for g in groups:
        out[f"ratio_g{g}"] = round(out[f"pairs_g{gmax}"]
                                   / max(out[f"pairs_g{g}"], 1), 2)
    if not quiet:
        print(out, flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="120cell")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--views", type=int, default=2)
    ap.add_argument("--per-ray", action="store_true",
                    help="per-ray/per-group termination experiment "
                         "(VERDICT-r3 #2) instead of the block-bound sweep")
    ap.add_argument("--configs",
                    default="32x16:128,16x8:128,16x8:64,16x16:64,8x8:32,32x16:64,32x16:256")
    args = ap.parse_args()

    nt, scene, cam_dist = build_scene(args.scene)
    cfg, pool = pool_arrays(scene)
    W = H = args.size

    import math as m
    incr = 2 * m.pi / 8
    h = 1 / m.sqrt(nt.dimension - 1)
    camera = scene.get_camera()

    for v in range(args.views):
        print(f"--- view {v}", flush=True)
        for cfg_s in args.configs.split(","):
            rb_s, _, ck_s = cfg_s.partition(":")
            rw, _, rh = rb_s.partition("x")
            if args.per_ray:
                per_ray_termination(scene, pool, W, H,
                                    int(rw), int(rh), int(ck_s))
            else:
                simulate(scene, pool, W, H, int(rw), int(rh), int(ck_s))
        # advance camera like the benchmarks do
        a2 = camera.axes[0] * h + camera.axes[1] * h
        for i in range(nt.dimension - 3):
            a2 = a2 + camera.axes[i + 3] * h
        camera.transform(nt.Matrix.rotation(camera.axes[2], a2, incr))
        camera.normalize()
        camera.origin = camera.axes[2] * cam_dist
        scene.set_camera(camera)


if __name__ == "__main__":
    main()
