"""Where does the lit scene's shadows-on frame delta actually go?

occl_split.py showed the occlusion machinery (ldist glue + kernel +
finish) costs ~0.3 ms for ALL THREE lights — yet lit_split's
frame_shadows - frame_no_shadows is ~9 ms.  The remaining suspects are
the shade-side shadow arm: the specular accumulation (a _powf
transcendental pair over 1M lanes per light) and the blocked/filt
where-chains.  This probe re-stages shade_local_T's light loop (a local
copy of the same math over the same (k, R) tensors) in additive levels,
all in ONE program family so the tunnel RTT cancels:

  diffuse      no-shadow semantics (the frame_no_shadows shade arm)
  +occl        + occlusion calls + blocked/filt application (no specular)
  +spec        + add_specular (full shadows semantics)

Run: python scripts/shadow_shade_split.py [--rounds 4]
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
    from ntracer_tpu.engine import wavefront as wf
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
    cfg, device, _ = wf.get_device_scene(scene)
    scene._set_view_size(W, H)
    fovI, half_w, half_h = wf._fov_params(W, H, scene.fov)
    cam_o = jnp.asarray(scene._cam._origin)
    cam_t = jnp.asarray(scene._cam._t)
    R = W * H

    def trace_prep():
        xs, ys, _ = wf._ray_coords(jnp.int32(0), W, count=R)
        o, dirs = wf.make_rays(cam_o, cam_t, fovI, half_w, half_h, xs, ys)
        pctx = wf.primary_ctx(device, cfg, cam_o)
        r = wf.trace_pool(device, cfg, o, dirs, jnp.full((R,), -1,
                                                         jnp.int32),
                          shared_origin=o[0], pctx=pctx)
        dist_m = wf.aabb_distance(cfg, device, o, dirs)
        active = r["hit"] & (dist_m >= 0)
        pT = r["point"].T if r["point"].shape[0] == R else r["point"]
        nT = r["normal"].T if r["normal"].shape[0] == R else r["normal"]
        dT = dirs.T
        return r, pT, nT, dT, active

    rowT_probe = device["mat_pack"].T

    def shade(level):
        """Local copy of shade_local_T's light loop at three levels:
        0 = diffuse only (no-shadows arm), 1 = + occlusion + where
        application, 2 = + specular (full)."""
        @jax.jit
        def f():
            r, pT, nT, dT, active = trace_prep()
            mi = r["mat"]
            rowT = rowT_probe[:, mi]
            mc = rowT[0:3]
            mspec = rowT[3:6]
            spec_int = rowT[8]
            spec_exp = rowT[9]
            light = jnp.zeros((3, R), f32)
            specular = jnp.zeros((3, R), f32)
            spec_a = jnp.zeros((R,), f32)

            def add_specular(specular, spec_a, filteredT, light_dirT, mask):
                mask = mask & (spec_int != 0)
                h = wf._unitT(light_dirT - dT)
                base = wf._powf(wf._dotT(nT, h), spec_exp) * spec_int
                new_s = specular + mspec * filteredT * (
                    base * (1 - spec_a))[None, :]
                new_a = spec_a + base * (1 - spec_a)
                new_s = new_s * new_a[None, :]
                specular = jnp.where(mask[None, :], new_s, specular)
                spec_a = jnp.where(mask, new_a, spec_a)
                return specular, spec_a

            # level semantics: 0 = diffuse everywhere; 1 = occlusion on
            # point lights only; 1.5 (=="g") = occlusion on the global
            # light only; 2 = occlusion everywhere; 3 = + specular
            occl_points = level in (1, 2, 3)
            occl_global = level in ("g", 2, 3)
            for li in range(cfg.n_point_lights):
                plp = device["pl_pos"][li]
                plc = device["pl_color"][li]
                lv = pT - plp[:, None]
                dist = jnp.sqrt(wf._dotT(lv, lv))
                lv = lv / dist[None, :]
                sine = wf._dotT(nT, lv)
                strength = 1.0 / jnp.power(dist, cfg.d - 1)
                if not occl_points:
                    contrib = plc[:, None] * (strength * sine)[None, :]
                    light += jnp.where((sine > 0)[None, :], contrib, 0.0)
                    continue
                want = (sine > 0) & (jnp.max(plc) * strength * sine
                                     > wf.LIGHT_THRESHOLD) & active
                blocked, filt = wf.occlusion(device, cfg, pT.T, lv.T,
                                             jnp.where(want, dist, 0.0),
                                             r["pid"], clamp_exit=False)
                ok = want & ~blocked
                filteredT = plc[:, None] * filt[None, :] * strength[None, :]
                light += jnp.where(ok[None, :], filteredT * sine[None, :],
                                   0.0)
                if level == 3:
                    specular, spec_a = add_specular(specular, spec_a,
                                                    filteredT, lv, ok)

            for gi in range(cfg.n_global_lights):
                gld = device["gl_dir"][gi]
                glc = device["gl_color"][gi]
                sine = -wf._dotT(nT, gld[:, None])
                if not occl_global:
                    light += jnp.where((sine > 0)[None, :],
                                       glc[:, None] * sine[None, :], 0.0)
                    continue
                want = (sine > 0) & active
                ldT = jnp.broadcast_to(-gld[:, None], pT.shape)
                blocked, filt = wf.occlusion(
                    device, cfg, pT.T, ldT.T,
                    jnp.where(want, wf.REAL_MAX, 0.0), r["pid"])
                ok = want & ~blocked
                filteredT = glc[:, None] * filt[None, :]
                light += jnp.where(ok[None, :], filteredT * sine[None, :],
                                   0.0)
                if level == 3:
                    specular, spec_a = add_specular(specular, spec_a,
                                                    filteredT, ldT, ok)

            out = mc * light + specular + spec_a[None, :]
            return jnp.sum(out[0, :64].astype(jnp.int32))
        return f

    stages = [("diffuse", shade(0)), ("occl_points", shade(1)),
              ("occl_global", shade("g")), ("occl_all", shade(2)),
              ("plus_spec", shade(3))]

    for name, f in stages:
        f()

    best = {name: float("inf") for name, _ in stages}
    for _ in range(args.rounds):
        for name, f in stages:
            t0 = time.perf_counter()
            last = None
            for _ in range(8):
                last = f()
            float(last)
            best[name] = min(best[name], (time.perf_counter() - t0) / 8 * 1e3)
    import json
    print(json.dumps({
        "experiment": "shadow_shade_split",
        "ms": {k: round(v, 2) for k, v in best.items()},
        "derived_ms": {
            "points_occl": round(best["occl_points"] - best["diffuse"], 2),
            "global_occl": round(best["occl_global"] - best["diffuse"], 2),
            "all_occl": round(best["occl_all"] - best["diffuse"], 2),
            "specular": round(best["plus_spec"] - best["occl_all"], 2)}}))


if __name__ == "__main__":
    main()
