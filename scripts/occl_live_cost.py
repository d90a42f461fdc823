"""Why does ONE executed occluded() call cost ~9 ms when its walk does
40 chunk visits?

Arms (all in one program family over the same trace prep, RTT-free):
  skipped     lax.cond no_work (the all-dead-batch shape)     [baseline]
  dead_exec   kernel EXECUTED with blive all zero (no cond)
  live5       the real global-light query (5 live blocks, 40 visits)
  live5_noct  same, but a local occluded() variant that does NOT do the
              strided counts[0, ::RAY_BLOCK] slice
  live_all    ldist = pool exit for every ray (2048 live blocks)

Run: python scripts/occl_live_cost.py
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from ntracer import NTracer, Material
    from ntracer_tpu.engine import wavefront as wf
    from ntracer_tpu.engine import resident_kernels as rk
    from jax.experimental import pallas as pl
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
    scene.set_shadows(True)

    W = H = 1024
    R = W * H
    cfg, device, _ = wf.get_device_scene(scene)
    scene._set_view_size(W, H)
    fovI, half_w, half_h = wf._fov_params(W, H, scene.fov)
    cam_o = jnp.asarray(scene._cam._origin)
    cam_t = jnp.asarray(scene._cam._t)
    res_k = wf._res_dict(device)
    gld = jnp.asarray([0.0, -1.0, 0, 0, 0, 0], f32)

    def occluded_nocount(res, o, dirs, ldist, skip, d, order=None):
        """rk.occluded minus the strided counts slice (timing arm)."""
        from ntracer_tpu.engine.resident_kernels import (
            _occ_sub_blocks, _order_boxes, _cparams, _pool_bytes,
            _occ_stack_bytes, _occlusion_kernel, _interpret, C_PAD,
            RAY_BLOCK, pltpu)
        R = o.shape[0]
        nc, pr, ck = res["gt"].shape
        ni = R // RAY_BLOCK
        SB = _occ_sub_blocks(ni)
        RB = SB * RAY_BLOCK
        if order is None:
            order = res["base_order"]
        o8t = jnp.pad(o.T, ((0, C_PAD - d), (0, 0)))
        d8t = jnp.pad(dirs.T, ((0, C_PAD - d), (0, 0)))
        n_eff = jnp.asarray(res["n_eff"], jnp.int32).reshape((1,))
        klo_t, khi_t = _order_boxes(res, order, d)
        ncp = klo_t.shape[1]
        blive = (jnp.max(ldist.reshape(ni, RAY_BLOCK), axis=1) > 0) \
            .astype(jnp.int32)
        out, counts = pl.pallas_call(
            partial(_occlusion_kernel, d, ck, SB),
            grid=(ni // SB,),
            interpret=_interpret(),
            compiler_params=_cparams(_pool_bytes(res), _occ_stack_bytes(SB)),
            in_specs=[
                pl.BlockSpec((C_PAD, RB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C_PAD, RB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, RB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, RB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((C_PAD, ncp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C_PAD, ncp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nc, pr, ck), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nc, C_PAD, ck), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nc, C_PAD, ck), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, RB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, RB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, R), jnp.int32),
                jax.ShapeDtypeStruct((1, R), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((RAY_BLOCK, 1), jnp.int32)],
        )(o8t, d8t, skip[None, :], ldist[None, :], order, n_eff, blive,
          klo_t, khi_t, res["gt"], res["ci"], res["ids"])
        return out[0] != 0

    def prep():
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
        sine = -wf._dotT(nT, gld[:, None])
        want = (sine > 0) & active
        ldT = jnp.broadcast_to(-gld[:, None], pT.shape)
        exit_t = rk._scene_exit_T(pT, ldT, res_k["b_lo"], res_k["b_hi"])
        ldist = jnp.minimum(jnp.where(want, wf.REAL_MAX, 0.0), exit_t)
        skip = r["pid"] - device["tri_base"]
        return r, pT, ldT, ldist, exit_t, skip

    def arm(kind):
        @jax.jit
        def f():
            r, pT, ldT, ldist, exit_t, skip = prep()
            acc = r["t"] + pT[0]
            if kind == "skipped":
                blk = jnp.zeros((R,), bool)
            elif kind == "dead_exec":
                blk, vis = rk.occluded(res_k, pT.T, ldT.T,
                                       jnp.zeros((R,), f32), skip, cfg.d)
            elif kind == "live5":
                blk, vis = rk.occluded(res_k, pT.T, ldT.T, ldist, skip,
                                       cfg.d)
            elif kind == "live5_noct":
                blk = occluded_nocount(res_k, pT.T, ldT.T, ldist, skip,
                                       cfg.d)
            elif kind == "live_all":
                blk, vis = rk.occluded(res_k, pT.T, ldT.T,
                                       jnp.maximum(exit_t, 0.0), skip,
                                       cfg.d)
            return jnp.sum((acc + blk)[:64].astype(jnp.int32))
        return f

    arms = [(k, arm(k)) for k in
            ("skipped", "dead_exec", "live5", "live5_noct", "live_all")]
    for name, f in arms:
        float(f())
    best = {name: float("inf") for name, _ in arms}
    for _ in range(4):
        for name, f in arms:
            t0 = time.perf_counter()
            last = None
            for _ in range(8):
                last = f()
            float(last)
            best[name] = min(best[name], (time.perf_counter() - t0) / 8 * 1e3)
    import json
    print(json.dumps({"experiment": "occl_live_cost",
                      "ms": {k: round(v, 2) for k, v in best.items()}}))


if __name__ == "__main__":
    main()
