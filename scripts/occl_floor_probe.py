"""Pin the executed-kernel fixed cost of the occlusion walk (~10 ms at
2048 ray-blocks with ZERO live work — occl_live_cost.py).

Variants of a stripped _occlusion_kernel (no walks at all), same grid
and BlockSpecs unless stated:

  full_dead     the real kernel, blive all zero        [reference point]
  init_only     zero-init stores only, no pl.when
  no_pool       init_only WITHOUT the pool operands (gt/ci/ids/boxes)
  no_rays       init_only WITHOUT the per-block ray operands (o/d/skip/ld)
  out8          init_only with (8, RB) outputs instead of (1, RB)
  sb1           init_only with SB=1 (grid 2048, one sub-block per step)

Run: python scripts/occl_floor_probe.py
"""
import os
import sys
import time
from functools import partial

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp
    from ntracer import NTracer, Material
    from ntracer_tpu.engine import wavefront as wf
    from ntracer_tpu.engine import resident_kernels as rk
    from ntracer_tpu.engine.resident_kernels import (
        _occ_sub_blocks, _order_boxes, _cparams, _pool_bytes,
        _occ_stack_bytes, _interpret, C_PAD, RAY_BLOCK, pltpu)
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

    W = H = 1024
    R = W * H
    cfg, device, _ = wf.get_device_scene(scene)
    scene._set_view_size(W, H)
    fovI, half_w, half_h = wf._fov_params(W, H, scene.fov)
    cam_o = jnp.asarray(scene._cam._origin)
    cam_t = jnp.asarray(scene._cam._t)
    res = wf._res_dict(device)

    nc, pr, ck = res["gt"].shape
    ni = R // RAY_BLOCK
    SBd = _occ_sub_blocks(ni)
    order = res["base_order"]
    klo_t, khi_t = _order_boxes(res, order, d)
    ncp = klo_t.shape[1]
    n_eff = jnp.asarray(res["n_eff"], jnp.int32).reshape((1,))

    def init_kernel(SB, out_rows, *refs):
        out_ref = refs[-2] if len(refs) >= 2 else refs[-1]
        count_ref = refs[-1]
        for sb in range(SB):
            sl = slice(sb * RAY_BLOCK, (sb + 1) * RAY_BLOCK)
            out_ref[:, sl] = jnp.zeros((out_rows, RAY_BLOCK), jnp.int32)
            count_ref[:, sl] = jnp.zeros((out_rows, RAY_BLOCK), jnp.int32)

    def ray_specs(SB):
        RB = SB * RAY_BLOCK
        return [
            pl.BlockSpec((C_PAD, RB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C_PAD, RB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ]

    def pool_specs():
        return [
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
        ]

    blive0 = jnp.zeros((ni,), jnp.int32)

    blive_step0 = jnp.zeros((ni // SBd,), jnp.int32)

    def make_arm(kind):
        SB = 1 if kind == "sb1" else SBd
        RB = SB * RAY_BLOCK
        out_rows = 8 if kind == "out8" else 1
        use_pool = kind not in ("no_pool",)
        use_rays = kind not in ("no_rays",)

        def stripped(*refs):
            init_kernel(SB, out_rows, *refs)

        def when_trivial(*refs):
            out_ref, count_ref = refs[-2], refs[-1]
            blive_ref = None
            for rf in refs:
                pass
            # blive is the 3rd SMEM operand of pool_specs (order, n_eff,
            # blive); locate it positionally: rays(4) + order + n_eff +
            # blive when pool operands are present
            blive_ref = refs[4 + 2]
            for sb in range(SB):
                sl = slice(sb * RAY_BLOCK, (sb + 1) * RAY_BLOCK)
                out_ref[:, sl] = jnp.zeros((out_rows, RAY_BLOCK), jnp.int32)
                count_ref[:, sl] = jnp.zeros((out_rows, RAY_BLOCK),
                                             jnp.int32)

                @pl.when(blive_ref[pl.program_id(0) * SB + sb] != 0)
                def _t(sl=sl):
                    out_ref[:, sl] = jnp.ones((out_rows, RAY_BLOCK),
                                              jnp.int32)

        def when_loads(*refs):
            """Body = the real prologue's loads+transposes (+ entry-min),
            under pl.when, all dead: detects compiler hoisting."""
            o_ref, d_ref = refs[0], refs[1]
            out_ref, count_ref = refs[-2], refs[-1]
            blive_ref = refs[4 + 2]
            klo_t_ref, khi_t_ref = refs[4 + 3], refs[4 + 4]
            for sb in range(SB):
                sl = slice(sb * RAY_BLOCK, (sb + 1) * RAY_BLOCK)
                out_ref[:, sl] = jnp.zeros((out_rows, RAY_BLOCK), jnp.int32)
                count_ref[:, sl] = jnp.zeros((out_rows, RAY_BLOCK),
                                             jnp.int32)

                @pl.when(blive_ref[pl.program_id(0) * SB + sb] != 0)
                def _t(sl=sl):
                    o8 = o_ref[:, sl].T
                    d8 = d_ref[:, sl].T
                    emin = rk._entry_min_all(d, o8, d8, klo_t_ref,
                                             khi_t_ref)
                    out_ref[:, sl] = jnp.broadcast_to(
                        (jnp.max(emin) > 0).astype(jnp.int32),
                        (out_rows, RAY_BLOCK))

        def when_while(*refs):
            """Body = scalar-only while_loop under pl.when, all dead."""
            out_ref, count_ref = refs[-2], refs[-1]
            blive_ref = refs[4 + 2]
            for sb in range(SB):
                sl = slice(sb * RAY_BLOCK, (sb + 1) * RAY_BLOCK)
                out_ref[:, sl] = jnp.zeros((out_rows, RAY_BLOCK), jnp.int32)
                count_ref[:, sl] = jnp.zeros((out_rows, RAY_BLOCK),
                                             jnp.int32)

                @pl.when(blive_ref[pl.program_id(0) * SB + sb] != 0)
                def _t(sl=sl):
                    k = jax.lax.while_loop(lambda k: k < 3,
                                           lambda k: k + 1, jnp.int32(0))
                    count_ref[:, sl] = jnp.full((out_rows, RAY_BLOCK), k,
                                                jnp.int32)

        def when_vec2scal(*refs):
            """Body = vector load -> scalar min -> store, all dead."""
            o_ref = refs[0]
            out_ref, count_ref = refs[-2], refs[-1]
            blive_ref = refs[4 + 2]
            for sb in range(SB):
                sl = slice(sb * RAY_BLOCK, (sb + 1) * RAY_BLOCK)
                out_ref[:, sl] = jnp.zeros((out_rows, RAY_BLOCK), jnp.int32)
                count_ref[:, sl] = jnp.zeros((out_rows, RAY_BLOCK),
                                             jnp.int32)

                @pl.when(blive_ref[pl.program_id(0) * SB + sb] != 0)
                def _t(sl=sl):
                    s = jnp.min(o_ref[:, sl]).astype(jnp.int32)
                    count_ref[:, sl] = jnp.full((out_rows, RAY_BLOCK), s,
                                                jnp.int32)

        def when_chunk(dyn_idx, *refs):
            """Body = entry-min + while with _chunk_hits (fixed or
            order_ref-dynamic chunk index), all dead."""
            o_ref, d_ref, skip_ref = refs[0], refs[1], refs[2]
            out_ref, count_ref = refs[-2], refs[-1]
            order_ref = refs[4]
            blive_ref = refs[4 + 2]
            klo_t_ref, khi_t_ref = refs[4 + 3], refs[4 + 4]
            gt_ref, ci_ref, ids_ref = refs[4 + 5], refs[4 + 6], refs[4 + 7]
            for sb in range(SB):
                sl = slice(sb * RAY_BLOCK, (sb + 1) * RAY_BLOCK)
                out_ref[:, sl] = jnp.zeros((out_rows, RAY_BLOCK), jnp.int32)
                count_ref[:, sl] = jnp.zeros((out_rows, RAY_BLOCK),
                                             jnp.int32)

                @pl.when(blive_ref[pl.program_id(0) * SB + sb] != 0)
                def _t(sl=sl):
                    o8 = o_ref[:, sl].T
                    d8 = d_ref[:, sl].T
                    skip = skip_ref[0:1, sl].T
                    emin = rk._entry_min_all(d, o8, d8, klo_t_ref,
                                             khi_t_ref)

                    def body(state):
                        k, acc = state
                        idx = order_ref[k] if dyn_idx else 0
                        t, valid = rk._chunk_hits(d, ck, False, gt_ref,
                                                  ci_ref, ids_ref, idx,
                                                  o8, d8, skip)
                        hit = jnp.any(valid & (t < 1.0), axis=1,
                                      keepdims=True)
                        return k + 1, acc + jnp.sum(hit.astype(jnp.int32))

                    k, acc = jax.lax.while_loop(
                        lambda s: s[0] < jnp.int32(3), body,
                        (jnp.int32(0), jnp.int32(0)))
                    count_ref[:, sl] = jnp.full(
                        (out_rows, RAY_BLOCK),
                        acc + jnp.max(emin).astype(jnp.int32), jnp.int32)

        def step_when_chunk(*refs):
            """Outer per-step pl.when around the 8 chunk-body regions:
            does the per-region unconditional cost nest under it?"""
            o_ref, d_ref, skip_ref = refs[0], refs[1], refs[2]
            out_ref, count_ref = refs[-2], refs[-1]
            order_ref = refs[4]
            blive_ref = refs[4 + 2]
            klo_t_ref, khi_t_ref = refs[4 + 3], refs[4 + 4]
            gt_ref, ci_ref, ids_ref = refs[4 + 5], refs[4 + 6], refs[4 + 7]
            sblive_ref = refs[12]
            for sb in range(SB):
                sl = slice(sb * RAY_BLOCK, (sb + 1) * RAY_BLOCK)
                out_ref[:, sl] = jnp.zeros((out_rows, RAY_BLOCK), jnp.int32)
                count_ref[:, sl] = jnp.zeros((out_rows, RAY_BLOCK),
                                             jnp.int32)

            @pl.when(sblive_ref[pl.program_id(0)] != 0)
            def _s():
                for sb in range(SB):
                    sl = slice(sb * RAY_BLOCK, (sb + 1) * RAY_BLOCK)

                    @pl.when(blive_ref[pl.program_id(0) * SB + sb] != 0)
                    def _t(sl=sl):
                        o8 = o_ref[:, sl].T
                        d8 = d_ref[:, sl].T
                        skip = skip_ref[0:1, sl].T

                        def body(state):
                            k, acc = state
                            t, valid = rk._chunk_hits(
                                d, ck, False, gt_ref, ci_ref, ids_ref,
                                order_ref[k], o8, d8, skip)
                            hit = jnp.any(valid & (t < 1.0), axis=1,
                                          keepdims=True)
                            return k + 1, acc + jnp.sum(
                                hit.astype(jnp.int32))

                        k, acc = jax.lax.while_loop(
                            lambda s: s[0] < jnp.int32(3), body,
                            (jnp.int32(0), jnp.int32(0)))
                        count_ref[:, sl] = jnp.full((out_rows, RAY_BLOCK),
                                                    acc, jnp.int32)

        def fori_chunk(*refs):
            """ONE chunk-body region per grid step: fori over sub-blocks
            with 128-aligned dynamic lane slices."""
            o_ref, d_ref, skip_ref = refs[0], refs[1], refs[2]
            out_ref, count_ref = refs[-2], refs[-1]
            order_ref = refs[4]
            blive_ref = refs[4 + 2]
            gt_ref, ci_ref, ids_ref = refs[4 + 5], refs[4 + 6], refs[4 + 7]
            for sb in range(SB):
                sl = slice(sb * RAY_BLOCK, (sb + 1) * RAY_BLOCK)
                out_ref[:, sl] = jnp.zeros((out_rows, RAY_BLOCK), jnp.int32)
                count_ref[:, sl] = jnp.zeros((out_rows, RAY_BLOCK),
                                             jnp.int32)

            def sub(sb, carry):
                @pl.when(blive_ref[pl.program_id(0) * SB + sb] != 0)
                def _t():
                    sl = pl.ds(sb * RAY_BLOCK, RAY_BLOCK)
                    o8 = o_ref[:, sl].T
                    d8 = d_ref[:, sl].T
                    skip = skip_ref[0:1, sl].T

                    def body(state):
                        k, acc = state
                        t, valid = rk._chunk_hits(
                            d, ck, False, gt_ref, ci_ref, ids_ref,
                            order_ref[k], o8, d8, skip)
                        hit = jnp.any(valid & (t < 1.0), axis=1,
                                      keepdims=True)
                        return k + 1, acc + jnp.sum(hit.astype(jnp.int32))

                    k, acc = jax.lax.while_loop(
                        lambda s: s[0] < jnp.int32(3), body,
                        (jnp.int32(0), jnp.int32(0)))
                    count_ref[:, sl] = jnp.full((out_rows, RAY_BLOCK),
                                                acc, jnp.int32)
                return carry
            jax.lax.fori_loop(0, SB, sub, 0)

        def step_when_trivial(*refs):
            out_ref, count_ref = refs[-2], refs[-1]
            blive_ref = refs[4 + 2]
            sblive_ref = refs[12]     # appended after the 8 pool operands
            for sb in range(SB):
                sl = slice(sb * RAY_BLOCK, (sb + 1) * RAY_BLOCK)
                out_ref[:, sl] = jnp.zeros((out_rows, RAY_BLOCK), jnp.int32)
                count_ref[:, sl] = jnp.zeros((out_rows, RAY_BLOCK),
                                             jnp.int32)

            @pl.when(sblive_ref[pl.program_id(0)] != 0)
            def _s():
                for sb in range(SB):
                    sl = slice(sb * RAY_BLOCK, (sb + 1) * RAY_BLOCK)

                    @pl.when(blive_ref[pl.program_id(0) * SB + sb] != 0)
                    def _t(sl=sl):
                        out_ref[:, sl] = jnp.ones((out_rows, RAY_BLOCK),
                                                  jnp.int32)

        @jax.jit
        def f(o8t, d8t, skip2, ld2):
            specs = []
            args = []
            if use_rays:
                specs += ray_specs(SB)
                args += [o8t, d8t, skip2, ld2]
            if use_pool:
                specs += pool_specs()
                args += [order, n_eff, blive0, klo_t, khi_t,
                         res["gt"], res["ci"], res["ids"]]
            if kind == "full_dead":
                kern = partial(rk._occlusion_kernel, d, ck, SB)
                scratch = [pltpu.VMEM((RAY_BLOCK, 1), jnp.int32)]
            elif kind == "when_trivial":
                kern = when_trivial
                scratch = []
            elif kind == "when_loads":
                kern = when_loads
                scratch = []
            elif kind == "when_while":
                kern = when_while
                scratch = []
            elif kind == "when_vec2scal":
                kern = when_vec2scal
                scratch = []
            elif kind == "when_chunk_fix":
                kern = partial(when_chunk, False)
                scratch = []
            elif kind == "when_chunk_dyn":
                kern = partial(when_chunk, True)
                scratch = []
            elif kind == "step_when_chunk":
                kern = step_when_chunk
                scratch = []
                specs = specs + [pl.BlockSpec(memory_space=pltpu.SMEM)]
                args = args + [blive_step0]
            elif kind == "fori_chunk":
                kern = fori_chunk
                scratch = []
            elif kind == "step_when_trivial":
                kern = step_when_trivial
                scratch = []
                specs = specs + [pl.BlockSpec(memory_space=pltpu.SMEM)]
                args = args + [blive_step0]
            else:
                kern = stripped
                scratch = []
            out, counts = pl.pallas_call(
                kern,
                grid=(ni // SB,),
                interpret=_interpret(),
                compiler_params=_cparams(
                    _pool_bytes(res) if use_pool else 0,
                    _occ_stack_bytes(SB)),
                in_specs=specs,
                out_specs=[
                    pl.BlockSpec((out_rows, RB), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((out_rows, RB), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((out_rows, R), jnp.int32),
                    jax.ShapeDtypeStruct((out_rows, R), jnp.int32),
                ],
                scratch_shapes=scratch,
            )(*args)
            return jnp.sum(out[0, :64]) + jnp.sum(counts[0, :64])
        return f

    o8t = jnp.zeros((C_PAD, R), f32)
    d8t = jnp.ones((C_PAD, R), f32)
    skip2 = jnp.full((1, R), -1, jnp.int32)
    ld2 = jnp.zeros((1, R), f32)

    kinds = ["full_dead", "init_only", "step_when_chunk", "fori_chunk"]
    arms = [(k, make_arm(k)) for k in kinds]
    for name, f in arms:
        float(f(o8t, d8t, skip2, ld2))

    best = {name: float("inf") for name, _ in arms}
    for _ in range(4):
        for name, f in arms:
            t0 = time.perf_counter()
            last = None
            for _ in range(12):
                last = f(o8t, d8t, skip2, ld2)
            float(last)
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / 12 * 1e3)
    import json
    print(json.dumps({"experiment": "occl_floor_probe", "ni": ni,
                      "ms": {k: round(v, 2) for k, v in best.items()}}))


if __name__ == "__main__":
    main()
