"""Pallas TPU kernels for the ray/triangle hot loop.

The XLA path materializes the (rays x triangles) plane-dot matrices in HBM
(two matmul outputs + ~10 elementwise passes), which is bandwidth-bound.
These kernels tile (RAY_BLOCK x TRI_BLOCK) through VMEM: triangle plane rows
broadcast against ray coordinate columns on the VPU, the nearest-hit
reduction lives in scratch, and per-chunk AABB culling skips whole tiles
with ``pl.when`` (the TPU analogue of the reference's k-d early-outs,
tracer.hpp:1179-1243).

Used for opaque pools (scenes without transparency — the common case and
all benchmark scenes); transparent scenes fall back to the XLA path.

Math per tile (tracer.hpp:411-440 vectorized):
    O_p = sum_c o[:,c]    * G[p,c,:]      (RAY_BLOCK, TRI_BLOCK) per plane
    D_p = sum_c dirs[:,c] * G[p,c,:]
    t = -(O_0 + dc) / D_0
    a_i = ci_i - O_i - t*D_i   for the d-1 edge planes
    hit iff D_0 != 0, t > 0, all a_i in [-FUZZ, 1+FUZZ], sum a_i <= 1+FUZZ
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32

RAY_BLOCK = 512
TRI_BLOCK = 512


def _interpret():
    # tests run the kernels in interpreter mode on CPU
    return jax.default_backend() != "tpu"

ROUNDING_FUZZ = np.float32(np.finfo(np.float32).eps * 10)
INF = np.float32(np.inf)


def prepare_tri_arrays(tri_p1, tri_fn, tri_en, tri_dc, tri_lo, tri_hi, d):
    """Kernel-friendly triangle layouts (host side, once per scene).

    Returns a dict of numpy arrays: ``gt`` (d*d, T) plane rows (plane-major,
    coordinate-minor rows; face normal first), ``ci`` (d, T) with row 0 the
    plane offset -dc and rows 1..d-1 the edge offsets e_i . p1, and
    per-TRI_BLOCK AABBs ``k_lo``/``k_hi`` (T/TRI_BLOCK, d)."""
    T = tri_p1.shape[0]
    assert T % TRI_BLOCK == 0
    planes = np.concatenate([tri_fn[:, None, :], tri_en], axis=1)  # (T, d, d)
    gt = np.ascontiguousarray(
        planes.transpose(1, 2, 0).reshape(d * d, T)).astype(np.float32)
    ci = np.zeros((d, T), np.float32)
    ci[0] = -tri_dc
    ci[1:] = np.einsum("tid,td->it", tri_en, tri_p1, dtype=np.float32)

    nk = T // TRI_BLOCK
    k_lo = np.zeros((nk, 1, d), np.float32)
    k_hi = np.zeros((nk, 1, d), np.float32)
    k_any = np.zeros((nk, 1, 1), np.float32)
    fn_norm = np.linalg.norm(tri_fn, axis=1)
    for k in range(nk):
        sl = slice(k * TRI_BLOCK, (k + 1) * TRI_BLOCK)
        real = fn_norm[sl] > 0
        if real.any():
            k_lo[k, 0] = tri_lo[sl][real].min(axis=0)
            k_hi[k, 0] = tri_hi[sl][real].max(axis=0)
            k_any[k, 0, 0] = 1.0
    if k_any.any():
        b_lo = k_lo[k_any[:, 0, 0] > 0, 0].min(axis=0)
        b_hi = k_hi[k_any[:, 0, 0] > 0, 0].max(axis=0)
    else:
        b_lo = np.zeros(d, np.float32)
        b_hi = np.zeros(d, np.float32)
    return dict(gt=gt, ci=ci, k_lo=k_lo, k_hi=k_hi, k_any=k_any,
                b_lo=b_lo, b_hi=b_hi)


def shared_rows(gt, ci, origin, d):
    """Per-triangle rows for SHARED-ORIGIN rays (one camera origin for a
    whole primary-ray frame): row 0 is the t numerator ``ci[0] - o.n_0``
    and row i the edge bound ``ci[i] - o.n_i``.  The origin dot products
    accumulate coordinate-by-coordinate in the same order as the per-ray
    kernels, so hoisting them out of the (ray x triangle) inner loop is
    bit-exact — it just computes each per-triangle value once per frame
    instead of once per ray (roughly half the hot-loop FLOPs)."""
    T = gt.shape[1]
    rows = []
    for p in range(d):
        acc = jnp.zeros((T,), f32)
        for c in range(d):
            acc = acc + origin[c] * gt[p * d + c, :]
        rows.append(ci[p, :] - acc)
    return jnp.stack(rows, axis=0)  # (d, T)


def _nearest_kernel(d, nj, shared, o_ref, dir_ref, skip_ref, init_t_ref,
                    gt_ref, ci_ref, lo_ref, hi_ref, any_ref, out_t_ref,
                    out_id_ref, best_t, best_id):
    j = pl.program_id(1)
    jc = j

    @pl.when(j == 0)
    def _():
        # nothing can hit beyond the scene AABB exit; rays missing the
        # scene start at 0, so with front-to-back chunk order whole blocks
        # skip once every ray's cutoff is passed
        best_t[:] = init_t_ref[:]
        best_id[:] = jnp.full_like(best_id, -1)

    o_b = o_ref[:]          # (RAY_BLOCK, d)
    d_b = dir_ref[:]        # (RAY_BLOCK, d)

    # conservative slab test of this tri block's AABB against the ray block
    lo = lo_ref[0, 0, :]    # (d,)
    hi = hi_ref[0, 0, :]
    tn = jnp.full((RAY_BLOCK, 1), -BIG, f32)
    tf = jnp.full((RAY_BLOCK, 1), BIG, f32)
    for c in range(d):
        dc_ = d_b[:, c:c + 1]
        oc = o_b[:, c:c + 1]
        t0, t1 = _safe_slab(oc, dc_, lo[c], hi[c])
        tn = jnp.maximum(tn, t0)
        tf = jnp.minimum(tf, t1)
    entry = jnp.maximum(tn, 0.0)
    box_hit = (tf >= entry) & (tf >= 0)
    entry = jnp.where(box_hit, entry, INF)

    run = (any_ref[0, 0, 0] != 0) & jnp.any(entry < best_t[:])

    @pl.when(run)
    def _():
        # plane dots streamed per plane — only one O/D pair live at a time
        # (keeping all d pairs in VMEM spills at 512x512 tiles).  In shared
        # mode ci_ref carries the precomputed shared_rows, so only the
        # direction dots remain per pair.
        def plane_dots(p):
            accO = None if shared else jnp.zeros((RAY_BLOCK, TRI_BLOCK), f32)
            accD = jnp.zeros((RAY_BLOCK, TRI_BLOCK), f32)
            for c in range(d):
                row = gt_ref[p * d + c, :][None, :]       # (1, TRI_BLOCK)
                if not shared:
                    accO += o_b[:, c:c + 1] * row
                accD += d_b[:, c:c + 1] * row
            return accO, accD

        O0, denom = plane_dots(0)
        if shared:
            t = ci_ref[0, :][None, :] / denom             # row 0 = -dc - O0
        else:
            t = (ci_ref[0, :][None, :] - O0) / denom      # ci[0] = -dc
        valid = (denom != 0) & (t > 0)

        tot = jnp.zeros((RAY_BLOCK, TRI_BLOCK), f32)
        for i in range(1, d):
            Oi, Di = plane_dots(i)
            if shared:
                a = ci_ref[i, :][None, :] - t * Di
            else:
                a = ci_ref[i, :][None, :] - Oi - t * Di
            valid &= (a >= -ROUNDING_FUZZ) & (a <= 1 + ROUNDING_FUZZ)
            tot += a
        valid &= tot <= 1 + ROUNDING_FUZZ

        ids = (jc * TRI_BLOCK
               + jax.lax.broadcasted_iota(jnp.int32, (RAY_BLOCK, TRI_BLOCK), 1))
        valid &= ids != skip_ref[:]

        tm = jnp.where(valid, t, INF)
        ct = jnp.min(tm, axis=1, keepdims=True)           # (RAY_BLOCK, 1)
        carg = jnp.argmin(tm, axis=1).astype(jnp.int32)[:, None]
        cid = jc * TRI_BLOCK + carg
        upd = ct < best_t[:]
        best_t[:] = jnp.where(upd, ct, best_t[:])
        best_id[:] = jnp.where(upd, cid, best_id[:])

    @pl.when(j == nj - 1)
    def _():
        out_t_ref[:] = best_t[:]
        out_id_ref[:] = best_id[:]



BIG = np.float32(3e37)


def _safe_slab(o, dirs, lo, hi):
    """NaN-safe per-axis slab intervals; parallel axes map to
    (-BIG, BIG) when inside the slab and (BIG, -BIG) when outside."""
    inv = jnp.where(dirs != 0, 1.0 / jnp.where(dirs != 0, dirs, 1.0), 0.0)
    a = (lo - o) * inv
    b = (hi - o) * inv
    par = dirs == 0
    inside = (o >= lo) & (o <= hi)
    t0 = jnp.where(par, jnp.where(inside, -BIG, BIG), jnp.minimum(a, b))
    t1 = jnp.where(par, jnp.where(inside, BIG, -BIG), jnp.maximum(a, b))
    return t0, t1


def _scene_exit(o, dirs, b_lo, b_hi):
    """Exit distance of each ray from the pool AABB (0 when missed):
    an upper bound on any triangle hit, used as the nearest-hit cutoff."""
    t0, t1 = _safe_slab(o, dirs, b_lo[None, :], b_hi[None, :])
    tn = jnp.max(t0, axis=-1)
    tf = jnp.min(t1, axis=-1)
    hit = (tf >= jnp.maximum(tn, 0.0)) & (tf >= 0)
    return jnp.where(hit, tf * (1 + 16 * ROUNDING_FUZZ), 0.0)


# Note: a front-to-back chunk permutation via PrefetchScalarGridSpec was
# measured and reverted — the data-dependent block DMA defeated Mosaic's
# input double-buffering and cost ~25% end-to-end.  The scene-exit cutoff
# (init_t) keeps the main benefit: background ray blocks skip every chunk.


@partial(jax.jit, static_argnames=("d",))
def nearest_hit(kern, o, dirs, skip, d, sh=None):
    """Nearest opaque hit over the whole pool.  Returns (t, local_id):
    t=inf / id=-1 for misses.  ``skip`` is a LOCAL pool index (or -1).

    ``sh`` (from shared_rows) enables the shared-origin fast path for
    primary rays: the per-triangle origin dots are precomputed per frame,
    bit-identical to the per-ray path."""
    R = o.shape[0]
    T = kern["gt"].shape[1]
    ni = R // RAY_BLOCK
    nj = T // TRI_BLOCK

    init_t = _scene_exit(o, dirs, kern["b_lo"], kern["b_hi"])
    ci = kern["ci"] if sh is None else sh

    out_t, out_id = pl.pallas_call(
        partial(_nearest_kernel, d, nj, sh is not None),
        grid=(ni, nj),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d * d, TRI_BLOCK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, TRI_BLOCK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((RAY_BLOCK, 1), jnp.float32),
            pltpu.VMEM((RAY_BLOCK, 1), jnp.int32),
        ],
    )(o, dirs, skip[:, None], init_t[:, None], kern["gt"], ci,
      kern["k_lo"], kern["k_hi"], kern["k_any"])
    return out_t[:, 0], out_id[:, 0]


def _occlusion_kernel(d, nj, o_ref, dir_ref, skip_ref, ldist_ref,
                      gt_ref, ci_ref, lo_ref, hi_ref, any_ref, out_ref,
                      blocked):
    j = pl.program_id(1)
    jc = j

    @pl.when(j == 0)
    def _():
        blocked[:] = jnp.zeros_like(blocked)

    o_b = o_ref[:]
    d_b = dir_ref[:]
    ldist = ldist_ref[:]

    lo = lo_ref[0, 0, :]
    hi = hi_ref[0, 0, :]
    tn = jnp.full((RAY_BLOCK, 1), -BIG, f32)
    tf = jnp.full((RAY_BLOCK, 1), BIG, f32)
    for c in range(d):
        dc_ = d_b[:, c:c + 1]
        oc = o_b[:, c:c + 1]
        t0, t1 = _safe_slab(oc, dc_, lo[c], hi[c])
        tn = jnp.maximum(tn, t0)
        tf = jnp.minimum(tf, t1)
    entry = jnp.maximum(tn, 0.0)
    box_hit = (tf >= entry) & (tf >= 0)
    entry = jnp.where(box_hit, entry, INF)

    run = (any_ref[0, 0, 0] != 0) & jnp.any((entry < ldist) & (blocked[:] == 0))

    @pl.when(run)
    def _():
        def plane_dots(p):
            accO = jnp.zeros((RAY_BLOCK, TRI_BLOCK), f32)
            accD = jnp.zeros((RAY_BLOCK, TRI_BLOCK), f32)
            for c in range(d):
                row = gt_ref[p * d + c, :][None, :]
                accO += o_b[:, c:c + 1] * row
                accD += d_b[:, c:c + 1] * row
            return accO, accD

        O0, denom = plane_dots(0)
        t = (ci_ref[0, :][None, :] - O0) / denom
        valid = (denom != 0) & (t > 0) & (t < ldist)

        tot = jnp.zeros((RAY_BLOCK, TRI_BLOCK), f32)
        for i in range(1, d):
            Oi, Di = plane_dots(i)
            a = ci_ref[i, :][None, :] - Oi - t * Di
            valid &= (a >= -ROUNDING_FUZZ) & (a <= 1 + ROUNDING_FUZZ)
            tot += a
        valid &= tot <= 1 + ROUNDING_FUZZ

        ids = (jc * TRI_BLOCK
               + jax.lax.broadcasted_iota(jnp.int32, (RAY_BLOCK, TRI_BLOCK), 1))
        valid &= ids != skip_ref[:]

        hit = jnp.any(valid, axis=1, keepdims=True)
        blocked[:] = jnp.where(hit, jnp.ones_like(blocked), blocked[:])

    @pl.when(j == nj - 1)
    def _():
        out_ref[:] = blocked[:]


@partial(jax.jit, static_argnames=("d",))
def occluded(kern, o, dirs, ldist, skip, d):
    """Any-hit within distance (opaque pool).  Returns (R,) bool."""
    R = o.shape[0]
    T = kern["gt"].shape[1]
    ni = R // RAY_BLOCK
    nj = T // TRI_BLOCK

    out = pl.pallas_call(
        partial(_occlusion_kernel, d, nj),
        grid=(ni, nj),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d * d, TRI_BLOCK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, TRI_BLOCK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RAY_BLOCK, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((RAY_BLOCK, 1), jnp.int32)],
    )(o, dirs, skip[:, None], ldist[:, None], kern["gt"], kern["ci"],
      kern["k_lo"], kern["k_hi"], kern["k_any"])
    return out[:, 0] != 0
