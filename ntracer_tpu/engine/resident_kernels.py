"""Pallas TPU kernels with the whole triangle pool resident in VMEM.

The round-1 kernels (pallas_kernels.py) stream TRI_BLOCK chunks HBM->VMEM
on a static (ray, chunk) grid: every chunk's DMA happens for every ray
block even when ``pl.when`` skips its compute, and chunks are visited in
pool order, so the per-ray nearest-hit cutoff tightens late.  This module
is the TPU-native analogue of the reference's near/far-ordered k-d
traversal with t-clipping (tracer.hpp:1179-1243):

  * the whole pool lives in VMEM for the duration of a ray block (pools up
    to a few MB — every benchmark scene and typical OBJ meshes; larger
    pools fall back to the streaming kernels),
  * chunks are visited front-to-back via a per-frame permutation sorted
    by distance from the shared ray origin — data-dependent *VMEM
    addressing*, not block DMA, so it cannot defeat input
    double-buffering (the round-1 regression),
  * every chunk's min-over-rays entry bound is precomputed in ONE
    lane-parallel pass (``_entry_min_all``), and the walk jumps straight
    between candidate chunks via packed masked reduces (``find4``/
    ``find_cands``: 4 positions, 2 per extracted scalar).  Tighter
    per-ray/per-group bounds were measured to cut <0.1% of visits on the
    flagship (coherent tiles make the block bound effectively tight) at
    equal-or-higher iteration cost, so the cheap block bound stays.  These walks
    are bound by per-iteration vector→scalar syncs (~3 us each; kernel
    time was FLAT across an 8x pair-test sweep until the syncs were
    batched), NOT by pair-test FLOPs — see CLAUDE.md,
  * for primary rays (one shared camera origin per frame) the origin dot
    products and edge bounds are hoisted to per-triangle rows computed
    once per frame (``shared_rows*``) — bit-exact, half the hot-loop
    FLOPs,
  * plane dot products accumulate coordinate-by-coordinate on the VPU in
    the same order as the scalar oracle (an MXU f32 matmul — even at
    Precision.HIGHEST — rounds differently and flips ~0.2% of
    ROUNDING_FUZZ-edge hits; measured, so the MXU stays off this path).

Chunk size CK is a compile-time parameter: smaller chunks give tighter
AABBs (more culling) at more per-chunk fixed cost (128 measured best;
256's 2-vreg lane layout is pathological in Mosaic).  Per-ray-block
visited-chunk counts are returned for instrumentation (the analogue of
instrumentation.hpp:4-53).  The ``dmin`` wrapper arguments are retained
for call compatibility but the emin candidate scan subsumes them.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32

def _env_ray_block():
    """Rays per walk block (one kernel grid step walks one block).
    Default 512 (a 32x16-px tile).  NTRACER_RAY_BLOCK overrides for
    hardware sweeps — walk_sim models ~8% trace win at 1024 (pair work
    +4.6%, visits halve, per-visit fixed cost amortizes); must divide
    the 32768-ray dispatch tile and be a multiple of the 32-px tile
    width."""
    import os
    v = os.environ.get("NTRACER_RAY_BLOCK")
    if not v:
        return 512
    try:
        rb = int(v)
    except ValueError:
        import warnings
        warnings.warn(f"NTRACER_RAY_BLOCK={v!r} is not an integer; "
                      "using 512")
        return 512
    if rb < 256 or rb > 4096 or 32768 % rb or rb % 32:
        import warnings
        warnings.warn(f"NTRACER_RAY_BLOCK={rb} unsupported (need a "
                      "divisor of 32768, multiple of 32, in [256, 4096])"
                      "; using 512")
        return 512
    return rb


RAY_BLOCK = _env_ray_block()
CK = 128          # triangles per chunk (lane dimension), default
C_PAD = 8         # coordinate rows padded to the f32 sublane tile

ROUNDING_FUZZ = np.float32(np.finfo(np.float32).eps * 10)
INF = np.float32(np.inf)
BIG = np.float32(3e37)

def _env_bytes(name, default):
    import os
    v = os.environ.get(name)
    if not v:
        return default
    try:
        return int(float(v) * 1024 * 1024)  # value in MiB
    except ValueError:
        import warnings
        warnings.warn(f"{name}={v!r} is not a number (MiB); ignoring")
        return default


# Mosaic scoped-vmem limit for the walk kernels (None = Mosaic's ~16 MiB
# default).  v5e has 128 MiB of VMEM per core; raising the limit admits
# larger resident pools and more sub-blocks per grid step.  Override (in
# MiB) with NTRACER_VMEM_LIMIT for hardware sweeps.
VMEM_LIMIT_BYTES = _env_bytes("NTRACER_VMEM_LIMIT", None)

# VMEM budget for the resident pool (bytes); leaves room for the
# (RAY_BLOCK, CK) slabs and Mosaic's working set out of the scoped-vmem
# limit.  Override (in MiB) with NTRACER_POOL_VMEM.
#
# Default 48 MiB (round 4): v5e has 128 MiB VMEM/core and a resident pool
# only has to share it with the walk stack (~7 MiB at SB=2) and ray slabs.
# The 100k-tri mesh (12.8 MiB pool) measured 1.68x faster resident than
# HBM-streaming (253 vs 425 ms trace, same window — scripts/
# mesh_resident_ab.py); the old 8 MiB budget was an artifact of Mosaic's
# ~16 MiB default scoped-vmem limit, which _cparams now raises to fit the
# actual layouts.
POOL_VMEM_BUDGET = _env_bytes("NTRACER_POOL_VMEM", 48 * 1024 * 1024)


def _cparams(pool_bytes=0, stack_bytes=0):
    """Shared Pallas compiler params for every walk kernel.

    ``pool_bytes`` is the VMEM-resident pool footprint the call ships
    (``_pool_bytes``).  Small pools keep Mosaic's ~16 MiB default limit
    (byte-identical to rounds 1-3); larger ones get a limit derived from
    the actual layout plus room for the walk stack and ray slabs.
    ``stack_bytes`` adds headroom for kernels whose unrolled sub-block
    stacks exceed the default limit's ~10 MiB of stack (the SB=8
    occlusion walks: ~3.6 MB/walk measured from Mosaic's own OOM
    report).  An explicit NTRACER_VMEM_LIMIT always wins."""
    from jax.experimental.pallas import tpu as pltpu
    limit = VMEM_LIMIT_BYTES
    if limit is None and (pool_bytes > 8 * 1024 * 1024
                          or stack_bytes > 9 * 1024 * 1024):
        limit = min(pool_bytes + stack_bytes + 24 * 1024 * 1024,
                    110 * 1024 * 1024)
    return pltpu.CompilerParams(vmem_limit_bytes=limit)


def _occ_stack_bytes(sb):
    """Scoped-vmem stack headroom for ``sb`` unrolled occlusion walks."""
    return int(sb * 3.8e6 * RAY_BLOCK / 512)


def _step_live(blive_ref, SB):
    """OR of this grid step's ``SB`` per-block liveness flags (SMEM scalar
    reads — no vector->scalar sync).

    Why this exists: a pl.when region whose body contains the pair-test
    walk costs ~3.5 us per SUB-BLOCK even when its predicate is FALSE —
    the region's scoped-vmem frame setup is emitted unconditionally
    (measured, scripts/occl_floor_probe.py: an all-dead occluded() call
    runs 9.8 ms at 2048 blocks; with the walk regions nested under one
    per-STEP predicate it runs 2.4 ms, the bare grid/IO floor; trivial
    bodies, loads, while_loops and vector->scalar reduces under the same
    dead pl.when all measure FREE, so it is specifically the big walk
    body's frame).  Nesting the per-sub-block regions under this
    step-level test makes all-dead grid steps cost one scalar branch,
    which is what makes block-sparse shadow batches cheap."""
    base = pl.program_id(0) * SB
    live = blive_ref[base]
    for sb in range(1, SB):
        live = live | blive_ref[base + sb]
    return live != 0


def _occ_sub_blocks(ni, pool_bytes=0):
    """SB for the occlusion kernels: shadow batches are block-sparse
    (per-block liveness flags skip the walk body), so dead grid steps
    dominate lit scenes — default to 8 walks per step and raise the
    scoped-vmem limit to fit the unrolled stacks (_occ_stack_bytes).
    Clamped so pool + stacks + headroom fit the _cparams ceiling (at
    RAY_BLOCK=1024 a 48 MB pool + 8 unrolled ~7.6 MB stacks would
    exceed it and Mosaic OOMs at compile time; RAY_BLOCK=512 configs
    keep SB=8 unchanged).  NTRACER_OCC_SB overrides for hardware
    sweeps (NTRACER_SB drives the nearest-walk kernels, a separate
    axis)."""
    import os
    cap = VMEM_LIMIT_BYTES or 110 * 1024 * 1024
    sb_max = 8
    while sb_max > 1 and (pool_bytes + _occ_stack_bytes(sb_max)
                          + 24 * 1024 * 1024) > cap:
        sb_max -= 1
    env = os.environ.get("NTRACER_OCC_SB")
    try:
        sb = max(1, min(sb_max, int(env))) if env else sb_max
    except ValueError:
        sb = sb_max
    while sb > 1 and ni % sb:
        sb -= 1
    return sb


def _pool_bytes(res):
    """Bytes of the resident pool layouts (gt/ci/ids and, for transparent
    pools, opa) a walk invocation ships to VMEM."""
    n = res["gt"].size + res["ci"].size + res["ids"].size
    if "opa" in res:
        n += res["opa"].size
    return n * 4

# The packed candidate walks encode chunk positions in 14 bits; pools with
# more chunks than this must not use them (callers fall back to the
# chunked XLA scan — see wavefront.get_device_scene).
MAX_CHUNKS = (1 << 14) - 1


def _check_nc(nc):
    if nc >= MAX_CHUNKS:
        raise ValueError(
            f"pool has {nc} chunks >= {MAX_CHUNKS}: the packed candidate "
            "walks encode chunk positions in 14 bits; prepare fewer, "
            "larger chunks or use the chunked XLA path")


def _interpret():
    return jax.default_backend() != "tpu"


def _sub_blocks(ni):
    """Independent RAY_BLOCK walks per grid step: each step costs
    ~2.4-3.5 us of fixed overhead, so batching amortizes it.  Mosaic
    stack-allocates the unrolled walks' temporaries separately (~3.5 MB
    per 512-ray NEAREST walk; 8x512 blew the 16 MB scoped-vmem limit at
    28.5 MB), so the count is bounded by a VMEM budget.  (The occlusion
    kernels use the separate ``_occ_sub_blocks`` — their walks carry a
    smaller stack and default to SB=8.)  NTRACER_SB overrides for
    hardware sweeps."""
    import os
    per_walk = max(1, int(3.5e6 * RAY_BLOCK / 512))
    # stack budget = scoped-vmem limit minus room for the pool layouts and
    # ray slabs (the default ~16 MiB limit leaves ~10 MiB of stack —
    # preserves the measured SB=2 default at RAY_BLOCK=512)
    limit = VMEM_LIMIT_BYTES or 16 * 1024 * 1024
    stack_budget = limit - 6 * 1024 * 1024
    sb_max = max(1, min(8, stack_budget // per_walk))
    env = os.environ.get("NTRACER_SB")
    if env:
        # hardware-sweep override: clamp to the VMEM-budget maximum (a
        # larger value is a known scoped-vmem overflow -> opaque Mosaic
        # compile failure) and survive junk values (ADVICE-r3 #4)
        try:
            sb = max(1, int(env))
        except ValueError:
            import warnings
            warnings.warn(f"NTRACER_SB={env!r} is not an integer; ignoring")
            sb = sb_max
        if sb > sb_max:
            import warnings
            warnings.warn(
                f"NTRACER_SB={sb} exceeds the scoped-vmem budget maximum "
                f"{sb_max}; clamping")
            sb = sb_max
    else:
        sb = sb_max
    while sb > 1 and ni % sb:
        sb -= 1
    return sb


def _pad8(n):
    return -(-n // 8) * 8


def pool_vmem_bytes(n_tris: int, d: int, ck: int = CK) -> int:
    """Physical VMEM footprint of the resident layouts (sublane-padded)."""
    nc = -(-n_tris // ck)
    return nc * (_pad8(d * d) * ck + 2 * C_PAD * ck) * 4


def payload_width(d):
    """Lane width of the in-kernel hit payload rows
    [fn(d), mat, gid, 0-pad] (gid/mat ride as f32, exact below 2^24)."""
    return _pad8(d + 2)


def prepare_resident(tri_p1, tri_fn, tri_en, tri_dc, tri_lo, tri_hi, d,
                     ck: int = CK, tri_mat=None):
    """Host-side resident layouts (once per scene).

    Returns numpy arrays:
      ``gt``   (nc, pad8(d*d), ck) — plane rows, plane-major: row p*d+c =
               coordinate c of plane p's normal (plane 0 = face normal);
               pad rows zero.
      ``ci``   (nc, 8, ck)  — row 0 = -dc (plane offset), rows 1..d-1 =
               edge offsets e_i . p1, rest zero.
      ``klo``/``khi`` (nc, d) — chunk AABBs; empty chunks inverted
               (+BIG/-BIG) so slab tests miss.
      ``b_lo``/``b_hi`` (d,) — pool AABB (nearest-hit cutoff).
      ``n_eff`` (1,) i32 — number of non-empty chunks under ``base_order``.
      ``base_order`` (nc,) int32 — identity order with empty chunks last.
    """
    T = tri_p1.shape[0]
    assert T % ck == 0
    nc = T // ck
    planes = np.concatenate([tri_fn[:, None, :], tri_en], axis=1)  # (T,d,d)
    pr = _pad8(d * d)
    gt = np.zeros((nc, pr, ck), np.float32)
    # gt[k, p*d + c, t] = planes[k*ck + t, p, c]
    pk = planes.reshape(nc, ck, d, d).transpose(0, 2, 3, 1)  # (nc,p,c,t)
    gt[:, :d * d, :] = pk.reshape(nc, d * d, ck)

    ci = np.zeros((nc, C_PAD, ck), np.float32)
    ci[:, 0, :] = -tri_dc.reshape(nc, ck)
    eo = np.einsum("tid,td->ti", tri_en, tri_p1,
                   dtype=np.float32)                      # (T, d-1)
    ci[:, 1:d, :] = eo.reshape(nc, ck, d - 1).transpose(0, 2, 1)

    klo = np.full((nc, d), BIG, np.float32)
    khi = np.full((nc, d), -BIG, np.float32)
    fn_norm = np.linalg.norm(tri_fn, axis=1)
    nonempty = np.zeros(nc, bool)
    for k in range(nc):
        sl = slice(k * ck, (k + 1) * ck)
        real = fn_norm[sl] > 0
        if real.any():
            klo[k] = tri_lo[sl][real].min(axis=0)
            khi[k] = tri_hi[sl][real].max(axis=0)
            nonempty[k] = True
    if nonempty.any():
        b_lo = klo[nonempty].min(axis=0)
        b_hi = khi[nonempty].max(axis=0)
    else:
        b_lo = np.zeros(d, np.float32)
        b_hi = np.zeros(d, np.float32)
    base_order = np.argsort(~nonempty, kind="stable").astype(np.int32)
    # ids are (nc, 8, ck) with the pool id in row 0 (a 1-sublane layout
    # mis-reads under dynamic chunk indexing on real TPUs: sublane-padded
    # tiles, so keep the leading slice tile-aligned) and the material id
    # in row 1 (read by the in-kernel payload epilogue)
    ids = np.zeros((nc, C_PAD, ck), np.int32)
    ids[:, 0, :] = np.arange(T, dtype=np.int32).reshape(nc, ck)
    if tri_mat is not None:
        ids[:, 1, :] = np.asarray(tri_mat, np.int32).reshape(nc, ck)
    return dict(gt=gt, ci=ci, ids=ids, klo=klo, khi=khi, b_lo=b_lo,
                b_hi=b_hi, n_eff=np.asarray([int(nonempty.sum())], np.int32),
                base_order=base_order)


def add_opacity(res, tri_opacity, ck: int = CK):
    """Attach a per-slot opacity row (transparent-pool kernels); padding
    slots get opacity 1 (their zero face normal already kills hits)."""
    ids = res["ids"][:, 0, :]
    safe = np.clip(ids, 0, len(tri_opacity) - 1)
    opa = np.ones((ids.shape[0], C_PAD, ck), np.float32)
    opa[:, 0, :] = np.where(ids >= 0, tri_opacity[safe], 1.0)
    res["opa"] = opa
    return res


def prepare_resident_cells(treelets, tri_p1, tri_fn, tri_en, tri_dc,
                           tri_lo, tri_hi, d, ck: int = CK, tri_mat=None):
    """Resident layouts from k-d treelets (see flatten.kd_treelets): one
    chunk per treelet, chunk AABB = content box CLIPPED to the treelet's
    disjoint cell, ``ids`` mapping slots back to dedup'd pool ids (a
    primitive duplicated across cells keeps one id, so skip tests and
    nearest-hit winners behave as a single primitive).

    Same return layout as prepare_resident."""
    nc = len(treelets)
    pr = _pad8(d * d)
    gt = np.zeros((nc, pr, ck), np.float32)
    ci = np.zeros((nc, C_PAD, ck), np.float32)
    ids = np.full((nc, C_PAD, ck), -2, np.int32)  # -2 never matches a skip
    klo = np.full((max(nc, 1), d), BIG, np.float32)
    khi = np.full((max(nc, 1), d), -BIG, np.float32)

    planes = np.concatenate([tri_fn[:, None, :], tri_en], axis=1)  # (T,d,d)
    eo = np.einsum("tid,td->ti", tri_en, tri_p1, dtype=np.float32)

    for k, (cl, ch, pids) in enumerate(treelets):
        pids = np.asarray(pids, np.int64)
        n = len(pids)
        # gt[k, p*d + c, s] = planes[pids[s], p, c]
        gt[k, :d * d, :n] = planes[pids].reshape(n, d * d).T
        ci[k, 0, :n] = -tri_dc[pids]
        ci[k, 1:d, :n] = eo[pids].T
        ids[k, 0, :n] = pids
        if tri_mat is not None:
            ids[k, 1, :n] = np.asarray(tri_mat, np.int32)[pids]
        klo[k] = np.maximum(tri_lo[pids].min(axis=0), cl)
        khi[k] = np.minimum(tri_hi[pids].max(axis=0), ch)

    fn_norm = np.linalg.norm(tri_fn, axis=1)
    real = fn_norm > 0
    if real.any():
        b_lo = tri_lo[real].min(axis=0)
        b_hi = tri_hi[real].max(axis=0)
    else:
        b_lo = np.zeros(d, np.float32)
        b_hi = np.zeros(d, np.float32)
    return dict(gt=gt, ci=ci, ids=ids, klo=klo, khi=khi, b_lo=b_lo,
                b_hi=b_hi, n_eff=np.asarray([nc], np.int32),
                base_order=np.arange(max(nc, 1), dtype=np.int32))


def centroid_bins(tri_lo, tri_hi, fn_norm, ck: int):
    """Partition real triangles (non-degenerate AABBs) into spatial bins of
    <= ck by recursive median split on the widest centroid axis.  Unlike
    k-d treelets, every triangle lands in exactly ONE bin (no duplication);
    bin boxes are the exact union of member AABBs, so they are disjoint up
    to triangle extent — tight enough for front-to-back pruning on real
    meshes where triangles are small.

    Returns a list of (lo, hi, [pool ids]) compatible with
    prepare_resident_cells (the clip box is the content box itself)."""
    ids_all = np.nonzero(fn_norm > 0)[0]
    if len(ids_all) == 0:
        return []
    cent = (tri_lo + tri_hi) * 0.5
    out = []

    def rec(ids):
        if len(ids) <= ck:
            lo = tri_lo[ids].min(axis=0)
            hi = tri_hi[ids].max(axis=0)
            out.append((lo, hi, list(ids)))
            return
        c = cent[ids]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        order = np.argsort(c[:, axis], kind="stable")
        h = len(ids) // 2
        rec(ids[order[:h]])
        rec(ids[order[h:]])

    # primitives whose box spans a large fraction of the scene (sliver
    # batches, walls) would drag any spatial bin's box out to near-global
    # and destroy the culling; give them dedicated always-visited bins
    diag = np.linalg.norm(tri_hi[ids_all] - tri_lo[ids_all], axis=1)
    scene_diag = np.linalg.norm(tri_hi[ids_all].max(axis=0)
                                - tri_lo[ids_all].min(axis=0))
    wide = diag > 0.35 * max(scene_diag, 1e-30)
    for s in range(0, int(wide.sum()), ck):
        ids = ids_all[wide][s:s + ck]
        out.append((tri_lo[ids].min(axis=0), tri_hi[ids].max(axis=0),
                    list(ids)))
    narrow = ids_all[~wide]
    if len(narrow):
        rec(narrow)
    return out


def chunk_order(klo, khi, origin):
    """Front-to-back chunk permutation + per-position lower bounds.

    ``origin`` (d,) is the shared ray origin (the camera for primary
    rays).  Returns (order (nc,) i32, dmin (nc,) f32) where dmin[k] is the
    exact minimum distance from ``origin`` to chunk order[k]'s AABB —
    a lower bound on any ray's entry distance, so the traversal can stop
    once every ray's best hit is nearer.  Empty chunks (inverted AABBs)
    sort last with dmin=BIG."""
    span_ok = klo <= khi                       # (nc, d) False for empties
    cl = jnp.minimum(klo, khi)
    ch = jnp.maximum(klo, khi)
    p = jnp.clip(origin[None, :], cl, ch)
    dv = jnp.where(span_ok, p - origin[None, :], 0.0)
    dist = jnp.sqrt(jnp.sum(dv * dv, axis=1))
    dist = jnp.where(jnp.all(span_ok, axis=1), dist, BIG)
    order = jnp.argsort(dist).astype(jnp.int32)
    return order, jnp.sort(dist)


def _scene_exit(o, dirs, b_lo, b_hi):
    """Exit distance of each ray from the pool AABB (0 when missed).

    Row-layout (R, d) form, kept for the scalar-ish callers/tests; the
    hot paths use the bit-identical lane-major twin below (XLA-TPU runs
    (R, small-k) elementwise chains 5-12x above bandwidth, and feeding
    this from the transposed pipeline forces a (R, d) re-tiling — the
    6-D lit scene's global-light clamp alone measured 8.85 ms this way
    vs ~0.3 ms lane-major, scripts/shadow_shade_split.py)."""
    inv = jnp.where(dirs != 0, 1.0 / jnp.where(dirs != 0, dirs, 1.0), 0.0)
    a = (b_lo[None, :] - o) * inv
    b = (b_hi[None, :] - o) * inv
    par = dirs == 0
    inside = (o >= b_lo[None, :]) & (o <= b_hi[None, :])
    t0 = jnp.where(par, jnp.where(inside, -BIG, BIG), jnp.minimum(a, b))
    t1 = jnp.where(par, jnp.where(inside, BIG, -BIG), jnp.maximum(a, b))
    tn = jnp.max(t0, axis=-1)
    tf = jnp.min(t1, axis=-1)
    hit = (tf >= jnp.maximum(tn, 0.0)) & (tf >= 0)
    return jnp.where(hit, tf * (1 + 16 * ROUNDING_FUZZ), 0.0)


def _scene_exit_T(oT, dT, b_lo, b_hi):
    """Lane-major (d, R) twin of ``_scene_exit`` — bit-identical by
    construction: the elementwise ops are unchanged and the d-axis
    min/max reductions are rounding-free in any order.  Callers pass
    ``o.T``/``dirs.T`` so transposed-pipeline (d, R) tensors reach it
    with zero relayout (x.T.T cancels in XLA)."""
    inv = jnp.where(dT != 0, 1.0 / jnp.where(dT != 0, dT, 1.0), 0.0)
    a = (b_lo[:, None] - oT) * inv
    b = (b_hi[:, None] - oT) * inv
    par = dT == 0
    inside = (oT >= b_lo[:, None]) & (oT <= b_hi[:, None])
    t0 = jnp.where(par, jnp.where(inside, -BIG, BIG), jnp.minimum(a, b))
    t1 = jnp.where(par, jnp.where(inside, BIG, -BIG), jnp.maximum(a, b))
    tn = jnp.max(t0, axis=0)
    tf = jnp.min(t1, axis=0)
    hit = (tf >= jnp.maximum(tn, 0.0)) & (tf >= 0)
    return jnp.where(hit, tf * (1 + 16 * ROUNDING_FUZZ), 0.0)


def shared_rows_res(gt, ci, origin, d):
    """Shared-origin per-slot rows for the resident layouts (the analogue
    of pallas_kernels.shared_rows): ``sh[k, p, s] = ci[k, p, s] - o.n_p``
    with the origin dots accumulated coordinate-by-coordinate — the same
    float ops as the per-ray kernel, computed once per frame instead of
    once per (ray, slot) pair.  Returns (nc, C_PAD, ck)."""
    nc, pr, ck = gt.shape
    rows = []
    for p in range(d):
        acc = jnp.zeros((nc, ck), f32)
        for c in range(d):
            acc = acc + origin[c] * gt[:, p * d + c, :]
        rows.append(ci[:, p, :] - acc)
    sh = jnp.stack(rows, axis=1)
    return jnp.concatenate(
        [sh, jnp.zeros((nc, C_PAD - d, ck), f32)], axis=1)


def _chunk_hits(d, ck, shared, gt_ref, ci_ref, ids_ref, idx, o8, d8, skip):
    """Ray-block x chunk intersection against VMEM-resident pool refs."""
    return _chunk_hits_vals(d, ck, shared, gt_ref[idx], ci_ref[idx],
                            ids_ref[idx][0:1, :], o8, d8, skip)


def _chunk_hits_vals(d, ck, shared, g, ci, idrow, o8, d8, skip):
    """Ray-block x chunk intersection (tracer.hpp:411-440 vectorized).
    Returns (t, valid): (RAY_BLOCK, ck).  Plane dots accumulate coordinate
    by coordinate on the VPU — the same order as the scalar oracle.
    ``g`` (pad8(d*d), ck), ``ci`` (8, ck), ``idrow`` (1, ck).  When
    ``shared`` (static), ``ci`` carries the precomputed shared-origin rows
    (see shared_rows_res) and only the direction dots run per pair."""

    def dots(p):
        accO = None if shared else jnp.zeros((RAY_BLOCK, ck), f32)
        accD = jnp.zeros((RAY_BLOCK, ck), f32)
        for c in range(d):
            row = g[p * d + c][None, :]               # (1, ck)
            if not shared:
                accO += o8[:, c:c + 1] * row
            accD += d8[:, c:c + 1] * row
        return accO, accD

    O0, denom = dots(0)
    if shared:
        t = ci[0][None, :] / denom                    # row 0 = -dc - O0
    else:
        t = (ci[0][None, :] - O0) / denom             # ci[0] = -dc
    valid = (denom != 0) & (t > 0)
    tot = jnp.zeros((RAY_BLOCK, ck), f32)
    for i in range(1, d):
        Oi, Di = dots(i)
        if shared:
            a = ci[i][None, :] - t * Di
        else:
            a = ci[i][None, :] - Oi - t * Di
        valid &= (a >= -ROUNDING_FUZZ) & (a <= 1 + ROUNDING_FUZZ)
        tot += a
    valid &= tot <= 1 + ROUNDING_FUZZ

    # pool ids per slot: skip tests use dedup'd GLOBAL ids so a primitive
    # duplicated across cells behaves as one (self-hit skip still works)
    valid &= idrow != skip                            # (1, ck) vs (R, 1)
    return t, valid


def _miss_payload(pw, d):
    """Payload rows for missed rays: fn=0, mat=0, gid=-1."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (RAY_BLOCK, pw), 1)
    return jnp.where(lane == d + 1, -1.0, 0.0)


def _miss_payload_t(pw, d):
    """Transposed miss payload: (pw, RAY_BLOCK) with row d+1 = gid -1."""
    row = jax.lax.broadcasted_iota(jnp.int32, (pw, RAY_BLOCK), 0)
    return jnp.where(row == d + 1, -1.0, 0.0)


def _extract_payload(d, ck, pw, g, idr, msk):
    """One-hot extraction of the winning slot's payload row
    [fn(d), mat, gid, 0-pad] as a single (RAY_BLOCK, ck) @ (ck, pw)
    matmul — no vector->scalar sync, and ONE temporary instead of d+2
    masked reductions (the reduction form overflowed Mosaic's 16 MB
    scoped-vmem stack at d=4).  ``msk`` (RAY_BLOCK, ck) holds exactly one
    True lane per updated ray, so every output element sums exactly one
    product x*1.0 plus zeros — bit-exact at Precision.HIGHEST (f32
    passes; DEFAULT's bf16 input rounding would corrupt fn/gid)."""
    cols = [g[c][:, None] for c in range(d)]          # face-normal rows
    cols += [idr[1].astype(f32)[:, None],             # mat (f32-exact)
             idr[0].astype(f32)[:, None]]             # gid (f32-exact)
    if pw > d + 2:
        cols.append(jnp.zeros((ck, pw - d - 2), f32))
    pmat = jnp.concatenate(cols, axis=1)              # (ck, pw)
    return jax.lax.dot(msk.astype(f32), pmat,
                       precision=jax.lax.Precision.HIGHEST)


def _nearest_kernel(d, ck, shared, SB, payload, *refs):
    """Per-ray state lives in VMEM scratch mutated in place; the while
    carry holds only scalars.  (Carrying (RAY_BLOCK, 1) vectors through
    lax.while_loop + lax.cond miscompiled on real TPUs: whole ray blocks
    lost their hits while interpret mode was exact.)

    Control flow: all chunk entry lower bounds are precomputed in ONE
    lane-parallel pass (``_entry_min_all``, (1, ncp) in visit order), and
    the walk jumps straight between candidate chunks via masked reduces
    (``find4``).  A serial per-iteration entry test on (R, d)-shaped
    arrays wastes ~94% of the VPU lanes and was measured to DOMINATE the
    kernel (walk time was flat in the pair-test count); with the
    vectorized scan, skipped chunks cost nothing.

    ``SB`` independent RAY_BLOCK walks run per grid step: each grid step
    costs ~2.4-3.5 us of fixed overhead (measured with a copy-only
    kernel), so batching sub-blocks amortizes it.

    ``payload``: emit the winner's [fn(d), mat, gid] row from inside the
    walk (one-hot lane reduction per visit — no extra syncs), replacing
    the caller's ~8 ms slot-pack HBM gather (VERDICT-r3 #1)."""
    (o_ref, dir_ref, skip_ref, init_t_ref, order_ref, neff_ref, blive_ref,
     klo_t_ref, khi_t_ref, gt_ref, ci_ref, ids_ref) = refs[:12]
    if payload:
        (out_t_ref, out_id_ref, out_pay_ref, count_ref,
         best_t, best_id, best_pay) = refs[12:]
    else:
        out_t_ref, out_id_ref, count_ref, best_t, best_id = refs[12:]
        out_pay_ref = best_pay = None
    n_eff = neff_ref[0]
    # dead ray blocks (every init_t == 0: bounce rays masked inactive,
    # all-miss shadow batches) skip even the entry pass — the flag is
    # precomputed on the host side and read from SMEM, costing no
    # vector->scalar sync.  This replaces host-side compaction, whose
    # permutation gathers cost far more than the blocks they saved.
    # Boundary refs are LANE-MAJOR (see nearest_hit): dead-block inits
    # copy (1, RAY_BLOCK) slices directly, live walks transpose once.
    for sb in range(SB):
        sl = slice(sb * RAY_BLOCK, (sb + 1) * RAY_BLOCK)
        out_t_ref[0:1, sl] = init_t_ref[0:1, sl]
        out_id_ref[0:1, sl] = jnp.full((1, RAY_BLOCK), -1, jnp.int32)
        count_ref[0:1, sl] = jnp.zeros((1, RAY_BLOCK), jnp.int32)
        if out_pay_ref is not None:
            out_pay_ref[:, sl] = _miss_payload_t(out_pay_ref.shape[0], d)

    # walk regions nest under a step-level liveness test: a dead pl.when
    # region containing the walk body still pays its ~3.5 us frame setup
    # (_step_live docstring), so all-dead steps skip the whole group
    base = pl.program_id(0) * SB   # hoisted: pl.program_id cannot be
    # called inside a nested pl.when branch in interpret mode

    @pl.when(_step_live(blive_ref, SB))
    def _live_step():
        for sb in range(SB):
            _nearest_walk(d, ck, shared, sb, base, n_eff, o_ref, dir_ref,
                          skip_ref, init_t_ref, order_ref, blive_ref,
                          klo_t_ref, khi_t_ref, gt_ref, ci_ref, ids_ref,
                          out_t_ref, out_id_ref, count_ref, best_t,
                          best_id, out_pay_ref, best_pay)


def _nearest_walk(d, ck, shared, sb, base, n_eff, o_ref, dir_ref, skip_ref,
                  init_t_ref, order_ref, blive_ref, klo_t_ref, khi_t_ref,
                  gt_ref, ci_ref, ids_ref, out_t_ref, out_id_ref,
                  count_ref, best_t, best_id, out_pay_ref=None,
                  best_pay=None):
    sl = slice(sb * RAY_BLOCK, (sb + 1) * RAY_BLOCK)

    @pl.when(blive_ref[base + sb] != 0)
    def _walk():
        _nearest_walk_live(d, ck, shared, sl, n_eff, o_ref, dir_ref,
                           skip_ref, init_t_ref, order_ref, klo_t_ref,
                           khi_t_ref, gt_ref, ci_ref, ids_ref, out_t_ref,
                           out_id_ref, count_ref, best_t, best_id,
                           out_pay_ref, best_pay)


def _nearest_walk_live(d, ck, shared, sl, n_eff, o_ref, dir_ref, skip_ref,
                       init_t_ref, order_ref, klo_t_ref, khi_t_ref,
                       gt_ref, ci_ref, ids_ref, out_t_ref, out_id_ref,
                       count_ref, best_t, best_id, out_pay_ref=None,
                       best_pay=None):
    o8 = o_ref[:, sl].T           # (RAY_BLOCK, 8) zero-padded coords
    d8 = dir_ref[:, sl].T
    skip = skip_ref[0:1, sl].T

    best_t[:] = init_t_ref[0:1, sl].T
    best_id[:] = jnp.full((RAY_BLOCK, 1), -1, jnp.int32)
    if best_pay is not None:
        best_pay[:] = _miss_payload(best_pay.shape[1], d)

    # min-over-rays entry bound for EVERY chunk position, in ORDER space
    emin = _entry_min_all(d, o8, d8, klo_t_ref, khi_t_ref)   # (1, ncp)
    ncp = emin.shape[1]
    posi = jax.lax.broadcasted_iota(jnp.int32, (1, ncp), 1)

    # Every vector->scalar transfer serializes the walk (~3 us each: the
    # kernel was measured FLAT in the pair-test count with per-iteration
    # predicates).  So each iteration selects the next FOUR candidate
    # chunks with chained vector mins, packs them into TWO scalars (14
    # bits per position), and processes all four unconditionally —
    # duplicate-free by construction, tail slots masked via SENT.
    SENT = jnp.int32((1 << 14) - 1)                       # 16383

    P_CAND = 4  # candidate chunks selected per iteration (2 per scalar);
    # 8 was measured neutral-to-worse: the stale bound fetches more
    # extra chunks than the saved iterations recoup

    def find_cands(k0v):
        """Positions of the next P_CAND candidates >= k0v ((1,1) vector)
        as P_CAND/2 packed (1,1) vectors [c_odd*2^14 + c_even]; SENT
        fills."""
        bound = jnp.max(best_t[:], axis=0, keepdims=True)   # (1, 1)
        cand = (emin < bound) & (posi >= k0v) & (posi < n_eff)
        cp = jnp.where(cand, posi, SENT)
        cs = []
        for _ in range(P_CAND):
            c = jnp.min(cp, axis=1, keepdims=True)
            cs.append(c)
            cp = jnp.where(posi > c, cp, SENT)
        return tuple(cs[i] * (SENT + 1) + cs[i + 1]
                     for i in range(0, P_CAND, 2))

    def chunk_pass(kpos, live):
        """One unconditional chunk visit; ``live`` masks tail slots."""
        idx = order_ref[jnp.minimum(kpos, n_eff - 1)]
        g = gt_ref[idx]
        civ = ci_ref[idx]
        idr = ids_ref[idx]
        t, valid = _chunk_hits_vals(d, ck, shared, g, civ, idr[0:1, :],
                                    o8, d8, skip)
        tm = jnp.where(valid, t, INF)
        ct = jnp.min(tm, axis=1, keepdims=True)
        carg = jnp.argmin(tm, axis=1).astype(jnp.int32)[:, None]
        upd = (ct < best_t[:]) & live
        if best_pay is not None:
            lane = jax.lax.broadcasted_iota(jnp.int32, (RAY_BLOCK, ck), 1)
            pay = _extract_payload(d, ck, best_pay.shape[1], g, idr,
                                   lane == carg)
            best_pay[:] = jnp.where(upd, pay, best_pay[:])
        best_id[:] = jnp.where(upd, idx * ck + carg, best_id[:])
        best_t[:] = jnp.where(upd, ct, best_t[:])
        return live.astype(jnp.int32)

    def body(state):
        packed = state[:-2]
        visited = state[-1]
        last = packed[-1]
        # next candidates are scanned with the PRE-update bound (at worst
        # a few extra chunks) so the scalar extractions overlap the chunk
        # passes below
        nxt = find_cands(jnp.maximum(last % (SENT + 1),
                                     last // (SENT + 1)) + 1)
        for pv in packed:
            ka, kb = pv // (SENT + 1), pv % (SENT + 1)
            visited = visited + chunk_pass(ka, ka < SENT)
            visited = visited + chunk_pass(kb, kb < SENT)
        nv = tuple(v[0, 0] for v in nxt)
        return nv + (nv[0] // (SENT + 1) < SENT, visited)

    iv = tuple(v[0, 0]
               for v in find_cands(jnp.zeros((1, 1), jnp.int32)))
    st = jax.lax.while_loop(
        lambda s: s[-2], body,
        iv + (iv[0] // (SENT + 1) < SENT, jnp.int32(0)))
    visited = st[-1]
    out_t_ref[0:1, sl] = best_t[:].T
    out_id_ref[0:1, sl] = best_id[:].T
    if out_pay_ref is not None:
        out_pay_ref[:, sl] = best_pay[:].T
    count_ref[0:1, sl] = jnp.full((1, RAY_BLOCK), visited, jnp.int32)


@partial(jax.jit, static_argnames=("d", "payload", "raw_slot"))
def nearest_hit(res, o, dirs, skip, d, order=None, dmin=None, active=None,
                sh=None, payload=False, raw_slot=False):
    """Nearest hit over the resident pool.  Returns (t, local_id, visited):
    t=inf / id=-1 for misses; visited = chunks tested per ray block
    (instrumentation).  ``skip`` is a LOCAL pool index (or -1).

    ``order``/``dmin`` select the chunk visit order (see chunk_order);
    default is pool order with no distance bound.  ``active`` masks rays
    out entirely (their blocks exit the walk immediately when compacted
    together).  ``sh`` (from shared_rows_res) enables the bit-exact
    shared-origin fast path for primary rays.

    ``payload``: also return the winner's hit-geometry rows
    (R, payload_width(d)) = [fn(d), mat, gid, 0-pad] emitted from inside
    the kernel — (t, gid, pay, visited) — so the caller needs NO gather
    at all.  MEASURED SLOWER for the frame path than ``raw_slot`` + one
    slot_pack gather (the one-hot extraction runs per chunk visit:
    +11.7 ms/frame vs the gather's ~6.5 on the 120-cell, stage_split.py);
    kept for callers without a packed-row table and for sweeps.

    ``raw_slot``: return (t, slot, visited) with the winning SLOT index
    (chunk*ck + lane, -1 for miss) and skip the slot->gid mapping — the
    caller recovers gid + fn + mat from ONE gather of its slot-indexed
    packed rows (res_slot_pack; the round-3 production path)."""
    R = o.shape[0]
    nc, pr, ck = res["gt"].shape
    _check_nc(nc)
    ni = R // RAY_BLOCK

    if order is None:
        order = res["base_order"]
        dmin = jnp.zeros((nc,), f32)
    # lane-major twin: o.T/dirs.T cancel against the transposed
    # pipeline's (d, R) tensors (and CSE with the o8t/d8t pads)
    init_t = _scene_exit_T(o.T, dirs.T, res["b_lo"], res["b_hi"])
    if active is not None:
        init_t = jnp.where(active, init_t, 0.0)

    # lane-major boundary — (C_PAD, R) rays, (1, R) scalars, (pw, R)
    # payload: XLA's (8, 128)-tiled layout pads (R, small-k) tensors up
    # to 128 lanes (a (1M, 1) i32 occupies 512 MB) and the Mosaic custom
    # call requires DENSE operands, so the row-shaped boundary cost ~9 ms
    # of relayout PER INVOCATION (measured on an all-dead occlusion
    # call).  Live blocks transpose their slices once in VMEM instead.
    o8t = jnp.pad(o.T, ((0, C_PAD - d), (0, 0)))
    d8t = jnp.pad(dirs.T, ((0, C_PAD - d), (0, 0)))
    n_eff = jnp.asarray(res["n_eff"], jnp.int32).reshape((1,))
    ci = res["ci"] if sh is None else sh
    klo_t, khi_t = _order_boxes(res, order, d)
    ncp = klo_t.shape[1]
    blive = (jnp.max(init_t.reshape(ni, RAY_BLOCK), axis=1) > 0) \
        .astype(jnp.int32)

    SB = _sub_blocks(ni)
    ni //= SB
    RB = SB * RAY_BLOCK
    pw = payload_width(d)

    out_specs = [
        pl.BlockSpec((1, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, R), jnp.float32),
        jax.ShapeDtypeStruct((1, R), jnp.int32),
    ]
    scratch = [
        pltpu.VMEM((RAY_BLOCK, 1), jnp.float32),
        pltpu.VMEM((RAY_BLOCK, 1), jnp.int32),
    ]
    if payload:
        out_specs.append(pl.BlockSpec((pw, RB), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((pw, R), jnp.float32))
        scratch.append(pltpu.VMEM((RAY_BLOCK, pw), jnp.float32))
    out_specs.append(pl.BlockSpec((1, RB), lambda i: (0, i),
                                  memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((1, R), jnp.int32))

    outs = pl.pallas_call(
        partial(_nearest_kernel, d, ck, sh is not None, SB, payload),
        grid=(ni,),
        interpret=_interpret(),
        compiler_params=_cparams(_pool_bytes(res)),
        in_specs=[
            pl.BlockSpec((C_PAD, RB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C_PAD, RB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),      # order
            pl.BlockSpec(memory_space=pltpu.SMEM),      # n_eff
            pl.BlockSpec(memory_space=pltpu.SMEM),      # blive
            pl.BlockSpec((C_PAD, ncp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # klo_t (order space)
            pl.BlockSpec((C_PAD, ncp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # khi_t
            pl.BlockSpec((nc, pr, ck), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nc, C_PAD, ck), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nc, C_PAD, ck), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(o8t, d8t, skip[None, :], init_t[None, :], order, n_eff, blive,
      klo_t, khi_t, res["gt"], ci, res["ids"])
    if payload:
        out_t, _out_id, out_payt, counts = outs
        # the payload's gid column IS the dedup'd global pool id — no
        # slot->gid mapping gather needed
        gid = out_payt[d + 1].astype(jnp.int32)
        return out_t[0], gid, out_payt.T, counts[0, ::RAY_BLOCK]
    out_t, out_id, counts = outs
    if raw_slot:
        return out_t[0], out_id[0], counts[0, ::RAY_BLOCK]
    # kernel returns the winning SLOT; map to the dedup'd global pool id
    slot = out_id[0]
    slot_ids = res["ids"][:, 0, :].reshape(-1)
    gid = jnp.where(slot >= 0, slot_ids[jnp.clip(slot, 0, None)], -1)
    return out_t[0], gid, counts[0, ::RAY_BLOCK]


def _occ_cand():
    """Candidate chunks selected per occlusion-walk iteration
    (NTRACER_OCC_CAND; must be 1 or even for the 14-bit scalar packing).
    Each while-iteration pays one serialized vector->scalar round trip,
    so grouping amortizes it across CAND visits — at the price of a
    stale saturation bound for the group (up to 2*CAND-1 extra chunk
    visits per block at walk end, each exact no-ops: `blocked` is a
    monotone OR of per-ray ``t < ldist`` tests, so any superset of the
    necessary chunks yields the identical result).  Occlusion walks
    average ~5-6 visits/block on the reflective scene (vs ~10 for the
    nearest walk, where P_CAND=4 is the measured winner), hence the
    separate knob."""
    import os
    v = os.environ.get("NTRACER_OCC_CAND")
    if not v:
        return 4
    try:
        n = int(v)
    except ValueError:
        import warnings
        warnings.warn(f"NTRACER_OCC_CAND={v!r} is not an integer; using 4")
        return 4
    if n < 1:
        import warnings
        warnings.warn(f"NTRACER_OCC_CAND={n} must be >= 1; using 1")
        return 1
    if n != 1 and n % 2:
        import warnings
        warnings.warn(f"NTRACER_OCC_CAND={n} must be 1 or even (two "
                      f"candidates pack per scalar); using {n + 1}")
        n += 1
    return n


def _check_cand(cand):
    """Validate a candidate-group size (explicit kwarg or env default):
    the packed extraction pairs candidates two per 14-bit scalar, so
    the group must be 1 or a positive even number."""
    if cand != 1 and (cand < 1 or cand % 2):
        raise ValueError(
            f"cand={cand}: must be 1 or a positive even number "
            "(candidates pack two per 14-bit scalar)")
    return cand


def _candidate_walk(cand, emin, posi, n_eff, lmax, chunk_pass):
    """Front-to-back candidate scan shared by both occlusion walks.

    Visits every chunk position with ``emin < lmax()`` in ascending
    order.  ``cand > 1`` extracts that many candidates per
    while-iteration (two per packed 14-bit scalar) so the serialized
    vector->scalar round trip amortizes across the group; each group
    is selected with the pre-update saturation bound (the scalar
    extractions overlap the chunk passes), and the extra tail visits
    that buys are exact no-ops for both occlusion walks (see their
    in-kernel comments).  ``lmax()`` returns the (1, 1) saturation
    bound; ``chunk_pass(kpos, live)`` performs one visit and returns
    ``live`` as i32.  Returns the live-visit count."""
    if cand == 1:
        def find_next(k0):
            c = (emin < lmax()) & (posi >= k0) & (posi < n_eff)
            return jnp.min(jnp.where(c, posi, BIG_POS))

        def body(state):
            k, _, visited = state
            nxt = find_next(k + 1)
            visited += chunk_pass(k, jnp.bool_(True))
            return nxt, nxt < BIG_POS, visited

        k0 = find_next(jnp.int32(0))
        _, _, visited = jax.lax.while_loop(
            lambda s: s[1], body, (k0, k0 < BIG_POS, jnp.int32(0)))
        return visited

    SENT = jnp.int32((1 << 14) - 1)

    def find_cands(k0v):
        c = (emin < lmax()) & (posi >= k0v) & (posi < n_eff)
        cp = jnp.where(c, posi, SENT)
        cs = []
        for _ in range(cand):
            cmin = jnp.min(cp, axis=1, keepdims=True)
            cs.append(cmin)
            cp = jnp.where(posi > cmin, cp, SENT)
        return tuple(cs[i] * (SENT + 1) + cs[i + 1]
                     for i in range(0, cand, 2))

    def body(state):
        packed = state[:-2]
        visited = state[-1]
        last = packed[-1]
        # next group scanned with the pre-update bound so the scalar
        # extractions overlap the chunk passes below
        nxt = find_cands(jnp.maximum(last % (SENT + 1),
                                     last // (SENT + 1)) + 1)
        for pv in packed:
            ka, kb = pv // (SENT + 1), pv % (SENT + 1)
            visited += chunk_pass(ka, ka < SENT)
            visited += chunk_pass(kb, kb < SENT)
        nv = tuple(v[0, 0] for v in nxt)
        return nv + (nv[0] // (SENT + 1) < SENT, visited)

    iv = tuple(v[0, 0]
               for v in find_cands(jnp.zeros((1, 1), jnp.int32)))
    st = jax.lax.while_loop(
        lambda s: s[-2], body,
        iv + (iv[0] // (SENT + 1) < SENT, jnp.int32(0)))
    return st[-1]


def _occlusion_kernel(d, ck, SB, cand, o_ref, dir_ref, skip_ref, ldist_ref,
                      order_ref, neff_ref, blive_ref, klo_t_ref, khi_t_ref,
                      gt_ref, ci_ref, ids_ref,
                      out_ref, count_ref, blocked):
    # Operands and outputs are LANE-MAJOR — (C_PAD, R) rays, (1, R)
    # scalars: XLA stores (R, small-k) tensors in (8, 128) tiles (a
    # (1M, 1) i32 occupies 512 MB), and the Mosaic custom call requires
    # DENSE operands, so row-shaped operands forced ~9 ms of relayout
    # per invocation EVEN WITH ZERO LIVE BLOCKS (measured: dead call
    # 9.6 ms vs the pad chain alone 1.3 ms).  Lane-major shapes are
    # tile-dense on both sides; live blocks transpose their slices in
    # VMEM (one (8, RAY_BLOCK) transpose per operand per walk).
    #
    # SB independent RAY_BLOCK any-hit walks per grid step amortize the
    # fixed grid-step cost across the block-sparse shadow batches.  The
    # walk regions nest under ONE step-level liveness test (_step_live):
    # a dead pl.when region with the walk body still pays its ~3.5 us
    # frame setup, so all-dead steps must skip the whole group.
    for sb in range(SB):
        sl = slice(sb * RAY_BLOCK, (sb + 1) * RAY_BLOCK)
        out_ref[0:1, sl] = jnp.zeros((1, RAY_BLOCK), jnp.int32)
        count_ref[0:1, sl] = jnp.zeros((1, RAY_BLOCK), jnp.int32)

    base = pl.program_id(0) * SB   # hoisted (interpret-mode nesting)

    @pl.when(_step_live(blive_ref, SB))
    def _live_step():
        for sb in range(SB):
            _occlusion_walk(d, ck, sb, base, cand, o_ref, dir_ref,
                            skip_ref, ldist_ref, order_ref, neff_ref,
                            blive_ref, klo_t_ref, khi_t_ref, gt_ref,
                            ci_ref, ids_ref, out_ref, count_ref, blocked)


def _occlusion_walk(d, ck, sb, base, cand, o_ref, dir_ref, skip_ref,
                    ldist_ref, order_ref, neff_ref, blive_ref, klo_t_ref,
                    khi_t_ref, gt_ref, ci_ref, ids_ref, out_ref, count_ref,
                    blocked):
    sl = slice(sb * RAY_BLOCK, (sb + 1) * RAY_BLOCK)

    @pl.when(blive_ref[base + sb] != 0)
    def _walk(sl=sl):
        o8 = o_ref[:, sl].T
        d8 = dir_ref[:, sl].T
        skip = skip_ref[0:1, sl].T
        ldist = ldist_ref[0:1, sl].T

        blocked[:] = jnp.zeros((RAY_BLOCK, 1), jnp.int32)
        n_eff = neff_ref[0]

        # vectorized candidate scan (see _nearest_kernel); ``cand``
        # positions are extracted per iteration (two per packed scalar)
        # so the serialized vector->scalar round trip amortizes across
        # the group.  The group shares one pre-update saturation bound;
        # the extra tail visits that buys are exact no-ops (`blocked`
        # is a monotone OR of per-ray ``t < ldist`` tests — any
        # superset of the necessary chunks gives the identical result;
        # a pruned chunk has emin >= every unblocked ray's ldist, so
        # nothing it contains can pass the in-visit test).
        emin = _entry_min_all(d, o8, d8, klo_t_ref, khi_t_ref)  # (1, ncp)
        ncp = emin.shape[1]
        posi = jax.lax.broadcasted_iota(jnp.int32, (1, ncp), 1)

        def lmax():
            return jnp.max(jnp.where(blocked[:] == 0, ldist, 0.0),
                           axis=0, keepdims=True)               # (1, 1)

        def chunk_pass(kpos, live):
            idx = order_ref[jnp.minimum(kpos, n_eff - 1)]
            t, valid = _chunk_hits(d, ck, False, gt_ref, ci_ref,
                                   ids_ref, idx, o8, d8, skip)
            valid &= t < ldist
            hit = jnp.any(valid, axis=1, keepdims=True) & live
            blocked[:] = jnp.where(hit, 1, blocked[:])
            return live.astype(jnp.int32)

        visited = _candidate_walk(cand, emin, posi, n_eff, lmax,
                                  chunk_pass)
        out_ref[0:1, sl] = blocked[:].T
        count_ref[0:1, sl] = jnp.full((1, RAY_BLOCK), visited,
                                      jnp.int32)


@partial(jax.jit, static_argnames=("d", "cand"))
def occluded(res, o, dirs, ldist, skip, d, order=None, cand=None):
    """Any-hit within distance over the resident pool.  Rays with
    ``ldist <= 0`` are inactive (compacted-away shadow queries cost
    nothing once every live ray is resolved).  Returns (blocked (R,) bool,
    visited (ni,) i32).  ``cand``: candidate chunks extracted per walk
    iteration (default NTRACER_OCC_CAND / 4; bit-identical ``blocked``
    across values — see _occ_cand)."""
    R = o.shape[0]
    nc, pr, ck = res["gt"].shape
    _check_nc(nc)
    ni = R // RAY_BLOCK
    SB = _occ_sub_blocks(ni, _pool_bytes(res))
    RB = SB * RAY_BLOCK
    if order is None:
        order = res["base_order"]

    # lane-major boundary: (C_PAD, R) rays and (1, R) scalars are
    # tile-dense on both the XLA and Mosaic sides (see _occlusion_kernel)
    o8t = jnp.pad(o.T, ((0, C_PAD - d), (0, 0)))
    d8t = jnp.pad(dirs.T, ((0, C_PAD - d), (0, 0)))
    n_eff = jnp.asarray(res["n_eff"], jnp.int32).reshape((1,))
    klo_t, khi_t = _order_boxes(res, order, d)
    ncp = klo_t.shape[1]
    blive = (jnp.max(ldist.reshape(ni, RAY_BLOCK), axis=1) > 0) \
        .astype(jnp.int32)

    cand = _check_cand(_occ_cand() if cand is None else cand)
    out, counts = pl.pallas_call(
        partial(_occlusion_kernel, d, ck, SB, cand),
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
            pl.BlockSpec(memory_space=pltpu.SMEM),      # order
            pl.BlockSpec(memory_space=pltpu.SMEM),      # n_eff
            pl.BlockSpec(memory_space=pltpu.SMEM),      # blive
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
        scratch_shapes=[
            pltpu.VMEM((RAY_BLOCK, 1), jnp.int32),
        ],
    )(o8t, d8t, skip[None, :], ldist[None, :], order, n_eff, blive,
      klo_t, khi_t, res["gt"], res["ci"], res["ids"])
    return out[0] != 0, counts[0, ::RAY_BLOCK]


# ---------------------------------------------------------------------------
# Transparent pools: nearest-opaque + K-nearest-transparent in scratch
# (the reference handles transparency in the same hot loop,
# tracer.hpp:858-913; the K slots replace its unbounded quick_list)
# ---------------------------------------------------------------------------


def _nearest_t_kernel(d, ck, K, shared, o_ref, dir_ref, skip_ref, init_t_ref,
                      order_ref, neff_ref, blive_ref, klo_t_ref, khi_t_ref,
                      gt_ref, ci_ref, ids_ref,
                      opa_ref, out_t_ref, out_id_ref,
                      out_tt_ref, out_tid_ref, count_ref,
                      best_t, best_id, tt, tid):
    # boundary refs are LANE-MAJOR (see nearest_hit): (1, R) scalars,
    # (K, R) transparent slots; live walks transpose once in VMEM
    out_t_ref[:] = init_t_ref[:]
    out_id_ref[:] = jnp.full((1, RAY_BLOCK), -1, jnp.int32)
    out_tt_ref[:] = jnp.full((K, RAY_BLOCK), INF, f32)
    out_tid_ref[:] = jnp.full((K, RAY_BLOCK), -1, jnp.int32)
    count_ref[:] = jnp.zeros((1, RAY_BLOCK), jnp.int32)

    @pl.when(blive_ref[pl.program_id(0)] != 0)
    def _walk():
        _nearest_t_live(d, ck, K, shared, o_ref, dir_ref, skip_ref,
                        init_t_ref, order_ref, neff_ref, klo_t_ref,
                        khi_t_ref, gt_ref, ci_ref, ids_ref, opa_ref,
                        out_t_ref, out_id_ref, out_tt_ref, out_tid_ref,
                        count_ref, best_t, best_id, tt, tid)


def _nearest_t_live(d, ck, K, shared, o_ref, dir_ref, skip_ref, init_t_ref,
                    order_ref, neff_ref, klo_t_ref, khi_t_ref,
                    gt_ref, ci_ref, ids_ref,
                    opa_ref, out_t_ref, out_id_ref,
                    out_tt_ref, out_tid_ref, count_ref,
                    best_t, best_id, tt, tid):
    o8 = o_ref[:].T
    d8 = dir_ref[:].T
    skip = skip_ref[:].T

    best_t[:] = init_t_ref[:].T
    best_id[:] = jnp.full((RAY_BLOCK, 1), -1, jnp.int32)
    tt[:] = jnp.full((RAY_BLOCK, K), INF, f32)
    tid[:] = jnp.full((RAY_BLOCK, K), -1, jnp.int32)
    n_eff = neff_ref[0]
    lanesK = jax.lax.broadcasted_iota(jnp.int32, (RAY_BLOCK, K), 1)

    # vectorized candidate scan (see _nearest_kernel).  The walk bound is
    # the nearest OPAQUE hit; transparent hits beyond every ray's best_t
    # are culled by trim_intersections in the reference too
    # (tracer.hpp:784-789), so the same bound is exact here.
    emin = _entry_min_all(d, o8, d8, klo_t_ref, khi_t_ref)   # (1, ncp)
    ncp = emin.shape[1]
    posi = jax.lax.broadcasted_iota(jnp.int32, (1, ncp), 1)

    def find_next(k0):
        bound = jnp.max(best_t[:], axis=0, keepdims=True)       # (1, 1)
        cand = (emin < bound) & (posi >= k0) & (posi < n_eff)
        return jnp.min(jnp.where(cand, posi, BIG_POS))

    def body(state):
        k, _, visited = state
        # single, latency-hidden scalar sync per iteration; candidates are
        # processed unconditionally (see _nearest_kernel).  Extra visits
        # are exact: the K-buffer keeps the K smallest inserted, so far
        # hits that downstream filtering drops cannot evict nearer ones.
        # This walk deliberately does NOT use the grouped candidate
        # extraction (_occ_cand): a stale-bound superset schedule can
        # interleave far hits into the K buffer, permuting the SLOT
        # assignment of later near hits — the downstream stable sort
        # would then compose exactly-tied transparent hits (coincident
        # coplanar surfaces at shared edges) in a different order.  The
        # occlusion walks' outputs are order-invariant; this one is not.
        nxt = find_next(k + 1)
        idx = order_ref[k]
        t, valid = _chunk_hits(d, ck, shared, gt_ref, ci_ref, ids_ref,
                               idx, o8, d8, skip)
        op = opa_ref[idx][0:1, :]
        opaq = op >= 1.0

        tm = jnp.where(valid & opaq, t, INF)
        ct = jnp.min(tm, axis=1, keepdims=True)
        carg = jnp.argmin(tm, axis=1).astype(jnp.int32)[:, None]
        upd = ct < best_t[:]
        best_id[:] = jnp.where(upd, idx * ck + carg, best_id[:])
        best_t[:] = jnp.where(upd, ct, best_t[:])

        # K-nearest transparent slots: extract the chunk minimum K
        # times, each time replacing the buffer maximum if nearer
        tmt = jnp.where(valid & jnp.logical_not(opaq), t, INF)
        for _s in range(K):
            st = jnp.min(tmt, axis=1, keepdims=True)
            sarg = jnp.argmin(tmt, axis=1).astype(jnp.int32)[:, None]
            lane = jax.lax.broadcasted_iota(jnp.int32,
                                            (RAY_BLOCK, ck), 1)
            tmt = jnp.where(lane == sarg, INF, tmt)
            bmax = jnp.max(tt[:], axis=1, keepdims=True)
            barg = jnp.argmax(tt[:], axis=1).astype(jnp.int32)[:, None]
            put = (st < bmax) & (lanesK == barg)
            tid[:] = jnp.where(put, idx * ck + sarg, tid[:])
            tt[:] = jnp.where(put, st, tt[:])

        return nxt, nxt < BIG_POS, visited + 1

    k0 = find_next(jnp.int32(0))
    _, _, visited = jax.lax.while_loop(
        lambda s: s[1], body, (k0, k0 < BIG_POS, jnp.int32(0)))
    out_t_ref[:] = best_t[:].T
    out_id_ref[:] = best_id[:].T
    out_tt_ref[:] = tt[:].T
    out_tid_ref[:] = tid[:].T
    count_ref[:] = jnp.full((1, RAY_BLOCK), visited, jnp.int32)


@partial(jax.jit, static_argnames=("d", "K"))
def nearest_hit_transparent(res, o, dirs, skip, d, K, order=None, dmin=None,
                            active=None, sh=None):
    """Nearest opaque hit + the K nearest transparent hits.  Returns
    (t, slot_gid, tt (R,K) ascending-unsorted, tid_gid (R,K), visited)."""
    R = o.shape[0]
    nc, pr, ck = res["gt"].shape
    _check_nc(nc)
    ni = R // RAY_BLOCK
    if order is None:
        order = res["base_order"]
        dmin = jnp.zeros((nc,), f32)
    # lane-major twin: o.T/dirs.T cancel against the transposed
    # pipeline's (d, R) tensors (and CSE with the o8t/d8t pads)
    init_t = _scene_exit_T(o.T, dirs.T, res["b_lo"], res["b_hi"])
    if active is not None:
        init_t = jnp.where(active, init_t, 0.0)
    # lane-major boundary (see nearest_hit)
    o8t = jnp.pad(o.T, ((0, C_PAD - d), (0, 0)))
    d8t = jnp.pad(dirs.T, ((0, C_PAD - d), (0, 0)))
    n_eff = jnp.asarray(res["n_eff"], jnp.int32).reshape((1,))
    ci = res["ci"] if sh is None else sh
    klo_t, khi_t = _order_boxes(res, order, d)
    ncp = klo_t.shape[1]

    blive = (jnp.max(init_t.reshape(ni, RAY_BLOCK), axis=1) > 0) \
        .astype(jnp.int32)
    blk = lambda shape: pl.BlockSpec(shape, lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple([0] * len(shape)),
                                      memory_space=pltpu.VMEM)
    out_t, out_id, out_tt, out_tid, counts = pl.pallas_call(
        partial(_nearest_t_kernel, d, ck, K, sh is not None),
        grid=(ni,),
        interpret=_interpret(),
        compiler_params=_cparams(_pool_bytes(res)),
        in_specs=[
            blk((C_PAD, RAY_BLOCK)), blk((C_PAD, RAY_BLOCK)),
            blk((1, RAY_BLOCK)), blk((1, RAY_BLOCK)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),      # blive
            full((C_PAD, ncp)), full((C_PAD, ncp)),
            full((nc, pr, ck)), full((nc, C_PAD, ck)),
            full((nc, C_PAD, ck)), full((nc, C_PAD, ck)),
        ],
        out_specs=[blk((1, RAY_BLOCK)), blk((1, RAY_BLOCK)),
                   blk((K, RAY_BLOCK)), blk((K, RAY_BLOCK)),
                   blk((1, RAY_BLOCK))],
        out_shape=[
            jax.ShapeDtypeStruct((1, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
            jax.ShapeDtypeStruct((K, R), jnp.float32),
            jax.ShapeDtypeStruct((K, R), jnp.int32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((RAY_BLOCK, 1), jnp.float32),
            pltpu.VMEM((RAY_BLOCK, 1), jnp.int32),
            pltpu.VMEM((RAY_BLOCK, K), jnp.float32),
            pltpu.VMEM((RAY_BLOCK, K), jnp.int32),
        ],
    )(o8t, d8t, skip[None, :], init_t[None, :], order, n_eff, blive,
      klo_t, khi_t, res["gt"], ci, res["ids"], res["opa"])

    slot_ids = res["ids"][:, 0, :].reshape(-1)
    slot = out_id[0]
    gid = jnp.where(slot >= 0, slot_ids[jnp.clip(slot, 0, None)], -1)
    # slot->gid map runs in the lane-major (K, R) layout; the (R, K) row
    # return stays for the callers (the transposed trace finish
    # re-transposes and XLA cancels the pair)
    tgidT = jnp.where(out_tid >= 0, slot_ids[jnp.clip(out_tid, 0, None)],
                      -1)
    return out_t[0], gid, out_tt.T, tgidT.T, counts[0, ::RAY_BLOCK]


def _occl_t_kernel(d, ck, SB, cand, o_ref, dir_ref, skip_ref, ldist_ref,
                   order_ref, neff_ref, blive_ref, klo_t_ref, khi_t_ref,
                   gt_ref, ci_ref, ids_ref, opa_ref,
                   out_ref, filt_ref, count_ref,
                   blocked, filt):
    # SB sub-block batching: see _occlusion_kernel (dead grid steps
    # dominate block-sparse shadow batches); walk regions nest under the
    # step-level liveness test (_step_live — dead regions otherwise pay
    # their ~3.5 us frame setup even when skipped)
    for sb in range(SB):
        sl = slice(sb * RAY_BLOCK, (sb + 1) * RAY_BLOCK)
        out_ref[0:1, sl] = jnp.zeros((1, RAY_BLOCK), jnp.int32)
        filt_ref[0:1, sl] = jnp.ones((1, RAY_BLOCK), f32)
        count_ref[0:1, sl] = jnp.zeros((1, RAY_BLOCK), jnp.int32)

    base = pl.program_id(0) * SB   # hoisted (interpret-mode nesting)

    @pl.when(_step_live(blive_ref, SB))
    def _live_step():
        for sb in range(SB):
            sl = slice(sb * RAY_BLOCK, (sb + 1) * RAY_BLOCK)

            @pl.when(blive_ref[base + sb] != 0)
            def _walk(sl=sl):
                _occl_t_live(d, ck, sl, cand, o_ref, dir_ref, skip_ref,
                             ldist_ref, order_ref, neff_ref, klo_t_ref,
                             khi_t_ref, gt_ref, ci_ref, ids_ref, opa_ref,
                             out_ref, filt_ref, count_ref, blocked, filt)


def _occl_t_live(d, ck, sl, cand, o_ref, dir_ref, skip_ref, ldist_ref,
                 order_ref, neff_ref, klo_t_ref, khi_t_ref,
                 gt_ref, ci_ref, ids_ref, opa_ref,
                 out_ref, filt_ref, count_ref,
                 blocked, filt):
    o8 = o_ref[:, sl].T
    d8 = dir_ref[:, sl].T
    skip = skip_ref[0:1, sl].T
    ldist = ldist_ref[0:1, sl].T

    blocked[:] = jnp.zeros((RAY_BLOCK, 1), jnp.int32)
    filt[:] = jnp.ones((RAY_BLOCK, 1), f32)
    n_eff = neff_ref[0]

    # vectorized candidate scan with grouped extraction (see
    # _occlusion_walk / _occ_cand); a chunk with emin >= max unblocked
    # ldist can affect neither blocked nor filt.  Extra (stale-bound)
    # visits are exact: the per-ray ``t < ldist`` filter makes blocked —
    # and filt for every UNBLOCKED ray — independent of which superset
    # of necessary chunks is walked (a pruned chunk has emin >= every
    # unblocked ray's ldist, so none of its hits pass the in-visit
    # test; blocked rays' filt is a don't-care downstream: light only
    # reaches where ~blocked).
    emin = _entry_min_all(d, o8, d8, klo_t_ref, khi_t_ref)   # (1, ncp)
    ncp = emin.shape[1]
    posi = jax.lax.broadcasted_iota(jnp.int32, (1, ncp), 1)

    def lmax():
        return jnp.max(jnp.where(blocked[:] == 0, ldist, 0.0),
                       axis=0, keepdims=True)                   # (1, 1)

    def chunk_pass(kpos, live):
        idx = order_ref[jnp.minimum(kpos, n_eff - 1)]
        t, valid = _chunk_hits(d, ck, False, gt_ref, ci_ref, ids_ref,
                               idx, o8, d8, skip)
        valid &= t < ldist
        op = opa_ref[idx][0:1, :]
        opaq = op >= 1.0
        hit = jnp.any(valid & opaq, axis=1, keepdims=True) & live
        blocked[:] = jnp.where(hit, 1, blocked[:])
        tr = valid & jnp.logical_not(opaq)
        # lane product via a binary tree: Mosaic has no reduce_prod
        # lowering (jnp.prod fails to compile on real TPUs)
        v = jnp.where(tr, 1.0 - op, 1.0)
        w = ck
        while w > 1:
            assert w % 2 == 0
            w //= 2
            v = v[:, :w] * v[:, w:2 * w]
        filt[:] = filt[:] * jnp.where(live, v, 1.0)
        return live.astype(jnp.int32)

    visited = _candidate_walk(cand, emin, posi, n_eff, lmax, chunk_pass)
    out_ref[0:1, sl] = blocked[:].T
    filt_ref[0:1, sl] = filt[:].T
    count_ref[0:1, sl] = jnp.full((1, RAY_BLOCK), visited, jnp.int32)


@partial(jax.jit, static_argnames=("d", "cand"))
def occluded_transparent(res, o, dirs, ldist, skip, d, order=None,
                         cand=None):
    """Any-opaque-hit + transparency filter product within distance.
    Returns (blocked (R,), filt (R,), visited).  ``cand``: candidate
    chunks per walk iteration (default NTRACER_OCC_CAND / 4; `blocked`
    and unblocked rays' `filt` are bit-identical across values — see
    _occ_cand and the walk docstring)."""
    R = o.shape[0]
    nc, pr, ck = res["gt"].shape
    _check_nc(nc)
    ni = R // RAY_BLOCK
    SB = _occ_sub_blocks(ni, _pool_bytes(res))
    RB = SB * RAY_BLOCK
    cand = _check_cand(_occ_cand() if cand is None else cand)
    if order is None:
        order = res["base_order"]
    # lane-major boundary (see nearest_hit)
    o8t = jnp.pad(o.T, ((0, C_PAD - d), (0, 0)))
    d8t = jnp.pad(dirs.T, ((0, C_PAD - d), (0, 0)))
    n_eff = jnp.asarray(res["n_eff"], jnp.int32).reshape((1,))
    klo_t, khi_t = _order_boxes(res, order, d)
    ncp = klo_t.shape[1]
    blive = (jnp.max(ldist.reshape(ni, RAY_BLOCK), axis=1) > 0) \
        .astype(jnp.int32)

    blk = lambda shape: pl.BlockSpec(shape, lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple([0] * len(shape)),
                                      memory_space=pltpu.VMEM)
    out, filt, counts = pl.pallas_call(
        partial(_occl_t_kernel, d, ck, SB, cand),
        grid=(ni // SB,),
        interpret=_interpret(),
        compiler_params=_cparams(_pool_bytes(res), _occ_stack_bytes(SB)),
        in_specs=[
            blk((C_PAD, RB)), blk((C_PAD, RB)),
            blk((1, RB)), blk((1, RB)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),      # blive
            full((C_PAD, ncp)), full((C_PAD, ncp)),
            full((nc, pr, ck)), full((nc, C_PAD, ck)),
            full((nc, C_PAD, ck)), full((nc, C_PAD, ck)),
        ],
        out_specs=[blk((1, RB)), blk((1, RB)),
                   blk((1, RB))],
        out_shape=[
            jax.ShapeDtypeStruct((1, R), jnp.int32),
            jax.ShapeDtypeStruct((1, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((RAY_BLOCK, 1), jnp.int32),
            pltpu.VMEM((RAY_BLOCK, 1), jnp.float32),
        ],
    )(o8t, d8t, skip[None, :], ldist[None, :], order, n_eff, blive,
      klo_t, khi_t, res["gt"], res["ci"], res["ids"], res["opa"])
    return out[0] != 0, filt[0], counts[0, ::RAY_BLOCK]


# ---------------------------------------------------------------------------
# HBM-resident pools (beyond the VMEM budget): the same front-to-back walk,
# but each VISITED chunk is DMA'd HBM->VMEM through a double buffer inside
# the kernel — skipped chunks cost neither DMA nor compute (the streaming
# grid kernel by contrast fetches every chunk for every ray block).  This
# is SURVEY §5's "node arrays streamed HBM->VMEM" scaling axis.
# ---------------------------------------------------------------------------

HBM_CK = 128   # tighter chunk boxes cull better; the walk's 8-slot deep
# prefetch hides the extra per-DMA latency.  100k-mesh sweep: 128 -> 137
# ms, 512 -> 153 ms, 256 -> 192 ms (2-vreg lane layouts are pathological
# in Mosaic; the same non-monotonicity appeared in the VMEM CK sweep)


def _hbm_fetch(gt_hbm, ci_hbm, ids_hbm, gt_buf, ci_buf, ids_buf, sems,
               idx, slot):
    pltpu.make_async_copy(gt_hbm.at[idx], gt_buf.at[slot],
                          sems.at[slot, 0]).start()
    pltpu.make_async_copy(ci_hbm.at[idx], ci_buf.at[slot],
                          sems.at[slot, 1]).start()
    pltpu.make_async_copy(ids_hbm.at[idx], ids_buf.at[slot],
                          sems.at[slot, 2]).start()


def _hbm_wait(gt_hbm, ci_hbm, ids_hbm, gt_buf, ci_buf, ids_buf, sems, slot):
    # recreate-and-wait: the wait only needs the transfer size
    pltpu.make_async_copy(gt_hbm.at[0], gt_buf.at[slot],
                          sems.at[slot, 0]).wait()
    pltpu.make_async_copy(ci_hbm.at[0], ci_buf.at[slot],
                          sems.at[slot, 1]).wait()
    pltpu.make_async_copy(ids_hbm.at[0], ids_buf.at[slot],
                          sems.at[slot, 2]).wait()




def _order_boxes(res, order, d):
    """Chunk boxes permuted into visit order and transposed to
    (C_PAD, ncp) for the kernel's vectorized all-chunks entry test.
    Padding positions get inverted boxes (entry INF)."""
    nc = res["klo"].shape[0]
    ncp = -(-nc // 128) * 128
    klo = res["klo"][order].T               # (d, nc)
    khi = res["khi"][order].T
    klo_t = jnp.full((C_PAD, ncp), BIG, f32).at[:d, :nc].set(klo)
    khi_t = jnp.full((C_PAD, ncp), -BIG, f32).at[:d, :nc].set(khi)
    return klo_t, khi_t


def _entry_all(d, o8, d8, klo_t_ref, khi_t_ref):
    """Per-(ray, chunk) slab entry for EVERY chunk position, one vectorized
    pass: (RAY_BLOCK, ncp) with INF for missed/padding chunks."""
    ncp = klo_t_ref.shape[1]
    tn = jnp.full((RAY_BLOCK, ncp), -BIG, f32)
    tf = jnp.full((RAY_BLOCK, ncp), BIG, f32)
    for c in range(d):
        lo = klo_t_ref[c][None, :]
        hi = khi_t_ref[c][None, :]
        oc = o8[:, c:c + 1]
        dc = d8[:, c:c + 1]
        par = dc == 0
        inv = jnp.where(par, 0.0, 1.0 / jnp.where(par, 1.0, dc))
        a = (lo - oc) * inv
        b = (hi - oc) * inv
        ins = (oc >= lo) & (oc <= hi)
        t0 = jnp.where(par, jnp.where(ins, -BIG, BIG), jnp.minimum(a, b))
        t1 = jnp.where(par, jnp.where(ins, BIG, -BIG), jnp.maximum(a, b))
        tn = jnp.maximum(tn, t0)
        tf = jnp.minimum(tf, t1)
    entry = jnp.maximum(tn, 0.0)
    ok = (tf >= entry) & (tf >= 0)
    return jnp.where(ok, entry, INF)


def _entry_min_all(d, o8, d8, klo_t_ref, khi_t_ref):
    """Minimum-over-rays slab entry per chunk position: (1, ncp)."""
    return jnp.min(_entry_all(d, o8, d8, klo_t_ref, khi_t_ref),
                   axis=0, keepdims=True)


# Candidate-bound design note (measured on the 120-cell, v5e): tighter
# per-ray and per-64-ray-group bounds (any_r entry[r,k] < best_t[r]) were
# implemented and measured to reduce chunk visits by <0.1% on the
# flagship view while costing 0-40% more per iteration (the per-ray
# variant keeps a (RAY_BLOCK, ncp) matrix live across the loop and was
# 9x slower from register-spill churn).  The block-level bound below
# (min-over-rays entry vs max-over-rays best) is effectively tight
# because the unresolved rays of a coherent 32x16-px tile share their
# frustum; the cheap (1, ncp)/(1, 1) form is kept.


BIG_POS = np.int32(1 << 30)


def _nearest_hbm_kernel(d, ck, shared, payload, probe, *refs):
    (o_ref, dir_ref, skip_ref, init_t_ref, order_ref, dmin_ref, neff_ref,
     blive_ref, klo_t_ref, khi_t_ref, gt_hbm, ci_hbm, ids_hbm) = refs[:13]
    if payload:
        (out_t_ref, out_id_ref, out_pay_ref, count_ref, best_t, best_id,
         best_pay, gt_buf, ci_buf, ids_buf, sems) = refs[13:]
    else:
        (out_t_ref, out_id_ref, count_ref, best_t, best_id,
         gt_buf, ci_buf, ids_buf, sems) = refs[13:]
        out_pay_ref = best_pay = None
    # boundary refs are LANE-MAJOR (see nearest_hit)
    out_t_ref[:] = init_t_ref[:]
    out_id_ref[:] = jnp.full((1, RAY_BLOCK), -1, jnp.int32)
    count_ref[:] = jnp.zeros((1, RAY_BLOCK), jnp.int32)
    if out_pay_ref is not None:
        out_pay_ref[:] = _miss_payload_t(out_pay_ref.shape[0], d)

    @pl.when(blive_ref[pl.program_id(0)] != 0)
    def _walk():
        _nearest_hbm_live(d, ck, shared, o_ref, dir_ref, skip_ref,
                          init_t_ref, order_ref, dmin_ref, neff_ref,
                          klo_t_ref, khi_t_ref, gt_hbm, ci_hbm, ids_hbm,
                          out_t_ref, out_id_ref, count_ref, best_t,
                          best_id, gt_buf, ci_buf, ids_buf, sems,
                          out_pay_ref, best_pay, probe)


def _nearest_hbm_live(d, ck, shared, o_ref, dir_ref, skip_ref, init_t_ref,
                      order_ref, dmin_ref, neff_ref, klo_t_ref, khi_t_ref,
                      gt_hbm, ci_hbm, ids_hbm,
                      out_t_ref, out_id_ref,
                      count_ref, best_t, best_id, gt_buf, ci_buf, ids_buf,
                      sems, out_pay_ref=None, best_pay=None, probe=False):
    """HBM-pool walk with packed 4-candidate selection and 8-slot deep
    prefetch.  Like the VMEM walk, these loops are bound by per-iteration
    scalar syncs (~3.7 us each; the 100k-triangle mesh bench was flat
    across every FLOP-level change), so each iteration selects FOUR
    candidates with chained vector mins packed two-per-scalar, fetches
    them into the inactive buffer group, and processes the previously
    fetched group.  All pl.when predicates are already-extracted scalars
    (position < SENT), which cost nothing."""
    del dmin_ref  # the emin bound subsumes the dmin check
    o8 = o_ref[:].T
    d8 = dir_ref[:].T
    skip = skip_ref[:].T

    best_t[:] = init_t_ref[:].T
    best_id[:] = jnp.full((RAY_BLOCK, 1), -1, jnp.int32)
    if best_pay is not None:
        best_pay[:] = _miss_payload(best_pay.shape[1], d)
    n_eff = neff_ref[0]

    emin = _entry_min_all(d, o8, d8, klo_t_ref, khi_t_ref)   # (1, ncp)
    ncp = emin.shape[1]
    posi = jax.lax.broadcasted_iota(jnp.int32, (1, ncp), 1)
    SENT = jnp.int32((1 << 14) - 1)

    def find4(k0v):
        bound = jnp.max(best_t[:], axis=0, keepdims=True)   # (1, 1)
        cand = (emin < bound) & (posi >= k0v) & (posi < n_eff)
        cp = jnp.where(cand, posi, SENT)
        cs = []
        for _ in range(4):
            c = jnp.min(cp, axis=1, keepdims=True)
            cs.append(c)
            cp = jnp.where(posi > c, cp, SENT)
        return cs[0] * (SENT + 1) + cs[1], cs[2] * (SENT + 1) + cs[3]

    def unpack(p12, p34):
        return (p12 // (SENT + 1), p12 % (SENT + 1),
                p34 // (SENT + 1), p34 % (SENT + 1))

    def fetch4(ks, base):
        for j, kj in enumerate(ks):
            @pl.when(kj < SENT)
            def _(kj=kj, j=j):
                _hbm_fetch(gt_hbm, ci_hbm, ids_hbm, gt_buf, ci_buf,
                           ids_buf, sems, order_ref[kj], base + j)

    def process4(ks, base, visited):
        for j, kj in enumerate(ks):
            @pl.when(kj < SENT)
            def _(kj=kj, j=j):
                slot = base + j
                _hbm_wait(gt_hbm, ci_hbm, ids_hbm, gt_buf, ci_buf,
                          ids_buf, sems, slot)
                if probe:
                    # bound-analysis mode (scripts/hbm_bound.py): identical
                    # candidate scan, fetch schedule, and DMA waits, but
                    # the pair test is replaced by a minimal buffer touch
                    # (value-wise a no-op on best_t: min with +huge; not
                    # constant-foldable since the operand is runtime data).
                    # Measures the walk's fetch+sync floor per visit.
                    touch = jnp.max(jnp.abs(gt_buf[slot][0:1, :]),
                                    axis=1, keepdims=True) + BIG
                    best_t[:] = jnp.minimum(best_t[:], touch)
                    return
                idx = order_ref[kj]
                g = gt_buf[slot]
                idr = ids_buf[slot]
                t, valid = _chunk_hits_vals(
                    d, ck, shared, g, ci_buf[slot],
                    idr[0:1, :], o8, d8, skip)
                tm = jnp.where(valid, t, INF)
                ct = jnp.min(tm, axis=1, keepdims=True)
                carg = jnp.argmin(tm, axis=1).astype(jnp.int32)[:, None]
                upd = ct < best_t[:]
                if best_pay is not None:
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, (RAY_BLOCK, ck), 1)
                    pay = _extract_payload(d, ck, best_pay.shape[1], g,
                                           idr, lane == carg)
                    best_pay[:] = jnp.where(upd, pay, best_pay[:])
                best_id[:] = jnp.where(upd, idx * ck + carg, best_id[:])
                best_t[:] = jnp.where(upd, ct, best_t[:])
            visited = visited + (kj < SENT).astype(jnp.int32)
        return visited

    i12, i34 = find4(jnp.zeros((1, 1), jnp.int32))
    iv12 = i12[0, 0]
    iv34 = i34[0, 0]
    fetch4(unpack(iv12, iv34), jnp.int32(0))

    def body(state):
        p12, p34, base, _, visited = state
        ks = unpack(p12, p34)
        # scan + fetch the NEXT group before waiting on the current one:
        # the four DMAs land in the inactive buffer half while the four
        # fetched chunks compute
        n12, n34 = find4(jnp.maximum(ks[3], ks[0]) + 1)
        nv12 = n12[0, 0]
        nv34 = n34[0, 0]
        nbase = 4 - base
        fetch4(unpack(nv12, nv34), nbase)
        visited = process4(ks, base, visited)
        return nv12, nv34, nbase, nv12 // (SENT + 1) < SENT, visited

    _, _, _, _, visited = jax.lax.while_loop(
        lambda s: s[3], body,
        (iv12, iv34, jnp.int32(0), iv12 // (SENT + 1) < SENT, jnp.int32(0)))
    out_t_ref[:] = best_t[:].T
    out_id_ref[:] = best_id[:].T
    if out_pay_ref is not None:
        out_pay_ref[:] = best_pay[:].T
    count_ref[:] = jnp.full((1, RAY_BLOCK), visited, jnp.int32)


@partial(jax.jit, static_argnames=("d", "payload", "probe", "raw_slot"))
def nearest_hit_hbm(res, o, dirs, skip, d, order=None, dmin=None,
                    active=None, sh=None, payload=False, probe=False,
                    raw_slot=False):
    """nearest_hit for pools too large for VMEM residency: the pool stays
    in HBM and visited chunks stream through a double buffer.  ``sh``
    (shared_rows_res) replaces the streamed ci chunks for primary rays.
    ``payload`` as in nearest_hit: returns (t, gid, pay, visited).
    ``probe`` replaces the pair test with a buffer touch (identical
    fetch/sync schedule, no compute, bound never tightens) — the
    fetch-bound-vs-pair-bound decomposition for scripts/hbm_bound.py;
    outputs are meaningless except the visit counter."""
    R = o.shape[0]
    nc, pr, ck = res["gt"].shape
    _check_nc(nc)
    ni = R // RAY_BLOCK
    if order is None:
        order = res["base_order"]
        dmin = jnp.zeros((nc,), f32)
    # lane-major twin: o.T/dirs.T cancel against the transposed
    # pipeline's (d, R) tensors (and CSE with the o8t/d8t pads)
    init_t = _scene_exit_T(o.T, dirs.T, res["b_lo"], res["b_hi"])
    if active is not None:
        init_t = jnp.where(active, init_t, 0.0)
    # lane-major boundary (see nearest_hit)
    o8t = jnp.pad(o.T, ((0, C_PAD - d), (0, 0)))
    d8t = jnp.pad(dirs.T, ((0, C_PAD - d), (0, 0)))
    n_eff = jnp.asarray(res["n_eff"], jnp.int32).reshape((1,))
    klo_t, khi_t = _order_boxes(res, order, d)
    ncp = klo_t.shape[1]
    ci = res["ci"] if sh is None else sh
    blive = (jnp.max(init_t.reshape(ni, RAY_BLOCK), axis=1) > 0) \
        .astype(jnp.int32)

    blk = lambda shape: pl.BlockSpec(shape, lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    pw = payload_width(d)
    out_specs = [blk((1, RAY_BLOCK)), blk((1, RAY_BLOCK))]
    out_shape = [jax.ShapeDtypeStruct((1, R), jnp.float32),
                 jax.ShapeDtypeStruct((1, R), jnp.int32)]
    scratch = [pltpu.VMEM((RAY_BLOCK, 1), jnp.float32),
               pltpu.VMEM((RAY_BLOCK, 1), jnp.int32)]
    if payload:
        out_specs.append(blk((pw, RAY_BLOCK)))
        out_shape.append(jax.ShapeDtypeStruct((pw, R), jnp.float32))
        scratch.append(pltpu.VMEM((RAY_BLOCK, pw), jnp.float32))
    out_specs.append(blk((1, RAY_BLOCK)))
    out_shape.append(jax.ShapeDtypeStruct((1, R), jnp.int32))
    scratch += [
        pltpu.VMEM((8, pr, ck), jnp.float32),
        pltpu.VMEM((8, C_PAD, ck), jnp.float32),
        pltpu.VMEM((8, C_PAD, ck), jnp.int32),
        pltpu.SemaphoreType.DMA((8, 3)),
    ]
    outs = pl.pallas_call(
        partial(_nearest_hbm_kernel, d, ck, sh is not None, payload, probe),
        grid=(ni,),
        interpret=_interpret(),
        compiler_params=_cparams(),
        in_specs=[
            blk((C_PAD, RAY_BLOCK)), blk((C_PAD, RAY_BLOCK)),
            blk((1, RAY_BLOCK)), blk((1, RAY_BLOCK)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),      # blive
            pl.BlockSpec((C_PAD, ncp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # klo_t (order space)
            pl.BlockSpec((C_PAD, ncp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # khi_t
            pl.BlockSpec(memory_space=pl.ANY),       # gt (HBM)
            pl.BlockSpec(memory_space=pl.ANY),       # ci (HBM)
            pl.BlockSpec(memory_space=pl.ANY),       # ids (HBM)
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(o8t, d8t, skip[None, :], init_t[None, :], order, dmin, n_eff,
      blive, klo_t, khi_t, res["gt"], ci, res["ids"])
    if payload:
        out_t, _out_id, out_payt, counts = outs
        gid = out_payt[d + 1].astype(jnp.int32)
        return out_t[0], gid, out_payt.T, counts[0, ::RAY_BLOCK]
    out_t, out_id, counts = outs
    if raw_slot:
        return out_t[0], out_id[0], counts[0, ::RAY_BLOCK]
    slot = out_id[0]
    slot_ids = res["ids"][:, 0, :].reshape(-1)
    gid = jnp.where(slot >= 0, slot_ids[jnp.clip(slot, 0, None)], -1)
    return out_t[0], gid, counts[0, ::RAY_BLOCK]


def _occl_hbm_kernel(d, ck, SB, o_ref, dir_ref, skip_ref, ldist_ref,
                     order_ref, neff_ref, blive_ref, klo_t_ref, khi_t_ref,
                     gt_hbm, ci_hbm, ids_hbm,
                     out_ref, count_ref,
                     blocked, gt_buf, ci_buf, ids_buf, sems):
    # SB sub-block batching: see _occlusion_kernel (dead grid steps
    # dominate block-sparse shadow batches).  The DMA buffers/semaphores
    # are reused sequentially — each sub-block walk quiesces its own
    # fetches before returning.  Walk regions nest under the step-level
    # liveness test (_step_live — dead regions otherwise pay their
    # ~3.5 us frame setup even when skipped).
    for sb in range(SB):
        sl = slice(sb * RAY_BLOCK, (sb + 1) * RAY_BLOCK)
        out_ref[0:1, sl] = jnp.zeros((1, RAY_BLOCK), jnp.int32)
        count_ref[0:1, sl] = jnp.zeros((1, RAY_BLOCK), jnp.int32)

    base = pl.program_id(0) * SB   # hoisted (interpret-mode nesting)

    @pl.when(_step_live(blive_ref, SB))
    def _live_step():
        for sb in range(SB):
            sl = slice(sb * RAY_BLOCK, (sb + 1) * RAY_BLOCK)

            @pl.when(blive_ref[base + sb] != 0)
            def _walk(sl=sl):
                _occl_hbm_live(d, ck, sl, o_ref, dir_ref, skip_ref,
                               ldist_ref, order_ref, neff_ref, klo_t_ref,
                               khi_t_ref, gt_hbm, ci_hbm, ids_hbm,
                               out_ref, count_ref, blocked, gt_buf,
                               ci_buf, ids_buf, sems)


def _occl_hbm_live(d, ck, sl, o_ref, dir_ref, skip_ref, ldist_ref,
                   order_ref, neff_ref, klo_t_ref, khi_t_ref,
                   gt_hbm, ci_hbm, ids_hbm,
                   out_ref, count_ref,
                   blocked, gt_buf, ci_buf, ids_buf, sems):
    """HBM-pool occlusion with the same packed 4-candidate selection +
    8-slot deep prefetch as _nearest_hbm_kernel.  lmax = 0 once every ray
    resolves, so the candidate scan doubles as the liveness check; extra
    visits are exact (per-ray ``t < ldist`` filtering)."""
    o8 = o_ref[:, sl].T
    d8 = dir_ref[:, sl].T
    skip = skip_ref[0:1, sl].T
    ldist = ldist_ref[0:1, sl].T

    blocked[:] = jnp.zeros((RAY_BLOCK, 1), jnp.int32)
    n_eff = neff_ref[0]

    emin = _entry_min_all(d, o8, d8, klo_t_ref, khi_t_ref)   # (1, ncp)
    ncp = emin.shape[1]
    posi = jax.lax.broadcasted_iota(jnp.int32, (1, ncp), 1)
    SENT = jnp.int32((1 << 14) - 1)

    def find4(k0v):
        # only still-unblocked rays' light distances count
        lmax = jnp.max(jnp.where(blocked[:] == 0, ldist, 0.0),
                       axis=0, keepdims=True)                   # (1, 1)
        cand = (emin < lmax) & (posi >= k0v) & (posi < n_eff)
        cp = jnp.where(cand, posi, SENT)
        cs = []
        for _ in range(4):
            c = jnp.min(cp, axis=1, keepdims=True)
            cs.append(c)
            cp = jnp.where(posi > c, cp, SENT)
        return cs[0] * (SENT + 1) + cs[1], cs[2] * (SENT + 1) + cs[3]

    def unpack(p12, p34):
        return (p12 // (SENT + 1), p12 % (SENT + 1),
                p34 // (SENT + 1), p34 % (SENT + 1))

    def fetch4(ks, base):
        for j, kj in enumerate(ks):
            @pl.when(kj < SENT)
            def _(kj=kj, j=j):
                _hbm_fetch(gt_hbm, ci_hbm, ids_hbm, gt_buf, ci_buf,
                           ids_buf, sems, order_ref[kj], base + j)

    def process4(ks, base, visited):
        for j, kj in enumerate(ks):
            @pl.when(kj < SENT)
            def _(kj=kj, j=j):
                slot = base + j
                _hbm_wait(gt_hbm, ci_hbm, ids_hbm, gt_buf, ci_buf,
                          ids_buf, sems, slot)
                t, valid = _chunk_hits_vals(
                    d, ck, False, gt_buf[slot], ci_buf[slot],
                    ids_buf[slot][0:1, :], o8, d8, skip)
                valid &= t < ldist
                hit = jnp.any(valid, axis=1, keepdims=True)
                blocked[:] = jnp.where(hit, 1, blocked[:])
            visited = visited + (kj < SENT).astype(jnp.int32)
        return visited

    i12, i34 = find4(jnp.zeros((1, 1), jnp.int32))
    iv12 = i12[0, 0]
    iv34 = i34[0, 0]
    fetch4(unpack(iv12, iv34), jnp.int32(0))

    def body(state):
        p12, p34, base, _, visited = state
        ks = unpack(p12, p34)
        n12, n34 = find4(jnp.maximum(ks[3], ks[0]) + 1)
        nv12 = n12[0, 0]
        nv34 = n34[0, 0]
        nbase = 4 - base
        fetch4(unpack(nv12, nv34), nbase)
        visited = process4(ks, base, visited)
        return nv12, nv34, nbase, nv12 // (SENT + 1) < SENT, visited

    _, _, _, _, visited = jax.lax.while_loop(
        lambda s: s[3], body,
        (iv12, iv34, jnp.int32(0), iv12 // (SENT + 1) < SENT, jnp.int32(0)))
    out_ref[0:1, sl] = blocked[:].T
    count_ref[0:1, sl] = jnp.full((1, RAY_BLOCK), visited, jnp.int32)


@partial(jax.jit, static_argnames=("d",))
def occluded_hbm(res, o, dirs, ldist, skip, d, order=None):
    """occluded for HBM-resident pools (double-buffered chunk streaming)."""
    R = o.shape[0]
    nc, pr, ck = res["gt"].shape
    _check_nc(nc)
    ni = R // RAY_BLOCK
    SB = _occ_sub_blocks(ni)
    RB = SB * RAY_BLOCK
    if order is None:
        order = res["base_order"]
    # lane-major boundary (see nearest_hit)
    o8t = jnp.pad(o.T, ((0, C_PAD - d), (0, 0)))
    d8t = jnp.pad(dirs.T, ((0, C_PAD - d), (0, 0)))
    n_eff = jnp.asarray(res["n_eff"], jnp.int32).reshape((1,))

    klo_t, khi_t = _order_boxes(res, order, d)
    ncp = klo_t.shape[1]
    blive = (jnp.max(ldist.reshape(ni, RAY_BLOCK), axis=1) > 0) \
        .astype(jnp.int32)
    blk = lambda shape: pl.BlockSpec(shape, lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    out, counts = pl.pallas_call(
        partial(_occl_hbm_kernel, d, ck, SB),
        grid=(ni // SB,),
        interpret=_interpret(),
        compiler_params=_cparams(stack_bytes=_occ_stack_bytes(SB)),
        in_specs=[
            blk((C_PAD, RB)), blk((C_PAD, RB)),
            blk((1, RB)), blk((1, RB)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),      # blive
            pl.BlockSpec((C_PAD, ncp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C_PAD, ncp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[blk((1, RB)), blk((1, RB))],
        out_shape=[
            jax.ShapeDtypeStruct((1, R), jnp.int32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((RAY_BLOCK, 1), jnp.int32),
            pltpu.VMEM((8, pr, ck), jnp.float32),
            pltpu.VMEM((8, C_PAD, ck), jnp.float32),
            pltpu.VMEM((8, C_PAD, ck), jnp.int32),
            pltpu.SemaphoreType.DMA((8, 3)),
        ],
    )(o8t, d8t, skip[None, :], ldist[None, :], order, n_eff, blive,
      klo_t, khi_t, res["gt"], res["ci"], res["ids"])
    return out[0] != 0, counts[0, ::RAY_BLOCK]


# ---------------------------------------------------------------------------
# Transparent HBM pools: nearest-opaque + K transparent slots with the same
# packed 4-candidate selection + deep prefetch as the opaque HBM walk (the
# reference handles transparency in its one hot loop at any scene size,
# tracer.hpp:977-1086; round 2 fell back to the XLA scan here).
# ---------------------------------------------------------------------------


def _hbm_fetch_t(arrs_hbm, bufs, sems, idx, slot):
    for j, (src, dst) in enumerate(zip(arrs_hbm, bufs)):
        pltpu.make_async_copy(src.at[idx], dst.at[slot],
                              sems.at[slot, j]).start()


def _hbm_wait_t(arrs_hbm, bufs, sems, slot):
    for j, (src, dst) in enumerate(zip(arrs_hbm, bufs)):
        pltpu.make_async_copy(src.at[0], dst.at[slot],
                              sems.at[slot, j]).wait()


def _nearest_t_hbm_kernel(d, ck, K, shared, o_ref, dir_ref, skip_ref,
                          init_t_ref, order_ref, neff_ref, blive_ref,
                          klo_t_ref,
                          khi_t_ref, gt_hbm, ci_hbm, ids_hbm, opa_hbm,
                          out_t_ref, out_id_ref, out_tt_ref, out_tid_ref,
                          count_ref, best_t, best_id, tt, tid,
                          gt_buf, ci_buf, ids_buf, opa_buf, sems):
    # boundary refs are LANE-MAJOR (see nearest_hit)
    out_t_ref[:] = init_t_ref[:]
    out_id_ref[:] = jnp.full((1, RAY_BLOCK), -1, jnp.int32)
    out_tt_ref[:] = jnp.full((K, RAY_BLOCK), INF, f32)
    out_tid_ref[:] = jnp.full((K, RAY_BLOCK), -1, jnp.int32)
    count_ref[:] = jnp.zeros((1, RAY_BLOCK), jnp.int32)

    @pl.when(blive_ref[pl.program_id(0)] != 0)
    def _walk():
        _nearest_t_hbm_live(d, ck, K, shared, o_ref, dir_ref, skip_ref,
                            init_t_ref, order_ref, neff_ref, klo_t_ref,
                            khi_t_ref, gt_hbm, ci_hbm, ids_hbm, opa_hbm,
                            out_t_ref, out_id_ref, out_tt_ref, out_tid_ref,
                            count_ref, best_t, best_id, tt, tid,
                            gt_buf, ci_buf, ids_buf, opa_buf, sems)


def _nearest_t_hbm_live(d, ck, K, shared, o_ref, dir_ref, skip_ref,
                        init_t_ref, order_ref, neff_ref, klo_t_ref,
                        khi_t_ref, gt_hbm, ci_hbm, ids_hbm, opa_hbm,
                        out_t_ref, out_id_ref, out_tt_ref, out_tid_ref,
                        count_ref, best_t, best_id, tt, tid,
                        gt_buf, ci_buf, ids_buf, opa_buf, sems):
    o8 = o_ref[:].T
    d8 = dir_ref[:].T
    skip = skip_ref[:].T

    best_t[:] = init_t_ref[:].T
    best_id[:] = jnp.full((RAY_BLOCK, 1), -1, jnp.int32)
    tt[:] = jnp.full((RAY_BLOCK, K), INF, f32)
    tid[:] = jnp.full((RAY_BLOCK, K), -1, jnp.int32)
    n_eff = neff_ref[0]
    lanesK = jax.lax.broadcasted_iota(jnp.int32, (RAY_BLOCK, K), 1)

    emin = _entry_min_all(d, o8, d8, klo_t_ref, khi_t_ref)   # (1, ncp)
    ncp = emin.shape[1]
    posi = jax.lax.broadcasted_iota(jnp.int32, (1, ncp), 1)
    SENT = jnp.int32((1 << 14) - 1)
    arrs_hbm = (gt_hbm, ci_hbm, ids_hbm, opa_hbm)
    bufs = (gt_buf, ci_buf, ids_buf, opa_buf)

    def find4(k0v):
        # bound = nearest OPAQUE hit; transparent hits beyond each ray's
        # best_t are culled downstream (tracer.hpp:784-789)
        bound = jnp.max(best_t[:], axis=0, keepdims=True)   # (1, 1)
        cand = (emin < bound) & (posi >= k0v) & (posi < n_eff)
        cp = jnp.where(cand, posi, SENT)
        cs = []
        for _ in range(4):
            c = jnp.min(cp, axis=1, keepdims=True)
            cs.append(c)
            cp = jnp.where(posi > c, cp, SENT)
        return cs[0] * (SENT + 1) + cs[1], cs[2] * (SENT + 1) + cs[3]

    def unpack(p12, p34):
        return (p12 // (SENT + 1), p12 % (SENT + 1),
                p34 // (SENT + 1), p34 % (SENT + 1))

    def fetch4(ks, base):
        for j, kj in enumerate(ks):
            @pl.when(kj < SENT)
            def _(kj=kj, j=j):
                _hbm_fetch_t(arrs_hbm, bufs, sems, order_ref[kj], base + j)

    def process4(ks, base, visited):
        for j, kj in enumerate(ks):
            @pl.when(kj < SENT)
            def _(kj=kj, j=j):
                slot = base + j
                _hbm_wait_t(arrs_hbm, bufs, sems, slot)
                idx = order_ref[kj]
                t, valid = _chunk_hits_vals(
                    d, ck, shared, gt_buf[slot], ci_buf[slot],
                    ids_buf[slot][0:1, :], o8, d8, skip)
                op = opa_buf[slot][0:1, :]
                opaq = op >= 1.0

                tm = jnp.where(valid & opaq, t, INF)
                ct = jnp.min(tm, axis=1, keepdims=True)
                carg = jnp.argmin(tm, axis=1).astype(jnp.int32)[:, None]
                upd = ct < best_t[:]
                best_id[:] = jnp.where(upd, idx * ck + carg, best_id[:])
                best_t[:] = jnp.where(upd, ct, best_t[:])

                # K-nearest transparent slots (see _nearest_t_kernel)
                tmt = jnp.where(valid & jnp.logical_not(opaq), t, INF)
                for _s in range(K):
                    st = jnp.min(tmt, axis=1, keepdims=True)
                    sarg = jnp.argmin(tmt, axis=1).astype(jnp.int32)[:, None]
                    lane = jax.lax.broadcasted_iota(jnp.int32,
                                                    (RAY_BLOCK, ck), 1)
                    tmt = jnp.where(lane == sarg, INF, tmt)
                    bmax = jnp.max(tt[:], axis=1, keepdims=True)
                    barg = jnp.argmax(tt[:], axis=1).astype(jnp.int32)[:, None]
                    put = (st < bmax) & (lanesK == barg)
                    tid[:] = jnp.where(put, idx * ck + sarg, tid[:])
                    tt[:] = jnp.where(put, st, tt[:])
            visited = visited + (kj < SENT).astype(jnp.int32)
        return visited

    i12, i34 = find4(jnp.zeros((1, 1), jnp.int32))
    iv12 = i12[0, 0]
    iv34 = i34[0, 0]
    fetch4(unpack(iv12, iv34), jnp.int32(0))

    def body(state):
        p12, p34, base, _, visited = state
        ks = unpack(p12, p34)
        n12, n34 = find4(jnp.maximum(ks[3], ks[0]) + 1)
        nv12 = n12[0, 0]
        nv34 = n34[0, 0]
        nbase = 4 - base
        fetch4(unpack(nv12, nv34), nbase)
        visited = process4(ks, base, visited)
        return nv12, nv34, nbase, nv12 // (SENT + 1) < SENT, visited

    _, _, _, _, visited = jax.lax.while_loop(
        lambda s: s[3], body,
        (iv12, iv34, jnp.int32(0), iv12 // (SENT + 1) < SENT, jnp.int32(0)))
    out_t_ref[:] = best_t[:].T
    out_id_ref[:] = best_id[:].T
    out_tt_ref[:] = tt[:].T
    out_tid_ref[:] = tid[:].T
    count_ref[:] = jnp.full((1, RAY_BLOCK), visited, jnp.int32)


@partial(jax.jit, static_argnames=("d", "K"))
def nearest_hit_transparent_hbm(res, o, dirs, skip, d, K, order=None,
                                dmin=None, active=None, sh=None):
    """nearest_hit_transparent for HBM-resident pools (double-buffered
    chunk streaming incl. the opacity row)."""
    R = o.shape[0]
    nc, pr, ck = res["gt"].shape
    _check_nc(nc)
    ni = R // RAY_BLOCK
    if order is None:
        order = res["base_order"]
    # lane-major twin: o.T/dirs.T cancel against the transposed
    # pipeline's (d, R) tensors (and CSE with the o8t/d8t pads)
    init_t = _scene_exit_T(o.T, dirs.T, res["b_lo"], res["b_hi"])
    if active is not None:
        init_t = jnp.where(active, init_t, 0.0)
    # lane-major boundary (see nearest_hit)
    o8t = jnp.pad(o.T, ((0, C_PAD - d), (0, 0)))
    d8t = jnp.pad(dirs.T, ((0, C_PAD - d), (0, 0)))
    n_eff = jnp.asarray(res["n_eff"], jnp.int32).reshape((1,))
    klo_t, khi_t = _order_boxes(res, order, d)
    ncp = klo_t.shape[1]
    ci = res["ci"] if sh is None else sh
    blive = (jnp.max(init_t.reshape(ni, RAY_BLOCK), axis=1) > 0) \
        .astype(jnp.int32)

    blk = lambda shape: pl.BlockSpec(shape, lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    out_t, out_id, out_tt, out_tid, counts = pl.pallas_call(
        partial(_nearest_t_hbm_kernel, d, ck, K, sh is not None),
        grid=(ni,),
        interpret=_interpret(),
        compiler_params=_cparams(),
        in_specs=[
            blk((C_PAD, RAY_BLOCK)), blk((C_PAD, RAY_BLOCK)),
            blk((1, RAY_BLOCK)), blk((1, RAY_BLOCK)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),      # blive
            pl.BlockSpec((C_PAD, ncp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C_PAD, ncp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),       # gt (HBM)
            pl.BlockSpec(memory_space=pl.ANY),       # ci (HBM)
            pl.BlockSpec(memory_space=pl.ANY),       # ids (HBM)
            pl.BlockSpec(memory_space=pl.ANY),       # opa (HBM)
        ],
        out_specs=[blk((1, RAY_BLOCK)), blk((1, RAY_BLOCK)),
                   blk((K, RAY_BLOCK)), blk((K, RAY_BLOCK)),
                   blk((1, RAY_BLOCK))],
        out_shape=[
            jax.ShapeDtypeStruct((1, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
            jax.ShapeDtypeStruct((K, R), jnp.float32),
            jax.ShapeDtypeStruct((K, R), jnp.int32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((RAY_BLOCK, 1), jnp.float32),
            pltpu.VMEM((RAY_BLOCK, 1), jnp.int32),
            pltpu.VMEM((RAY_BLOCK, K), jnp.float32),
            pltpu.VMEM((RAY_BLOCK, K), jnp.int32),
            pltpu.VMEM((8, pr, ck), jnp.float32),
            pltpu.VMEM((8, C_PAD, ck), jnp.float32),
            pltpu.VMEM((8, C_PAD, ck), jnp.int32),
            pltpu.VMEM((8, C_PAD, ck), jnp.float32),
            pltpu.SemaphoreType.DMA((8, 4)),
        ],
    )(o8t, d8t, skip[None, :], init_t[None, :], order, n_eff, blive,
      klo_t, khi_t, res["gt"], ci, res["ids"], res["opa"])

    slot_ids = res["ids"][:, 0, :].reshape(-1)
    slot = out_id[0]
    gid = jnp.where(slot >= 0, slot_ids[jnp.clip(slot, 0, None)], -1)
    # slot->gid map in the lane-major (K, R) layout (see
    # nearest_hit_transparent)
    tgidT = jnp.where(out_tid >= 0, slot_ids[jnp.clip(out_tid, 0, None)],
                      -1)
    return out_t[0], gid, out_tt.T, tgidT.T, counts[0, ::RAY_BLOCK]


def _occl_t_hbm_kernel(d, ck, SB, o_ref, dir_ref, skip_ref, ldist_ref,
                       order_ref, neff_ref, blive_ref, klo_t_ref, khi_t_ref,
                       gt_hbm, ci_hbm, ids_hbm, opa_hbm,
                       out_ref, filt_ref, count_ref,
                       blocked, filt, gt_buf, ci_buf, ids_buf, opa_buf,
                       sems):
    # SB sub-block batching: see _occlusion_kernel; walk regions nest
    # under the step-level liveness test (_step_live)
    for sb in range(SB):
        sl = slice(sb * RAY_BLOCK, (sb + 1) * RAY_BLOCK)
        out_ref[0:1, sl] = jnp.zeros((1, RAY_BLOCK), jnp.int32)
        filt_ref[0:1, sl] = jnp.ones((1, RAY_BLOCK), f32)
        count_ref[0:1, sl] = jnp.zeros((1, RAY_BLOCK), jnp.int32)

    base = pl.program_id(0) * SB   # hoisted (interpret-mode nesting)

    @pl.when(_step_live(blive_ref, SB))
    def _live_step():
        for sb in range(SB):
            sl = slice(sb * RAY_BLOCK, (sb + 1) * RAY_BLOCK)

            @pl.when(blive_ref[base + sb] != 0)
            def _walk(sl=sl):
                _occl_t_hbm_live(d, ck, sl, o_ref, dir_ref, skip_ref,
                                 ldist_ref, order_ref, neff_ref, klo_t_ref,
                                 khi_t_ref, gt_hbm, ci_hbm, ids_hbm,
                                 opa_hbm, out_ref, filt_ref, count_ref,
                                 blocked, filt, gt_buf, ci_buf, ids_buf,
                                 opa_buf, sems)


def _occl_t_hbm_live(d, ck, sl, o_ref, dir_ref, skip_ref, ldist_ref,
                     order_ref, neff_ref, klo_t_ref, khi_t_ref,
                     gt_hbm, ci_hbm, ids_hbm, opa_hbm,
                     out_ref, filt_ref, count_ref,
                     blocked, filt, gt_buf, ci_buf, ids_buf, opa_buf,
                     sems):
    """HBM transparent occlusion: any-opaque-hit + transparency product
    with packed 4-candidate selection + deep prefetch."""
    o8 = o_ref[:, sl].T
    d8 = dir_ref[:, sl].T
    skip = skip_ref[0:1, sl].T
    ldist = ldist_ref[0:1, sl].T

    blocked[:] = jnp.zeros((RAY_BLOCK, 1), jnp.int32)
    filt[:] = jnp.ones((RAY_BLOCK, 1), f32)
    n_eff = neff_ref[0]

    emin = _entry_min_all(d, o8, d8, klo_t_ref, khi_t_ref)   # (1, ncp)
    ncp = emin.shape[1]
    posi = jax.lax.broadcasted_iota(jnp.int32, (1, ncp), 1)
    SENT = jnp.int32((1 << 14) - 1)
    arrs_hbm = (gt_hbm, ci_hbm, ids_hbm, opa_hbm)
    bufs = (gt_buf, ci_buf, ids_buf, opa_buf)

    def find4(k0v):
        lmax = jnp.max(jnp.where(blocked[:] == 0, ldist, 0.0),
                       axis=0, keepdims=True)                   # (1, 1)
        cand = (emin < lmax) & (posi >= k0v) & (posi < n_eff)
        cp = jnp.where(cand, posi, SENT)
        cs = []
        for _ in range(4):
            c = jnp.min(cp, axis=1, keepdims=True)
            cs.append(c)
            cp = jnp.where(posi > c, cp, SENT)
        return cs[0] * (SENT + 1) + cs[1], cs[2] * (SENT + 1) + cs[3]

    def unpack(p12, p34):
        return (p12 // (SENT + 1), p12 % (SENT + 1),
                p34 // (SENT + 1), p34 % (SENT + 1))

    def fetch4(ks, base):
        for j, kj in enumerate(ks):
            @pl.when(kj < SENT)
            def _(kj=kj, j=j):
                _hbm_fetch_t(arrs_hbm, bufs, sems, order_ref[kj], base + j)

    def process4(ks, base, visited):
        for j, kj in enumerate(ks):
            @pl.when(kj < SENT)
            def _(kj=kj, j=j):
                slot = base + j
                _hbm_wait_t(arrs_hbm, bufs, sems, slot)
                t, valid = _chunk_hits_vals(
                    d, ck, False, gt_buf[slot], ci_buf[slot],
                    ids_buf[slot][0:1, :], o8, d8, skip)
                valid &= t < ldist
                op = opa_buf[slot][0:1, :]
                opaq = op >= 1.0
                hit = jnp.any(valid & opaq, axis=1, keepdims=True)
                blocked[:] = jnp.where(hit, 1, blocked[:])
                tr = valid & jnp.logical_not(opaq)
                # binary-tree lane product (no Mosaic reduce_prod lowering)
                v = jnp.where(tr, 1.0 - op, 1.0)
                w = ck
                while w > 1:
                    assert w % 2 == 0
                    w //= 2
                    v = v[:, :w] * v[:, w:2 * w]
                filt[:] = filt[:] * v
            visited = visited + (kj < SENT).astype(jnp.int32)
        return visited

    i12, i34 = find4(jnp.zeros((1, 1), jnp.int32))
    iv12 = i12[0, 0]
    iv34 = i34[0, 0]
    fetch4(unpack(iv12, iv34), jnp.int32(0))

    def body(state):
        p12, p34, base, _, visited = state
        ks = unpack(p12, p34)
        n12, n34 = find4(jnp.maximum(ks[3], ks[0]) + 1)
        nv12 = n12[0, 0]
        nv34 = n34[0, 0]
        nbase = 4 - base
        fetch4(unpack(nv12, nv34), nbase)
        visited = process4(ks, base, visited)
        return nv12, nv34, nbase, nv12 // (SENT + 1) < SENT, visited

    _, _, _, _, visited = jax.lax.while_loop(
        lambda s: s[3], body,
        (iv12, iv34, jnp.int32(0), iv12 // (SENT + 1) < SENT, jnp.int32(0)))
    out_ref[0:1, sl] = blocked[:].T
    filt_ref[0:1, sl] = filt[:].T
    count_ref[0:1, sl] = jnp.full((1, RAY_BLOCK), visited, jnp.int32)


@partial(jax.jit, static_argnames=("d",))
def occluded_transparent_hbm(res, o, dirs, ldist, skip, d, order=None):
    """occluded_transparent for HBM-resident pools."""
    R = o.shape[0]
    nc, pr, ck = res["gt"].shape
    _check_nc(nc)
    ni = R // RAY_BLOCK
    SB = _occ_sub_blocks(ni)
    RB = SB * RAY_BLOCK
    if order is None:
        order = res["base_order"]
    # lane-major boundary (see nearest_hit)
    o8t = jnp.pad(o.T, ((0, C_PAD - d), (0, 0)))
    d8t = jnp.pad(dirs.T, ((0, C_PAD - d), (0, 0)))
    n_eff = jnp.asarray(res["n_eff"], jnp.int32).reshape((1,))
    klo_t, khi_t = _order_boxes(res, order, d)
    ncp = klo_t.shape[1]
    blive = (jnp.max(ldist.reshape(ni, RAY_BLOCK), axis=1) > 0) \
        .astype(jnp.int32)

    blk = lambda shape: pl.BlockSpec(shape, lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    out, filt, counts = pl.pallas_call(
        partial(_occl_t_hbm_kernel, d, ck, SB),
        grid=(ni // SB,),
        interpret=_interpret(),
        compiler_params=_cparams(stack_bytes=_occ_stack_bytes(SB)),
        in_specs=[
            blk((C_PAD, RB)), blk((C_PAD, RB)),
            blk((1, RB)), blk((1, RB)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),      # blive
            pl.BlockSpec((C_PAD, ncp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C_PAD, ncp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[blk((1, RB)), blk((1, RB)),
                   blk((1, RB))],
        out_shape=[
            jax.ShapeDtypeStruct((1, R), jnp.int32),
            jax.ShapeDtypeStruct((1, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((RAY_BLOCK, 1), jnp.int32),
            pltpu.VMEM((RAY_BLOCK, 1), jnp.float32),
            pltpu.VMEM((8, pr, ck), jnp.float32),
            pltpu.VMEM((8, C_PAD, ck), jnp.float32),
            pltpu.VMEM((8, C_PAD, ck), jnp.int32),
            pltpu.VMEM((8, C_PAD, ck), jnp.float32),
            pltpu.SemaphoreType.DMA((8, 4)),
        ],
    )(o8t, d8t, skip[None, :], ldist[None, :], order, n_eff, blive,
      klo_t, khi_t, res["gt"], res["ci"], res["ids"], res["opa"])
    return out[0] != 0, filt[0], counts[0, ::RAY_BLOCK]
