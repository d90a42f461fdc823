"""Pallas kernel vs XLA path (interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from ntracer_tpu.wrapper import NTracer
from ntracer_tpu.render import Material
from ntracer_tpu.engine import wavefront
from ntracer_tpu.engine import pallas_kernels as pk


def _scene():
    nt = NTracer(3)
    mat = Material((1, 0.5, 0.5))
    rng = np.random.RandomState(5)
    protos = []
    for _ in range(40):
        base = rng.uniform(-2, 2, 3)
        pts = [nt.Vector(*(base + rng.uniform(-0.8, 0.8, 3)))
               for _ in range(3)]
        protos.append(nt.TrianglePrototype(pts, mat))
    scene = nt.build_composite_scene(protos)
    cam = nt.Camera()
    cam.translate(nt.Vector.axis(2, -8))
    scene.set_camera(cam)
    return scene


def _kern_and_rays(scene, n):
    cfg, device, flat = wavefront.get_device_scene(scene)
    arrs = {k: np.asarray(v) for k, v in device.items()}
    kern = pk.prepare_tri_arrays(
        arrs["tri_p1"], arrs["tri_fn"], arrs["tri_en"], arrs["tri_dc"],
        flat.arrays["tri_lo"], flat.arrays["tri_hi"], cfg.d)
    kern = {k: jnp.asarray(v) for k, v in kern.items()}
    side = 32
    idx = np.arange(n)
    xs = jnp.asarray((idx % side).astype(np.float32))
    ys = jnp.asarray((idx // side).astype(np.float32))
    scene._set_view_size(side, side)
    fov = wavefront._fov_params(side, side, scene.fov)
    o, dirs = wavefront.make_rays(jnp.asarray(scene._cam._origin),
                                  jnp.asarray(scene._cam._t), *fov, xs, ys)
    return cfg, device, kern, o, dirs


def test_nearest_hit_matches_xla_path():
    scene = _scene()
    cfg, device, kern, o, dirs = _kern_and_rays(scene, pk.RAY_BLOCK)
    skip = jnp.full((pk.RAY_BLOCK,), -1, jnp.int32)

    kt, kid = pk.nearest_hit(kern, o, dirs, skip, cfg.d)
    res = wavefront.trace_pool(device, cfg, o, dirs, skip)

    kid = np.asarray(kid)
    jid = np.asarray(res["pid"])
    assert (kid >= 0).sum() > 10  # scene actually hit
    assert np.array_equal(kid >= 0, jid >= 0)
    m = kid >= 0
    assert (kid[m] == jid[m]).mean() == 1.0
    assert np.abs(np.asarray(kt)[m] - np.asarray(res["t"])[m]).max() < 1e-5


def test_occluded_matches_xla_path():
    scene = _scene()
    cfg, device, kern, o, dirs = _kern_and_rays(scene, pk.RAY_BLOCK)
    skip = jnp.full((pk.RAY_BLOCK,), -1, jnp.int32)
    ldist = jnp.full((pk.RAY_BLOCK,), 20.0, jnp.float32)

    kb = pk.occluded(kern, o, dirs, ldist, skip, cfg.d)
    jb, _ = wavefront.occlusion(device, cfg, o, dirs, ldist, skip)
    assert np.array_equal(np.asarray(kb), np.asarray(jb))


# ---------------------------------------------------------------------------
# resident-pool traversal kernels (resident_kernels.py)
# ---------------------------------------------------------------------------

from ntracer_tpu.engine import resident_kernels as rk


def _scene_big(n=1200, seed=7):
    """Several chunks' worth of triangles."""
    nt = NTracer(3)
    mat = Material((1, 0.5, 0.5))
    rng = np.random.RandomState(seed)
    protos = []
    for _ in range(n):
        base = rng.uniform(-2, 2, 3)
        pts = [nt.Vector(*(base + rng.uniform(-0.6, 0.6, 3)))
               for _ in range(3)]
        protos.append(nt.TrianglePrototype(pts, mat))
    scene = nt.build_composite_scene(protos)
    cam = nt.Camera()
    cam.translate(nt.Vector.axis(2, -8))
    scene.set_camera(cam)
    return scene


def _res_and_rays(scene, n):
    cfg, device, flat = wavefront.get_device_scene(scene)
    arrs = {k: np.asarray(v) for k, v in device.items()}
    res = rk.prepare_resident(
        arrs["tri_p1"], arrs["tri_fn"], arrs["tri_en"], arrs["tri_dc"],
        flat.arrays["tri_lo"], flat.arrays["tri_hi"], cfg.d)
    res = {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
           for k, v in res.items()}
    side = 32
    idx = np.arange(n)
    xs = jnp.asarray((idx % side).astype(np.float32))
    ys = jnp.asarray(((idx // side) % side).astype(np.float32))
    scene._set_view_size(side, side)
    fov = wavefront._fov_params(side, side, scene.fov)
    o, dirs = wavefront.make_rays(jnp.asarray(scene._cam._origin),
                                  jnp.asarray(scene._cam._t), *fov, xs, ys)
    return cfg, device, res, o, dirs


def test_resident_nearest_matches_xla_path():
    scene = _scene_big()
    n = rk.RAY_BLOCK * 2
    cfg, device, res, o, dirs = _res_and_rays(scene, n)
    skip = jnp.full((n,), -1, jnp.int32)

    ref = wavefront.trace_pool(device, cfg, o, dirs, skip)
    jid = np.asarray(ref["pid"])
    m = jid >= 0
    assert m.sum() > 100 and res["gt"].shape[0] >= 3

    # pool order
    kt, kid, counts = rk.nearest_hit(res, o, dirs, skip, cfg.d)
    kid = np.asarray(kid)
    assert np.array_equal(kid >= 0, m)
    assert (kid[m] == jid[m]).all()
    np.testing.assert_allclose(np.asarray(kt)[m], np.asarray(ref["t"])[m],
                               rtol=1e-6)

    # front-to-back order with early-exit bound (shared origin)
    order, dmin = rk.chunk_order(res["klo"], res["khi"],
                                 jnp.asarray(scene._cam._origin, jnp.float32))
    kt2, kid2, counts2 = rk.nearest_hit(res, o, dirs, skip, cfg.d,
                                        order=order, dmin=dmin)
    kid2 = np.asarray(kid2)
    assert np.array_equal(kid2 >= 0, m)
    assert (kid2[m] == jid[m]).all()

    # compaction: half the rays inactive, sorted live-first by the caller
    active = np.zeros(n, bool)
    active[: rk.RAY_BLOCK] = True
    kt3, kid3, counts3 = rk.nearest_hit(res, o, dirs, skip, cfg.d,
                                        active=jnp.asarray(active))
    kid3 = np.asarray(kid3)
    assert (kid3[~active] == -1).all()
    assert (kid3[active & m] == jid[active & m]).all()
    # the dead trailing block exits its walk immediately
    assert int(np.asarray(counts3)[1]) == 0


def test_resident_payload_epilogue():
    """The in-kernel payload epilogue (VERDICT-r3 #1) returns the same
    winners as the base kernel plus bit-identical [fn, mat, gid] rows —
    the hit-geometry data the caller previously recovered with an
    ~8 ms slot-pack gather."""
    scene = _scene_big()
    n = rk.RAY_BLOCK * 2
    cfg, device, flat = wavefront.get_device_scene(scene)
    _, _, res, o, dirs = _res_and_rays(scene, n)
    arrs = {k: np.asarray(v) for k, v in device.items()}
    # rebuild with the material row the payload epilogue reads
    resm = rk.prepare_resident(
        arrs["tri_p1"], arrs["tri_fn"], arrs["tri_en"], arrs["tri_dc"],
        flat.arrays["tri_lo"], flat.arrays["tri_hi"], cfg.d,
        tri_mat=arrs["tri_mat"])
    resm = {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
            for k, v in resm.items()}
    skip = jnp.full((n,), -1, jnp.int32)

    kt, kid, counts = rk.nearest_hit(resm, o, dirs, skip, cfg.d)
    pt, pid, pay, pcounts = rk.nearest_hit(resm, o, dirs, skip, cfg.d,
                                           payload=True)
    kid = np.asarray(kid)
    pid = np.asarray(pid)
    pay = np.asarray(pay)
    d = cfg.d
    assert pay.shape == (n, rk.payload_width(d))
    assert np.array_equal(pid, kid)
    np.testing.assert_array_equal(np.asarray(pt), np.asarray(kt))
    m = kid >= 0
    assert m.sum() > 100
    # payload rows match the pool arrays exactly
    np.testing.assert_array_equal(pay[m, :d], arrs["tri_fn"][kid[m]])
    np.testing.assert_array_equal(pay[m, d].astype(np.int32),
                                  arrs["tri_mat"][kid[m]])
    np.testing.assert_array_equal(pay[m, d + 1].astype(np.int32), kid[m])
    # misses carry the sentinel payload
    assert (pay[~m, d + 1] == -1).all() and (pay[~m, :d] == 0).all()
    # same walk, same instrumentation
    np.testing.assert_array_equal(np.asarray(pcounts), np.asarray(counts))


def test_resident_occlusion_matches_xla_path():
    scene = _scene_big()
    n = rk.RAY_BLOCK
    cfg, device, res, o, dirs = _res_and_rays(scene, n)
    skip = jnp.full((n,), -1, jnp.int32)

    ref = wavefront.trace_pool(device, cfg, o, dirs, skip)
    m = np.asarray(ref["pid"]) >= 0
    point = jnp.asarray(np.asarray(ref["point"]))
    ld = jnp.asarray(np.where(m, 6.0, 0.0).astype(np.float32))
    up = jnp.asarray(np.tile(np.array([[0, 1, 0]], np.float32), (n, 1)))

    blocked, counts = rk.occluded(res, point, up, ld, ref["pid"], cfg.d)
    jb, _ = wavefront.occlusion(device, cfg, point, up, ld, ref["pid"])
    assert np.array_equal(np.asarray(blocked) & m, np.asarray(jb) & m)


def test_occluded_candidate_grouping_bit_identical():
    """Grouped candidate extraction (cand=2/4) walks a superset of the
    cand=1 schedule's chunks, but `blocked` is a monotone OR of exact
    per-ray ``t < ldist`` tests — results must be bit-identical; only
    the visit counters may grow (stale-bound tail visits)."""
    scene = _scene_big()
    n = rk.RAY_BLOCK
    cfg, device, res, o, dirs = _res_and_rays(scene, n)
    skip = jnp.full((n,), -1, jnp.int32)

    ref = wavefront.trace_pool(device, cfg, o, dirs, skip)
    m = np.asarray(ref["pid"]) >= 0
    point = jnp.asarray(np.asarray(ref["point"]))
    ld = jnp.asarray(np.where(m, 6.0, 0.0).astype(np.float32))
    up = jnp.asarray(np.tile(np.array([[0, 1, 0]], np.float32), (n, 1)))

    b1, c1 = rk.occluded(res, point, up, ld, ref["pid"], cfg.d, cand=1)
    for cand in (2, 4):
        bg, cg = rk.occluded(res, point, up, ld, ref["pid"], cfg.d,
                             cand=cand)
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(bg))
        assert (np.asarray(cg) >= np.asarray(c1)).all()


def test_occluded_transparent_candidate_grouping():
    """Grouped candidates in the transparent occlusion walk: `blocked`
    bit-identical (monotone OR of exact tests); `filt` bit-identical on
    UNBLOCKED rays (extra visits contribute exact 1.0 factors there);
    blocked rays' filt is a documented don't-care (light only reaches
    where ~blocked)."""
    glass = Material((1, 0.7, 0.7), opacity=0.4)
    solid_m = Material((0.3, 0.8, 0.5))
    rng = np.random.RandomState(31)
    nt = NTracer(3)
    protos = []
    for i in range(600):
        base = rng.uniform(-2, 2, 3)
        pts = [nt.Vector(*(base + rng.uniform(-0.4, 0.4, 3)))
               for _ in range(3)]
        protos.append(nt.TrianglePrototype(pts, glass if i % 2 else solid_m))
    scene = nt.build_composite_scene(protos)
    cam = nt.Camera()
    cam.translate(nt.Vector(0, 0, -8))
    scene.set_camera(cam)

    n = rk.RAY_BLOCK
    cfg, device, res, o, dirs = _res_and_rays(scene, n)
    res = dict(res)
    opac = np.asarray(device["tri_opacity"])
    res = rk.add_opacity({k: np.asarray(v) if hasattr(v, "shape") else v
                          for k, v in res.items()}, opac)
    res = {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
           for k, v in res.items()}
    skip = jnp.full((n,), -1, jnp.int32)
    ref = wavefront.trace_pool(device, cfg, o, dirs, skip)
    m = np.asarray(ref["pid"]) >= 0
    point = jnp.asarray(np.asarray(ref["point"]))
    ld = jnp.asarray(np.where(m, 6.0, 0.0).astype(np.float32))
    up = jnp.asarray(np.tile(np.array([[0, 1, 0]], np.float32), (n, 1)))

    b1, f1, c1 = rk.occluded_transparent(res, point, up, ld, ref["pid"],
                                         cfg.d, cand=1)
    unb = m & ~np.asarray(b1)
    assert unb.any() and (m & np.asarray(b1)).any()
    for cand in (2, 4):
        bg, fg, cg = rk.occluded_transparent(res, point, up, ld,
                                             ref["pid"], cfg.d, cand=cand)
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(bg))
        np.testing.assert_array_equal(np.asarray(f1)[unb],
                                      np.asarray(fg)[unb])
        assert (np.asarray(cg) >= np.asarray(c1)).all()


def test_occlusion_cand_validation():
    """Explicit odd cand > 1 must raise (candidates pack two per 14-bit
    scalar); bad NTRACER_OCC_CAND env values warn and coerce instead of
    silently mislabeling a sweep."""
    import os
    import warnings

    import pytest

    with pytest.raises(ValueError, match="must be 1 or a positive even"):
        rk._check_cand(3)
    with pytest.raises(ValueError):
        rk._check_cand(0)
    assert rk._check_cand(1) == 1 and rk._check_cand(4) == 4

    for val, expect in (("3", 4), ("two", 4), ("-2", 1)):
        os.environ["NTRACER_OCC_CAND"] = val
        try:
            with warnings.catch_warnings(record=True) as w:
                warnings.simplefilter("always")
                assert rk._occ_cand() == expect
                assert w and "NTRACER_OCC_CAND" in str(w[0].message)
        finally:
            del os.environ["NTRACER_OCC_CAND"]


def test_engine_resident_path_matches_oracle(monkeypatch):
    """Full engine (render_strip_composite) through the resident kernels in
    interpreter mode, vs the scalar oracle — shadows + reflections exercise
    occlusion compaction and bounce-ray compaction."""
    monkeypatch.setenv("NTRACER_FORCE_KERNELS", "1")
    nt = NTracer(3)
    mat = Material((1, 0.6, 0.4), reflectivity=0.3)
    rng = np.random.RandomState(9)
    protos = []
    for _ in range(30):
        base = rng.uniform(-2, 2, 3)
        pts = [nt.Vector(*(base + rng.uniform(-0.8, 0.8, 3)))
               for _ in range(3)]
        protos.append(nt.TrianglePrototype(pts, mat))
    scene = nt.build_composite_scene(protos)
    cam = nt.Camera()
    cam.translate(nt.Vector.axis(2, -8))
    scene.set_camera(cam)
    scene.add_light(nt.PointLight(nt.Vector(0, 4, -4), (1, 0.8, 0.6)))
    # a directional light exercises the finite occlusion cutoff (the
    # REAL_MAX ldist is clamped to the pool-AABB exit inside occlusion())
    scene.add_light(nt.GlobalLight(nt.Vector(0.3, -1, 0.2), (0.3, 0.3, 0.3)))
    scene.set_shadows(True)

    cfg, device, _ = wavefront.get_device_scene(scene)
    assert "res_gt" in device  # resident path actually selected

    class _Fmt:
        width = height = 24

    w = h = 24
    scene._set_view_size(w, h)
    eng = wavefront.render_strip_composite(scene, _Fmt(), 0, h)
    rng = np.random.RandomState(1)
    worst = 0.0
    for _ in range(25):
        x, y = int(rng.randint(w)), int(rng.randint(h))
        oc = scene._pixel_color(x, y)
        worst = max(worst, float(np.abs(oc - eng[y, x]).max()))
    assert worst < 5e-5, f"worst resident-engine-vs-oracle diff {worst}"


def test_ray_colors_stats(monkeypatch):
    """with_stats returns instrumentation counters (VERDICT r1 item 2)."""
    monkeypatch.setenv("NTRACER_FORCE_KERNELS", "1")
    import jax
    scene = _scene_big(n=300)
    scene.add_light(NTracer(3).PointLight(
        NTracer(3).Vector(0, 4, -4), (1, 0.8, 0.6)))
    scene.set_shadows(True)
    cfg, device, _ = wavefront.get_device_scene(scene)
    n = rk.RAY_BLOCK
    side = 32
    idx = np.arange(n)
    xs = jnp.asarray((idx % side).astype(np.float32))
    ys = jnp.asarray(((idx // side) % side).astype(np.float32))
    scene._set_view_size(side, side)
    fov = wavefront._fov_params(side, side, scene.fov)
    o, dirs = wavefront.make_rays(jnp.asarray(scene._cam._origin),
                                  jnp.asarray(scene._cam._t), *fov, xs, ys)
    dyn = wavefront._scene_dyn(scene)
    colors, stats = wavefront.ray_colors(device, cfg, dyn, o, dirs,
                                         with_stats=True)
    stats = {k: int(v) for k, v in stats.items()}
    assert stats["rays_traced"] == n
    # the primary trace uses the streaming kernel (no chunk counter); the
    # shadow stage goes through the counting resident kernel
    assert 0 < stats["shadow_rays"] <= n
    assert stats["occl_chunks_visited"] >= 1


def test_transparent_resident_kernels_match_xla(monkeypatch):
    """Transparent-pool resident kernels (K slots in scratch) vs the XLA
    K-buffer path, through the full engine in interpreter mode."""
    monkeypatch.setenv("NTRACER_FORCE_KERNELS", "1")
    glass = Material((1, 0.7, 0.7), opacity=0.4)
    solid_m = Material((0.3, 0.8, 0.5))
    rng = np.random.RandomState(21)
    nt = NTracer(3)
    protos = []
    for i in range(200):
        base = rng.uniform(-2, 2, 3)
        pts = [nt.Vector(*(base + rng.uniform(-0.8, 0.8, 3)))
               for _ in range(3)]
        protos.append(nt.TrianglePrototype(pts, glass if i % 2 else solid_m))
    scene = nt.build_composite_scene(protos)
    cam = nt.Camera()
    cam.translate(nt.Vector(0, 0, -8))
    scene.set_camera(cam)
    scene.add_light(nt.PointLight(nt.Vector(0, 4, -4), (1, 0.8, 0.6)))
    scene.set_shadows(True)

    cfg, device, flat = wavefront.get_device_scene(scene)
    assert "res_opa" in device  # transparent kernel layouts prepared

    w = h = 24

    class F:
        width = w
        height = h

    scene._set_view_size(w, h)
    eng = wavefront.render_strip_composite(scene, F, 0, h)
    no_k = {k: v for k, v in device.items()
            if not k.startswith(("res_", "kern_"))}
    scene._device_cache = (cfg, no_k, flat)
    eng2 = wavefront.render_strip_composite(scene, F, 0, h)
    assert float(np.abs(eng - eng2).max()) < 2e-5


def test_hbm_resident_path_matches_xla(monkeypatch):
    """Pools beyond the VMEM budget stream chunks through the in-kernel
    double buffer (nearest_hit_hbm / occluded_hbm); results must match the
    XLA path through the full engine."""
    monkeypatch.setenv("NTRACER_FORCE_KERNELS", "1")
    monkeypatch.setattr(rk, "POOL_VMEM_BUDGET", 1024)
    nt = NTracer(3)
    mat = Material((1, 0.6, 0.4), reflectivity=0.3)
    rng = np.random.RandomState(9)
    protos = []
    for _ in range(1500):
        base = rng.uniform(-2, 2, 3)
        pts = [nt.Vector(*(base + rng.uniform(-0.4, 0.4, 3)))
               for _ in range(3)]
        protos.append(nt.TrianglePrototype(pts, mat))
    scene = nt.build_composite_scene(protos)
    cam = nt.Camera()
    cam.translate(nt.Vector.axis(2, -8))
    scene.set_camera(cam)
    scene.add_light(nt.PointLight(nt.Vector(0, 4, -4), (1, 0.8, 0.6)))
    scene.set_shadows(True)

    cfg, device, flat = wavefront.get_device_scene(scene)
    assert "res_is_hbm" in device

    w = h = 24

    class F:
        width = w
        height = h

    scene._set_view_size(w, h)
    eng = wavefront.render_strip_composite(scene, F, 0, h)
    no_k = {k: v for k, v in device.items()
            if not k.startswith(("res_", "kern_"))}
    scene._device_cache = (cfg, no_k, flat)
    eng2 = wavefront.render_strip_composite(scene, F, 0, h)
    assert float(np.abs(eng - eng2).max()) < 2e-5


def test_shared_origin_rows_bit_identical():
    """The shared-origin fast path (per-triangle origin dots hoisted out of
    the inner loop, pallas_kernels.shared_rows / resident_kernels.
    shared_rows_res) must produce BIT-IDENTICAL hits and distances to the
    per-ray kernels: it computes the same float ops in the same order, once
    per frame instead of once per ray."""
    scene = _scene_big()
    n = rk.RAY_BLOCK * 2
    cfg, device, res, o, dirs = _res_and_rays(scene, n)
    skip = jnp.full((n,), -1, jnp.int32)
    origin = jnp.asarray(scene._cam._origin, jnp.float32)

    order, dmin = rk.chunk_order(res["klo"], res["khi"], origin)
    kt, kid, _ = rk.nearest_hit(res, o, dirs, skip, cfg.d,
                                order=order, dmin=dmin)
    sh = rk.shared_rows_res(res["gt"], res["ci"], origin, cfg.d)
    kt2, kid2, _ = rk.nearest_hit(res, o, dirs, skip, cfg.d,
                                  order=order, dmin=dmin, sh=sh)
    assert np.array_equal(np.asarray(kid), np.asarray(kid2))
    m = np.asarray(kid) >= 0
    assert np.array_equal(np.asarray(kt)[m], np.asarray(kt2)[m])  # bitwise

    # grid kernel variant
    arrs = {k: np.asarray(v) for k, v in device.items()}
    flat_lo = arrs["ck_lo"]
    kern = pk.prepare_tri_arrays(
        arrs["tri_p1"], arrs["tri_fn"], arrs["tri_en"], arrs["tri_dc"],
        np.repeat(flat_lo, wavefront.CHUNK, axis=0)[: cfg.n_tris],
        np.repeat(arrs["ck_hi"], wavefront.CHUNK, axis=0)[: cfg.n_tris],
        cfg.d)
    kern = {k: jnp.asarray(v) for k, v in kern.items()}
    gt_, gid_ = pk.nearest_hit(kern, o, dirs, skip, cfg.d)
    shg = pk.shared_rows(kern["gt"], kern["ci"], origin, cfg.d)
    gt2_, gid2_ = pk.nearest_hit(kern, o, dirs, skip, cfg.d, sh=shg)
    assert np.array_equal(np.asarray(gid_), np.asarray(gid2_))
    mg = np.asarray(gid_) >= 0
    assert np.array_equal(np.asarray(gt_)[mg], np.asarray(gt2_)[mg])


def test_transparent_hbm_path_matches_xla(monkeypatch):
    """Transparent pools beyond the VMEM budget run the HBM streaming
    K-buffer kernels (nearest_hit_transparent_hbm /
    occluded_transparent_hbm, VERDICT r2 item 5) instead of falling back
    to the XLA scan; results must match the XLA path through the full
    engine.  The scene is built unbatched so the oracle/XLA transparent
    semantics are width-independent (PARITY.md defect 7)."""
    monkeypatch.setenv("NTRACER_FORCE_KERNELS", "1")
    monkeypatch.setattr(rk, "POOL_VMEM_BUDGET", 1024)
    glass = Material((1, 0.7, 0.7), opacity=0.4)
    solid_m = Material((0.3, 0.8, 0.5))
    rng = np.random.RandomState(23)
    nt = NTracer(3)
    protos = []
    for i in range(1200):
        base = rng.uniform(-2, 2, 3)
        pts = [nt.Vector(*(base + rng.uniform(-0.4, 0.4, 3)))
               for _ in range(3)]
        protos.append(nt.TrianglePrototype(pts, glass if i % 2 else solid_m))
    scene = nt.build_composite_scene(protos)
    cam = nt.Camera()
    cam.translate(nt.Vector(0, 0, -8))
    scene.set_camera(cam)
    scene.add_light(nt.PointLight(nt.Vector(0, 4, -4), (1, 0.8, 0.6)))
    scene.set_shadows(True)

    cfg, device, flat = wavefront.get_device_scene(scene)
    assert "res_is_hbm" in device and "res_opa" in device

    w = h = 24

    class F:
        width = w
        height = h

    scene._set_view_size(w, h)
    eng = wavefront.render_strip_composite(scene, F, 0, h)
    no_k = {k: v for k, v in device.items()
            if not k.startswith(("res_", "kern_"))}
    scene._device_cache = (cfg, no_k, flat)
    eng2 = wavefront.render_strip_composite(scene, F, 0, h)
    assert float(np.abs(eng - eng2).max()) < 2e-5


def test_oversized_pool_refuses_packed_walks(monkeypatch):
    """Pools with >= 2^14-1 chunks must refuse the packed candidate walks
    (14-bit position encoding would collide with the sentinel) and the
    scene build must fall back to the XLA scan instead of preparing
    kernel layouts (ADVICE r2)."""
    import pytest as _pytest
    with _pytest.raises(ValueError, match="packed candidate"):
        rk._check_nc(rk.MAX_CHUNKS + 1)

    # the scene-build path: force tiny HBM chunks so the bin count would
    # exceed the limit, and verify the layouts are NOT prepared
    monkeypatch.setenv("NTRACER_FORCE_KERNELS", "1")
    monkeypatch.setattr(rk, "POOL_VMEM_BUDGET", 1024)   # force HBM branch
    monkeypatch.setattr(rk, "HBM_CK", 1)                # 1 tri per chunk
    monkeypatch.setattr(rk, "MAX_CHUNKS", 64)           # tiny limit
    nt = NTracer(3)
    mat = Material((1, 0.5, 0.5))
    rng = np.random.RandomState(3)
    protos = []
    for _ in range(600):
        base = rng.uniform(-2, 2, 3)
        pts = [nt.Vector(*(base + rng.uniform(-0.5, 0.5, 3)))
               for _ in range(3)]
        protos.append(nt.TrianglePrototype(pts, mat))
    scene = nt.build_composite_scene(protos)
    cfg, device, _ = wavefront.get_device_scene(scene)
    assert "res_gt" not in device  # fell back to the XLA scan


def test_resident_pool_budget_policy():
    """Round-4 residency policy: pools up to POOL_VMEM_BUDGET (48 MiB
    default; the 100k mesh's ~12 MiB measured 1.68x faster resident than
    HBM-streamed, scripts/mesh_resident_ab.py) stay VMEM-resident, and
    _cparams derives a Mosaic scoped-vmem limit from the actual layout
    instead of the ~16 MiB default."""
    assert rk.POOL_VMEM_BUDGET == 48 * 1024 * 1024
    # the 100k-tri d=3 pool is now under budget (was over the old 8 MiB)
    assert rk.pool_vmem_bytes(100000, 3) <= rk.POOL_VMEM_BUDGET

    # small pools keep Mosaic's default limit (byte-identical to r1-3)
    assert rk._cparams(4 * 2**20).vmem_limit_bytes in (None,
                                                       rk.VMEM_LIMIT_BYTES)
    # large pools get layout + stack/slab headroom, capped below VMEM
    got = rk._cparams(13 * 2**20).vmem_limit_bytes
    assert got == 37 * 2**20
    assert rk._cparams(200 * 2**20).vmem_limit_bytes == 110 * 2**20

    # _pool_bytes counts exactly what the kernels ship to VMEM
    res = {"gt": np.zeros((4, 16, 128), np.float32),
           "ci": np.zeros((4, 8, 128), np.float32),
           "ids": np.zeros((4, 8, 128), np.float32)}
    assert rk._pool_bytes(res) == (4 * 16 * 128 + 2 * 4 * 8 * 128) * 4
    res["opa"] = np.zeros((4, 8, 128), np.float32)
    assert rk._pool_bytes(res) == (4 * 16 * 128 + 3 * 4 * 8 * 128) * 4


def test_resident_raw_slot_matches_gid_map(monkeypatch):
    """raw_slot returns the winning SLOT (chunk*ck + lane); mapping it
    through ids row 0 reproduces the default gid output, and the
    slot-pack gather path (the production frame path — measured cheaper
    than the in-kernel payload epilogue, scripts/stage_split.py)
    recovers identical fn/mat/gid rows."""
    monkeypatch.setenv("NTRACER_FORCE_KERNELS", "1")
    scene = _scene_big()
    n = rk.RAY_BLOCK * 2
    cfg, device, res, o, dirs = _res_and_rays(scene, n)
    # the slot_pack rows describe the DEVICE layout (centroid bins), so
    # query that layout, not _res_and_rays' pool-order one
    res = wavefront._res_dict(device)
    arrs = {k: np.asarray(v) for k, v in device.items()}
    skip = jnp.full((n,), -1, jnp.int32)

    kt, kid, counts = rk.nearest_hit(res, o, dirs, skip, cfg.d)
    rt, slot, rcounts = rk.nearest_hit(res, o, dirs, skip, cfg.d,
                                       raw_slot=True)
    slot = np.asarray(slot)
    kid = np.asarray(kid)
    np.testing.assert_array_equal(np.asarray(rt), np.asarray(kt))
    np.testing.assert_array_equal(np.asarray(rcounts), np.asarray(counts))
    ids = np.asarray(res["ids"])[:, 0, :].reshape(-1)
    m = slot >= 0
    assert np.array_equal(m, kid >= 0) and m.sum() > 100
    np.testing.assert_array_equal(ids[slot[m]], kid[m])

    # the engine's slot-indexed packed rows recover fn/mat/gid in 1 gather
    sp = arrs["res_slot_pack"]
    d = cfg.d
    row = sp[np.clip(slot, 0, None)]
    np.testing.assert_array_equal(row[m, d + 1].astype(np.int32), kid[m])
    np.testing.assert_array_equal(row[m, :d], arrs["tri_fn"][kid[m]])
    np.testing.assert_array_equal(row[m, d].astype(np.int32),
                                  arrs["tri_mat"][kid[m]])


def test_scene_exit_lane_major_twin_bitwise():
    """_scene_exit_T must equal the row-layout _scene_exit BITWISE: the
    elementwise math is identical and the d-axis min/max reductions are
    rounding-free in any order (resident_kernels docstring)."""
    import numpy as np
    import jax.numpy as jnp
    from ntracer_tpu.engine import resident_kernels as rk

    rng = np.random.default_rng(7)
    for d in (3, 4, 6, 8):
        o = rng.normal(size=(257, d)).astype(np.float32)
        dirs = rng.normal(size=(257, d)).astype(np.float32)
        # exercise the parallel-component branch and inside/outside rays
        dirs[::7, 0] = 0.0
        o[::5] *= 0.05
        b_lo = np.full((d,), -1.5, np.float32)
        b_hi = np.full((d,), 1.5, np.float32)
        row = np.asarray(rk._scene_exit(jnp.asarray(o), jnp.asarray(dirs),
                                        jnp.asarray(b_lo), jnp.asarray(b_hi)))
        lane = np.asarray(rk._scene_exit_T(jnp.asarray(o.T),
                                           jnp.asarray(dirs.T),
                                           jnp.asarray(b_lo),
                                           jnp.asarray(b_hi)))
        assert np.array_equal(row, lane)


def test_occ_sub_blocks_vmem_clamp(monkeypatch):
    """The occlusion SB must shrink when pool + unrolled stacks +
    headroom exceed the _cparams scoped-vmem ceiling (at RAY_BLOCK=1024
    a 48 MB pool with 8 walks would OOM at Mosaic compile time); the
    measured RAY_BLOCK=512 configs keep SB=8 unchanged."""
    from ntracer_tpu.engine import resident_kernels as rk

    monkeypatch.delenv("NTRACER_OCC_SB", raising=False)
    pool48 = 48 * 1024 * 1024
    # default width: 48 MB pool still fits 8 unrolled walks
    assert rk._occ_sub_blocks(2048, pool48) == 8
    assert rk._occ_sub_blocks(2048, 0) == 8
    # doubled walk width (the NTRACER_RAY_BLOCK=1024 sweep knob): stacks
    # double, the 48 MB pool no longer fits SB=8 under the 110 MB cap
    monkeypatch.setattr(rk, "RAY_BLOCK", 1024)
    sb = rk._occ_sub_blocks(1024, pool48)
    assert sb < 8
    cap = 110 * 1024 * 1024
    assert pool48 + rk._occ_stack_bytes(sb) + 24 * 1024 * 1024 <= cap
    # env override is clamped to the budget maximum too
    monkeypatch.setenv("NTRACER_OCC_SB", "8")
    assert rk._occ_sub_blocks(1024, pool48) <= sb
