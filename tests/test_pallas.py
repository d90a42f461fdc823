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
