"""Interleaved A/B of the per-frame device-argument cache
(wavefront._frame_args) on the flagship orbit.

The cache avoids rebuilding ~10 tiny jnp arrays (dyn/camera/fov/base)
per dispatch — pure host glue + small uploads through the tunneled
link, so the frame pixels are bit-identical by construction (same
device buffers reused).  Run on the real chip:

    python scripts/argcache_ab.py [frames] [rounds]

Alternates cached / uncached ORBIT passes in one process (same window)
and prints min-of-rounds ms/frame for each arm.
"""
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 12
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
W = H = 1024


def main():
    import jax.numpy as jnp
    from ntracer import NTracer, Material, ImageFormat, Channel
    from ntracer_tpu.engine import wavefront
    from polytope import polytope_vertices, hull_prototypes

    nt = NTracer(4)
    scene = nt.build_composite_scene(
        hull_prototypes(nt, polytope_vertices([5, 3, 3]),
                        Material((1, 0.5, 0.5))))
    cam_distance = -4.0
    camera = nt.Camera()
    camera.translate(nt.Vector.axis(2, cam_distance))
    scene.set_camera(camera)
    scene.set_fov(0.8)
    fmt = ImageFormat(W, H, [Channel(8, 1, 0, 0), Channel(8, 0, 1, 0),
                             Channel(8, 0, 0, 1)])
    incr = 2 * math.pi / 64
    hcoef = 1 / math.sqrt(3)

    def advance():
        a2 = (camera.axes[0] + camera.axes[1] + camera.axes[3]) * hcoef
        camera.transform(nt.Matrix.rotation(camera.axes[2], a2, incr))
        camera.normalize()
        camera.origin = camera.axes[2] * cam_distance
        scene.set_camera(camera)

    def sync(dev):
        return float(jnp.sum(dev[:64].astype(jnp.int32)))

    sync(wavefront.frame_device_arrays(scene, fmt))  # compile + warm

    def orbit_pass():
        t0 = time.perf_counter()
        last = None
        for _ in range(FRAMES):
            last = wavefront.frame_device_arrays(scene, fmt)
            advance()
        sync(last)
        return (time.perf_counter() - t0) / FRAMES * 1e3

    best = {"cached": float("inf"), "uncached": float("inf")}
    for r in range(ROUNDS):
        for arm in ("cached", "uncached"):
            if arm == "uncached":
                os.environ["NTRACER_NO_ARGCACHE"] = "1"
            else:
                os.environ.pop("NTRACER_NO_ARGCACHE", None)
            ms = orbit_pass()
            best[arm] = min(best[arm], ms)
            print(f"round {r} {arm:9s} {ms:7.2f} ms/frame", flush=True)
    os.environ.pop("NTRACER_NO_ARGCACHE", None)
    print(f"min-of-rounds: cached {best['cached']:.2f} ms  "
          f"uncached {best['uncached']:.2f} ms  "
          f"delta {best['uncached'] - best['cached']:+.2f} ms")


if __name__ == "__main__":
    main()
