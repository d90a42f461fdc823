#!/usr/bin/env python
"""Flagship benchmark: 4-D 120-cell ({5,3,3}) at 1024x1024, rotating camera.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Before timing, this runs scripts/tpu_parity.py (the on-hardware
engine-vs-oracle gate) and embeds its mismatch count — a Mosaic/TPU-only
numerics regression fails loudly here instead of shipping a fast wrong
kernel.  ``vs_baseline`` compares against the C++ reference measured IN
THE SAME HOST WINDOW (the host CPU throttles 2-3x between windows, so
cross-window ratios are meaningless — BASELINE.md): the reference is
(re)built via scripts/build_reference.sh and its own polytope.py benchmark
runs first.  Only if that fails does the stored round-1 constant apply,
and the JSON says so in ``baseline_source``.
"""

import json
import math
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# default platform (TPU when available); persistent compile cache
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

REF_SEC_PER_FRAME_STORED = 0.959  # C++ reference, round-1 window, 1024x1024
W = H = 1024
FRAMES = 8
REF_BUILD = "/tmp/refbuild"
REF_LIB = os.path.join(REF_BUILD, "build", "lib.linux-x86_64-cpython-312")


def run_tpu_parity():
    """Hardware gate: returns (mismatches, ok) or (-1, False) on failure.

    The gate writes its artifact fresh each run; a crashed run must NOT
    fall back to a stale committed PARITY_TPU.json, so the output goes to
    a temp path and only replaces the repo artifact on success."""
    out_json = os.path.join(REPO, "PARITY_TPU.json")
    tmp_json = "/tmp/_parity_tpu_bench.json"
    try:
        if os.path.exists(tmp_json):
            os.remove(tmp_json)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "tpu_parity.py"),
             "--out", tmp_json],
            timeout=3600, capture_output=True)
        with open(tmp_json) as f:      # missing file -> except -> (-1, False)
            data = json.load(f)
        import shutil
        shutil.copy(tmp_json, out_json)
        mism = sum(r.get("mismatches", 0) for r in data.get("results", []))
        return mism, bool(data.get("ok"))
    except Exception:
        return -1, False


def measure_reference():
    """Same-window C++ reference sec/frame on the flagship config, or None."""
    try:
        if not os.path.isdir(REF_LIB):
            subprocess.run(
                ["sh", os.path.join(REPO, "scripts", "build_reference.sh")],
                timeout=1800, check=True, capture_output=True)
        env = dict(os.environ, SDL_VIDEODRIVER="dummy",
                   PYTHONPATH=REF_LIB)
        p = subprocess.run(
            [sys.executable, os.path.join(REF_BUILD, "scripts", "polytope.py"),
             "5", "3", "3", "--benchmark", "-s", "1024x1024", "-f", "4"],
            timeout=1800, capture_output=True, text=True, env=env,
            cwd=REF_BUILD)
        for line in p.stdout.splitlines():
            if line.startswith("time per frame:"):
                return float(line.split(":")[1].split()[0])
    except Exception:
        pass
    return None


def main():
    if os.environ.get("NTRACER_BENCH_FAST"):
        # dev-iteration mode: skip the parity gate + reference rebuild
        # (the driver's end-of-round run uses the full default path)
        parity_mism, parity_ok = -1, False
        ref_sec = None
    else:
        parity_mism, parity_ok = run_tpu_parity()
        ref_sec = measure_reference()
    baseline_source = "same-window" if ref_sec else "stored-round1"
    if ref_sec is None:
        ref_sec = REF_SEC_PER_FRAME_STORED

    from ntracer import NTracer, Material, ImageFormat, Channel, BlockingRenderer
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from polytope import polytope_vertices, hull_prototypes

    nt = NTracer(4)
    material = Material((1, 0.5, 0.5))
    verts = polytope_vertices([5, 3, 3])
    protos = hull_prototypes(nt, verts, material)
    scene = nt.build_composite_scene(protos)

    cam_distance = -4.0
    camera = nt.Camera()
    camera.translate(nt.Vector.axis(2, cam_distance))
    scene.set_camera(camera)
    scene.set_fov(0.8)

    fmt = ImageFormat(W, H, [Channel(8, 1, 0, 0), Channel(8, 0, 1, 0),
                             Channel(8, 0, 0, 1)])
    buf = bytearray(fmt.pitch * fmt.height)
    renderer = BlockingRenderer()

    incr = 2 * math.pi / FRAMES
    hcoef = 1 / math.sqrt(3)

    def advance():
        a2 = camera.axes[0] * hcoef + camera.axes[1] * hcoef \
            + camera.axes[3] * hcoef
        camera.transform(nt.Matrix.rotation(camera.axes[2], a2, incr))
        camera.normalize()
        camera.origin = camera.axes[2] * cam_distance
        scene.set_camera(camera)

    # warmup (compile)
    renderer.render(buf, fmt, scene)
    advance()

    total = 0.0
    for _ in range(FRAMES):
        t0 = time.perf_counter()
        renderer.render(buf, fmt, scene)
        total += time.perf_counter() - t0
        advance()

    sec_per_frame = total / FRAMES

    # --- on-device time (no host link): queue FRAMES dispatches, then pull
    # a 4-byte reduction of the last output (the device executes in order,
    # so the pull waits for the whole queue).  block_until_ready does not
    # reliably synchronize through the tunneled backend.
    import jax.numpy as jnp
    from ntracer_tpu.engine import wavefront

    def sync(dev):
        return float(jnp.sum(dev[:64].astype(jnp.int32)))

    sync(wavefront.frame_device_arrays(scene, fmt))  # compile + warm
    advance()
    # two passes over the orbit, keep the better average: the tunneled
    # link stalls in bursts (multi-second outliers) that would otherwise
    # pollute the compute-only number
    dev_sec = float("inf")
    for _pass in range(2):
        t0 = time.perf_counter()
        last = None
        for _ in range(FRAMES):
            last = wavefront.frame_device_arrays(scene, fmt)
            advance()
        sync(last)
        dev_sec = min(dev_sec, (time.perf_counter() - t0) / FRAMES)

    # per-stage counters, one frame (instrumentation.hpp analogue).
    # The camera sits at an orbit position here (the orbit loop advanced
    # it), so these are ORBIT counters; the axis-view counters are taken
    # below after the camera reset.  Recording both attributes the
    # orbit/fixed-view spread (extra chunk visits at oblique views).
    orbit_counters = wavefront.frame_stats(scene, W, H)
    orbit_cam = (jnp.asarray(scene._cam._origin), jnp.asarray(scene._cam._t))

    # trace vs non-trace split, same window (VERDICT-r3 #1 breakdown):
    # time the walk kernel alone on the full primary wavefront, compare
    # with the full frame.  Both min-of-rounds, interleaved with the
    # frame measurement above so the numbers share the window.
    from ntracer_tpu.engine import resident_kernels as rk
    # measure the split at the canonical axis view (the orbit leaves the
    # camera at an arbitrary orientation; stage_split.py uses this view)
    camera = nt.Camera()
    camera.translate(nt.Vector.axis(2, cam_distance))
    scene.set_camera(camera)
    cfg, device, _flat = wavefront.get_device_scene(scene)
    counters = wavefront.frame_stats(scene, W, H)   # axis view
    trace_ms = None
    frame_fixed_ms = None
    rtt_ms = None
    stage_ms = None
    orbit_trace_ms = None
    if "res_gt" in device:
        res = wavefront._res_dict(device)
        scene._set_view_size(W, H)
        fovp = wavefront._fov_params(W, H, scene.fov)
        xs, ys, _swz = wavefront._ray_coords(jnp.int32(0), W, count=W * H)
        nearest = rk.nearest_hit_hbm if "res_is_hbm" in device \
            else rk.nearest_hit

        import jax

        def make_trace(cam_origin, cam_t):
            """Walk-only program at a given camera (production path:
            raw slot; pctx computed inside the jit like the frame)."""
            @jax.jit
            def trace_only():
                o, dirs = wavefront.make_rays(
                    cam_origin, cam_t, fovp[0], fovp[1], fovp[2], xs, ys)
                skip = jnp.full((W * H,), -1, jnp.int32)
                pctx = wavefront.primary_ctx(device, cfg, cam_origin)
                t, slot, vis = nearest(
                    res, o, dirs, skip, cfg.d, raw_slot=True,
                    order=pctx["order"], dmin=pctx["dmin"],
                    sh=pctx["sh_res"])
                return t + slot
            return trace_only

        axis_cam = (jnp.asarray(scene._cam._origin),
                    jnp.asarray(scene._cam._t))
        trace_only = make_trace(*axis_cam)
        orbit_trace = make_trace(*orbit_cam)

        @jax.jit
        def raygen_only():
            o, dirs = wavefront.make_rays(
                axis_cam[0], axis_cam[1], fovp[0], fovp[1], fovp[2],
                xs, ys)
            # reduce instead of returning (R, d): a row-shaped OUTPUT
            # would pay the (8, 128)-tile padding materialization the
            # production path never does (the kernels take (d, R))
            return jnp.sum(o, axis=0) + jnp.sum(dirs, axis=0)

        n_tiles = -(-(W * H) // wavefront.TILE)
        dyn = wavefront._scene_dyn(scene)

        @jax.jit
        def frame_unpacked():
            # full shading pipeline, raw float colors: no device packing
            # AND no unswizzle (the key=None path unswizzles FLOAT rows,
            # which the packed path never does — using it here inflated
            # the device_pack stage by ~5 ms in BENCH_r04's window)
            pctx2 = wavefront.primary_ctx(device, cfg, axis_cam[0])
            count = n_tiles * wavefront.TILE
            xs2, ys2, _sw = wavefront._ray_coords(jnp.int32(0), W, count)
            o2, d2 = wavefront.make_rays(axis_cam[0], axis_cam[1],
                                         fovp[0], fovp[1], fovp[2],
                                         xs2, ys2)
            colors, _is_T = wavefront.ray_colors_packable(
                device, cfg, dyn, o2, d2, pctx=pctx2)
            return colors

        @jax.jit
        def noop():
            return jnp.zeros((64,), jnp.float32)

        for f in (trace_only, orbit_trace, raygen_only, frame_unpacked,
                  noop):
            sync(f())  # compile

        def timed_batch(f, n=4):
            # queue n dispatches, then one sync: the tunnel RTT (and its
            # multi-ms bursts) is amortized 1/n instead of being
            # subtracted per call, which round-4 measurements showed
            # swamps a per-call split on this link
            t0 = time.perf_counter()
            last = None
            for _ in range(n):
                last = f()
            sync(last)
            return (time.perf_counter() - t0) / n

        best = {}
        probes = [("noop", noop), ("raygen", raygen_only),
                  ("trace", trace_only), ("orbit_trace", orbit_trace),
                  ("frame_unpacked", frame_unpacked),
                  ("frame", lambda: wavefront.frame_device_arrays(scene,
                                                                  fmt))]
        for _ in range(3):
            for name, f in probes:
                best[name] = min(best.get(name, float("inf")),
                                 timed_batch(f))
        rtt = best["noop"]
        ms = {k: round((v - rtt) * 1000, 2) for k, v in best.items()
              if k != "noop"}
        rtt_ms = round(rtt * 1000, 2)
        trace_ms = ms["trace"]
        orbit_trace_ms = ms["orbit_trace"]
        frame_fixed_ms = ms["frame"]
        # named glue stages (VERDICT-r4 #1): the artifact itself carries
        # the per-stage split every round, not a one-window note
        stage_ms = {
            "raygen": ms["raygen"],
            "walk": round(ms["trace"] - ms["raygen"], 2),
            "gather_finish_shade": round(ms["frame_unpacked"]
                                         - ms["trace"], 2),
            "device_pack": round(ms["frame"] - ms["frame_unpacked"], 2),
        }

    print(json.dumps({
        "metric": "120-cell 4D @1024^2 primary rays",
        # headline = what the chip does (the e2e number is bound by the
        # tunneled ~22 MB/s host link, an environment artifact the C++
        # reference — running locally — does not pay; VERDICT-r3 #6)
        "value": round((W * H) / dev_sec / 1e6, 3),
        "unit": "Mrays/s",
        "value_note": "on-device engine throughput; e2e fields below "
                      "include the tunneled host-link pull",
        "vs_baseline": round(ref_sec / dev_sec, 3),
        "vs_baseline_e2e": round(ref_sec / sec_per_frame, 3),
        "baseline_source": baseline_source,
        "ref_sec_per_frame": round(ref_sec, 4),
        "e2e_ms_per_frame": round(sec_per_frame * 1000, 2),
        "e2e_mrays": round((W * H) / sec_per_frame / 1e6, 3),
        "on_device_ms_per_frame": round(dev_sec * 1000, 2),
        "on_device_mrays": round((W * H) / dev_sec / 1e6, 3),
        "tpu_parity_mismatches": parity_mism,
        "tpu_parity_ok": parity_ok,
        # trace vs non-trace split at the canonical axis view, same
        # window, RTT-corrected via an interleaved noop-call baseline
        # (the walk kernel alone vs the full packed frame, min-of-rounds
        # interleaved); None when the scene uses the XLA-scan fallback
        "rtt_floor_ms": rtt_ms,
        "trace_ms": trace_ms,
        "frame_fixed_view_ms": frame_fixed_ms if trace_ms is not None
        else None,
        "non_trace_ms": round(frame_fixed_ms - trace_ms, 2)
        if trace_ms is not None else None,
        # named glue stages + the same walk at an orbit view: the
        # orbit/fixed spread decomposes into extra oblique-view chunk
        # visits (compare counters vs orbit_counters) every round
        "stage_ms": stage_ms,
        "orbit_trace_ms": orbit_trace_ms,
        # per-chip pair-test roofline (VERDICT-r4 #6): visits x
        # RAY_BLOCK x CK pair tests over the walk time, so per-visit
        # regressions are caught by the artifact
        "pair_tests_per_s": _pair_rate(counters, trace_ms),
        "orbit_pair_tests_per_s": _pair_rate(orbit_counters,
                                             orbit_trace_ms),
        "counters": counters,
        "orbit_counters": orbit_counters,
    }))


def _pair_rate(counters, walk_ms):
    """visits x RAY_BLOCK x CK pair tests per second of walk time.

    ``walk_ms <= 0`` returns None: the RTT correction subtracts an
    interleaved noop-call baseline, and a tunnel burst can leave a
    negative split in a bad window — a negative Gpairs/s would poison
    the round-over-round roofline comparison."""
    if not walk_ms or walk_ms <= 0 or not counters.get("chunks_visited"):
        return None
    from ntracer_tpu.engine import resident_kernels as rk
    pairs = counters["chunks_visited"] * rk.RAY_BLOCK * rk.CK
    return round(pairs / (walk_ms / 1000) / 1e9, 3)  # Gpairs/s


if __name__ == "__main__":
    main()
