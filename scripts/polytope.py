#!/usr/bin/env python
"""Display or benchmark a regular polytope given its Schläfli symbol.

TPU-native counterpart of the reference app (reference scripts/polytope.py):
same CLI (positional Schläfli components, --benchmark, --output, --frames,
--screen, --fov, --cam-dist, --no-special) and the same rotating-camera
benchmark loop, but the geometry construction is a kaleidoscope (Coxeter
mirror) build: vertices are the orbit of an initial point under the
reflection group, and the boundary is triangulated into (d-1)-simplices with
Qhull.  Star polytopes (fractional components) are not supported yet.
"""

import argparse
import math
import os
import subprocess
import sys
import time
from fractions import Fraction

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from ntracer import NTracer, Material, ImageFormat, Channel, BlockingRenderer


def schlafli_component(x):
    p, _, q = x.partition("/")
    p = int(p, 10)
    if p < 3:
        raise argparse.ArgumentTypeError("a component cannot be less than 3")
    if not q:
        return Fraction(p)
    q = int(q, 10)
    if q < 1 or q >= p or math.gcd(p, q) != 1:
        raise argparse.ArgumentTypeError("invalid star component p/q")
    return Fraction(p, q)


def positive_int(x):
    x = int(x, 10)
    if x < 1:
        raise argparse.ArgumentTypeError("a positive number is required")
    return x


def screen_size(x):
    w, _, h = x.partition("x")
    w, h = int(w, 10), int(h, 10)
    if w < 1 or h < 1:
        raise argparse.ArgumentTypeError("invalid screen size")
    return w, h


def fov_type(x):
    x = float(x)
    if x <= 0 or x >= 180:
        raise argparse.ArgumentTypeError("fov must be between 0 and 180 degrees")
    return x / 180 * math.pi


# ---------------------------------------------------------------------------
# Kaleidoscope construction
# ---------------------------------------------------------------------------

def mirror_normals(symbol):
    """Unit normals of the n Coxeter mirrors for {p1,...,p_{n-1}}: the Gram
    matrix has -cos(pi/p_i) between consecutive mirrors, 0 otherwise."""
    n = len(symbol) + 1
    gram = np.eye(n)
    for i, p in enumerate(symbol):
        c = -math.cos(math.pi / float(p))
        gram[i, i + 1] = gram[i + 1, i] = c
    # build normals row by row so that normal i has zeros above position i
    normals = np.zeros((n, n))
    for i in range(n):
        for j in range(i):
            normals[i, j] = (gram[i, j]
                             - normals[i, :j] @ normals[j, :j]) / normals[j, j]
        s = 1.0 - normals[i, :i] @ normals[i, :i]
        if s <= 0:
            raise ValueError("Schläfli symbol does not describe a finite polytope")
        normals[i, i] = math.sqrt(s)
    return normals


def polytope_vertices(symbol):
    """Vertices as the orbit of the initial vertex under the mirror group."""
    normals = mirror_normals(symbol)
    n = normals.shape[0]
    # initial vertex: on mirrors 1..n-1, off mirror 0
    a = normals[1:]
    _, _, vt = np.linalg.svd(a)
    v0 = vt[-1]
    v0 /= np.linalg.norm(v0)

    verts = [v0]
    seen = {tuple(np.round(v0, 6))}
    queue = [v0]
    while queue:
        v = queue.pop()
        for m in normals:
            r = v - 2.0 * (v @ m) * m
            key = tuple(np.round(r, 6))
            if key not in seen:
                seen.add(key)
                verts.append(r)
                queue.append(r)
    return np.asarray(verts)


def hull_prototypes(nt, verts, material):
    """Triangulate the boundary into (d-1)-simplices."""
    from scipy.spatial import ConvexHull

    d = nt.dimension
    ndim = verts.shape[1]
    if ndim == 2:
        # polygon: fan triangulation, embedded flat in 3-D
        order = np.argsort(np.arctan2(verts[:, 1], verts[:, 0]))
        v = verts[order]
        protos = []
        for i in range(1, len(v) - 1):
            pts = [np.append(v[0], 0), np.append(v[i], 0),
                   np.append(v[i + 1], 0)]
            protos.append(nt.TrianglePrototype(
                [nt.Vector(p) for p in pts], material))
        return protos

    hull = ConvexHull(verts)
    protos = []
    dropped = 0
    for simplex in hull.simplices:
        pts = verts[simplex]
        # Qhull triangulations of non-simplicial facets can emit zero-volume
        # slivers; their generalized cross (face normal) vanishes — drop them
        edges = pts[1:] - pts[0]
        gram = edges @ edges.T
        vol2 = np.linalg.det(gram)
        scale = np.prod(np.linalg.norm(edges, axis=1)) or 1.0
        if not np.isfinite(vol2) or abs(vol2) < (1e-6 * scale) ** 2:
            dropped += 1
            continue
        if ndim < d:
            pts = np.concatenate(
                [pts, np.zeros((pts.shape[0], d - ndim))], axis=1)
        protos.append(nt.TrianglePrototype(
            [nt.Vector(p) for p in pts], material))
    if dropped:
        print(f"(dropped {dropped} degenerate simplices)")
    return protos


# ---------------------------------------------------------------------------

def main():
    parser = argparse.ArgumentParser(
        description="Display a regular polytope given its Schläfli symbol.")
    parser.add_argument("schlafli", metavar="N", type=schlafli_component,
                        nargs="+", help="the Schläfli symbol components")
    parser.add_argument("-o", "--output", metavar="PATH",
                        help="save an animation to PATH instead of displaying")
    parser.add_argument("-t", "--type", metavar="TYPE", default="h264",
                        help='output type: "png" for image series, else an '
                             "ffmpeg video codec")
    parser.add_argument("-f", "--frames", metavar="F", type=positive_int,
                        default=160, help="number of frames")
    parser.add_argument("-s", "--screen", metavar="WIDTHxHEIGHT",
                        type=screen_size, default=(800, 600))
    parser.add_argument("-a", "--fov", metavar="FOV", type=fov_type,
                        default=0.8)
    parser.add_argument("-d", "--cam-dist", metavar="DIST", type=float,
                        default=4)
    parser.add_argument("--benchmark", action="store_true",
                        help="measure rendering speed")
    parser.add_argument("--no-special", action="store_true",
                        help="use the generic module even if a specialized "
                             "one exists")
    args = parser.parse_args()

    material = Material((1, 0.5, 0.5))
    nt = NTracer(max(len(args.schlafli) + 1, 3),
                 force_generic=args.no_special)

    timer = time.perf_counter

    if (nt.dimension >= 3 and args.schlafli[0] == 4
            and all(c == 3 for c in args.schlafli[1:])):
        cam_distance = -math.sqrt(nt.dimension) * args.cam_dist
        scene = nt.BoxScene()
        circumradius_sq = float(nt.dimension)
    else:
        if any(c.denominator != 1 for c in args.schlafli):
            print("error: star polytopes are not supported yet",
                  file=sys.stderr)
            sys.exit(1)
        print("building geometry...")
        t0 = timer()
        verts = polytope_vertices([int(c) for c in args.schlafli])
        protos = hull_prototypes(nt, verts, material)
        print("done in {0} seconds ({1} vertices, {2} simplices)".format(
            timer() - t0, len(verts), len(protos)))

        circumradius_sq = 1.0
        cam_distance = -math.sqrt(circumradius_sq) * args.cam_dist

        print("partitioning scene...")
        t0 = timer()
        scene = nt.build_composite_scene(protos)
        print("done in {0} seconds".format(timer() - t0))

    camera = nt.Camera()
    camera.translate(nt.Vector.axis(2, cam_distance))
    scene.set_camera(camera)
    scene.set_fov(args.fov)

    incr = 2 * math.pi / args.frames
    hcoef = 1 / math.sqrt(nt.dimension - 1)

    def advance_camera():
        """Rotating-camera path (same as the reference benchmark loop)."""
        a2 = camera.axes[0] * hcoef + camera.axes[1] * hcoef
        for i in range(nt.dimension - 3):
            a2 = a2 + camera.axes[i + 3] * hcoef
        camera.transform(nt.Matrix.rotation(camera.axes[2], a2, incr))
        camera.normalize()
        camera.origin = camera.axes[2] * cam_distance
        scene.set_camera(camera)

    w, h = args.screen
    fmt = ImageFormat(w, h, [Channel(8, 1, 0, 0), Channel(8, 0, 1, 0),
                             Channel(8, 0, 0, 1)])
    renderer = BlockingRenderer()
    buf = bytearray(fmt.pitch * fmt.height)

    if args.benchmark:
        total = 0.0
        frames = 0
        for _ in range(args.frames):
            t0 = timer()
            renderer.render(buf, fmt, scene)
            total += timer() - t0
            frames += 1
            advance_camera()
        print("rendered {0} frame(s) in {1} seconds\n"
              "time per frame: {2} seconds\n"
              "frames per second: {3}".format(
                  frames, total, total / frames, frames / total))
        return

    if args.output is not None:
        if args.type == "png":
            try:
                from PIL import Image
            except ImportError:
                print("PNG output requires Pillow", file=sys.stderr)
                sys.exit(1)
            for f in range(args.frames):
                renderer.render(buf, fmt, scene)
                img = np.frombuffer(bytes(buf), np.uint8).reshape(h, w, 3)
                Image.fromarray(img).save(f"{args.output}{f:04d}.png")
                advance_camera()
                print(f"frame {f+1}/{args.frames}", end="\r")
            print()
        else:
            proc = subprocess.Popen(
                ["ffmpeg", "-y", "-f", "rawvideo", "-pix_fmt", "rgb24",
                 "-s", f"{w}x{h}", "-r", "60", "-i", "-", "-c:v", args.type,
                 "-pix_fmt", "yuv420p", args.output],
                stdin=subprocess.PIPE)
            for f in range(args.frames):
                renderer.render(buf, fmt, scene)
                proc.stdin.write(bytes(buf))
                advance_camera()
                print(f"frame {f+1}/{args.frames}", end="\r")
            proc.stdin.close()
            proc.wait()
            print()
        return

    # interactive pygame mode
    import pygame
    from ntracer.pygame_render import PygameRenderer, ON_COMPLETE

    pygame.display.init()
    surface = pygame.display.set_mode(args.screen)
    prender = PygameRenderer()
    running = [True]

    def start_render():
        running[0] = True
        prender.begin_render(surface, scene)

    start_render()
    clock = pygame.time.Clock()
    frame = 0
    while True:
        for e in pygame.event.get():
            if e.type == pygame.QUIT:
                pygame.quit()
                return
            if e.type == ON_COMPLETE:
                running[0] = False
                pygame.display.flip()
        if not running[0]:
            frame += 1
            advance_camera()
            start_render()
        clock.tick(60)


if __name__ == "__main__":
    main()
