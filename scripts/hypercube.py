#!/usr/bin/env python
"""Interactive hypercube / mesh navigator (reference scripts/hypercube.py).

Renders a BoxScene (the inside of a hypercube) of any dimension, or a 3-D
composite scene loaded from a Wavefront OBJ file; pygame UI with sliders for
translation along each axis and rotation in each coordinate plane.
"""

import argparse
import math
import os
import sys
from itertools import combinations

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser(
        description="Navigate the inside of a hypercube or around a mesh.")
    parser.add_argument("-d", "--dimension", type=int, default=4)
    parser.add_argument("-s", "--screen", metavar="WIDTHxHEIGHT",
                        default="800x600")
    parser.add_argument("-o", "--obj", metavar="PATH",
                        help="render a 3-D Wavefront OBJ mesh instead")
    parser.add_argument("--benchmark", action="store_true",
                        help="render a fixed rotation without a window and "
                             "print timings")
    parser.add_argument("-f", "--frames", type=int, default=60)
    args = parser.parse_args()

    w, _, h = args.screen.partition("x")
    w, h = int(w), int(h)

    from ntracer import NTracer, Material, ImageFormat, Channel, BlockingRenderer
    from ntracer.wavefront_obj import load_obj

    if args.obj:
        nt = NTracer(3)
        protos = load_obj(args.obj, nt)
        scene = nt.build_composite_scene(protos)
        cam_dist = -4.0
    else:
        nt = NTracer(max(args.dimension, 3))
        scene = nt.BoxScene()
        cam_dist = 0.0  # start inside the box

    camera = nt.Camera()
    if cam_dist:
        camera.translate(nt.Vector.axis(2, cam_dist))
    scene.set_camera(camera)

    if args.benchmark:
        import time
        fmt = ImageFormat(w, h, [Channel(8, 1, 0, 0), Channel(8, 0, 1, 0),
                                 Channel(8, 0, 0, 1)])
        buf = bytearray(fmt.pitch * fmt.height)
        r = BlockingRenderer()
        incr = 2 * math.pi / args.frames
        total = 0.0
        for _ in range(args.frames):
            t0 = time.perf_counter()
            r.render(buf, fmt, scene)
            total += time.perf_counter() - t0
            camera.transform(nt.Matrix.rotation(
                nt.Vector.axis(2), nt.Vector.axis(0), incr))
            camera.normalize()
            scene.set_camera(camera)
        print("rendered {0} frame(s) in {1} seconds\n"
              "time per frame: {2} seconds\n"
              "frames per second: {3}".format(
                  args.frames, total, total / args.frames,
                  args.frames / total))
        return

    import pygame
    from ntracer.pygame_render import PygameRenderer, ON_COMPLETE

    pygame.display.init()
    surface = pygame.display.set_mode((w, h))
    renderer = PygameRenderer()

    d = nt.dimension
    planes = list(combinations(range(d), 2))
    move_speed = 0.15
    rot_speed = 0.05

    busy = [True]
    dirty = [False]

    def start():
        busy[0] = True
        renderer.begin_render(surface, scene)

    start()
    clock = pygame.time.Clock()
    while True:
        for e in pygame.event.get():
            if e.type == pygame.QUIT:
                pygame.quit()
                return
            if e.type == ON_COMPLETE:
                busy[0] = False
                pygame.display.flip()
            if e.type == pygame.KEYDOWN:
                moved = True
                if e.key == pygame.K_w:
                    camera.translate(nt.Vector.axis(2, move_speed))
                elif e.key == pygame.K_s:
                    camera.translate(nt.Vector.axis(2, -move_speed))
                elif e.key == pygame.K_a:
                    camera.translate(nt.Vector.axis(0, -move_speed))
                elif e.key == pygame.K_d:
                    camera.translate(nt.Vector.axis(0, move_speed))
                elif e.key in (pygame.K_LEFT, pygame.K_RIGHT):
                    s = rot_speed if e.key == pygame.K_RIGHT else -rot_speed
                    camera.transform(nt.Matrix.rotation(
                        nt.Vector.axis(2), nt.Vector.axis(0), s))
                    camera.normalize()
                elif e.key in (pygame.K_UP, pygame.K_DOWN):
                    s = rot_speed if e.key == pygame.K_UP else -rot_speed
                    camera.transform(nt.Matrix.rotation(
                        nt.Vector.axis(2), nt.Vector.axis(1), s))
                    camera.normalize()
                elif pygame.K_1 <= e.key <= pygame.K_9:
                    # rotate in the i-th coordinate plane (for d > 3)
                    idx = e.key - pygame.K_1
                    if idx < len(planes):
                        i, j = planes[idx]
                        camera.transform(nt.Matrix.rotation(
                            nt.Vector.axis(i), nt.Vector.axis(j), rot_speed))
                        camera.normalize()
                else:
                    moved = False
                if moved:
                    dirty[0] = True
        if dirty[0] and not busy[0]:
            try:
                scene.set_camera(camera)
                dirty[0] = False
                start()
            except Exception:
                pass
        clock.tick(60)


if __name__ == "__main__":
    main()
