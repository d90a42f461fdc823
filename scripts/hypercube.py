#!/usr/bin/env python
"""Interactive hypercube / mesh navigator (reference scripts/hypercube.py).

Renders a BoxScene (the inside of a hypercube) of any dimension, or a 3-D
composite scene loaded from a Wavefront OBJ file.  Feature parity with the
reference UI (hypercube.py:280-398): a translate slider per axis, a rotate
slider per C(d,2) coordinate plane (held arrow buttons tick every 50 ms and
re-render on the fly), double-buffered surfaces swapped from the renderer
callback, resizable window, and keyboard navigation on top.  A --benchmark
mode renders a fixed camera sweep headless and prints timings.
"""

import argparse
import math
import os
import sys
from itertools import combinations

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MOVE_SENSITIVITY = 0.01     # units per ms of held slider
ROTATE_SENSITIVITY = 0.002  # radians per ms of held slider
TICK_MS = 50

FG = (100, 100, 100)
BG = (255, 255, 255)
BOX = 15                    # arrow button size
TEXT_W = 80


def axis_name(i):
    return "XYZ"[i] if i < 3 else f"D{i + 1}"


class Slider:
    """A labelled pair of arrow buttons; holding one calls ``on_slide``
    with the elapsed milliseconds (negative for the left arrow)."""

    def __init__(self, ui, text, pos, on_slide):
        self.pos = pos
        self.on_slide = on_slide
        self.label = ui.text_block(text, (TEXT_W - 2, BOX))
        self.buttons = [(-1, self._rect(0)), (+1, self._rect(1))]

    def _rect(self, side):
        import pygame
        x = self.pos[0] if side == 0 else self.pos[0] + BOX + TEXT_W
        return pygame.Rect((x, self.pos[1]), (BOX, BOX))

    def draw(self, ui, screen):
        screen.blit(self.label, (self.pos[0] + BOX + 1, self.pos[1]))
        for sign, rect in self.buttons:
            ui.draw_arrow(screen, rect, sign, self)


class SliderUI:
    """Minimal slider toolkit: hover/press states, a repeating timer event
    while a button is held, and per-button redraw."""

    def __init__(self, pygame, tick_event):
        self.pygame = pygame
        self.tick_event = tick_event
        self.sliders = []
        self.labels = []
        self.held = None        # (slider, sign)
        self.hover = None
        self.last_ms = None
        self._font = None
        self._arrows = {}

    # --- drawing -----------------------------------------------------------
    def font(self):
        if self._font is None:
            self.pygame.font.init()
            self._font = self.pygame.font.SysFont("None", BOX)
        return self._font

    def text_block(self, text, size):
        s = self.pygame.Surface(size)
        s.fill(BG)
        f = self.font().render(text, True, FG, BG)
        s.blit(f, ((size[0] - f.get_width()) // 2,
                   (size[1] - self.font().get_ascent()) // 2))
        s.set_alpha(128)
        return s

    def _arrow_surface(self, sign):
        if sign not in self._arrows:
            pg = self.pygame
            s = pg.Surface((BOX, BOX))
            s.fill(BG)
            r = pg.Rect(1, 1, BOX - 2, BOX - 2)
            pg.draw.rect(s, FG, r, 1)
            r.inflate_ip(-5, -5)
            pts = ([r.midleft, r.topright, r.bottomright] if sign < 0
                   else [r.bottomleft, r.topleft, r.midright])
            pg.draw.aalines(s, FG, True, pts)
            self._arrows[sign] = s
        return self._arrows[sign]

    def draw_arrow(self, screen, rect, sign, slider):
        s = self._arrow_surface(sign)
        key = (slider, sign)
        if self.held == key:
            s.set_alpha(255)
        elif self.hover == key:
            s.set_alpha(200)
        else:
            s.set_alpha(128)
        screen.blit(s, rect.topleft)

    def draw(self, screen):
        for text, pos in self.labels:
            screen.blit(self.text_block(text, (BOX * 2 + 2 + TEXT_W, BOX)),
                        pos)
        for s in self.sliders:
            s.draw(self, screen)

    # --- construction ------------------------------------------------------
    def slider(self, text, pos, on_slide):
        self.sliders.append(Slider(self, text, pos, on_slide))

    def label(self, text, pos):
        self.labels.append((text, pos))

    # --- events ------------------------------------------------------------
    def _button_at(self, pos):
        for s in self.sliders:
            for sign, rect in s.buttons:
                if rect.collidepoint(pos):
                    return (s, sign)
        return None

    def on_mouse(self, e):
        pg = self.pygame
        if e.type == pg.MOUSEMOTION:
            self.hover = self._button_at(e.pos)
        elif e.type == pg.MOUSEBUTTONDOWN and e.button == 1:
            self.held = self._button_at(e.pos)
            if self.held:
                pg.time.set_timer(self.tick_event, TICK_MS)
                self.last_ms = pg.time.get_ticks()
        elif e.type == pg.MOUSEBUTTONUP and e.button == 1 and self.held:
            self.tick()
            self.held = None
            self.last_ms = None
            pg.time.set_timer(self.tick_event, 0)
            pg.event.clear(self.tick_event)

    def ticking(self):
        return self.held is not None and self.last_ms is not None

    def tick(self, reset=False):
        """Apply the time since the last tick to the held slider."""
        pg = self.pygame
        if not self.ticking():
            return False
        now = pg.time.get_ticks()
        slider, sign = self.held
        slider.on_slide(sign * (now - self.last_ms))
        self.last_ms = now
        if reset:
            pg.event.clear(self.tick_event)
            pg.time.set_timer(self.tick_event, TICK_MS)
        return True


def build_scene(args):
    from ntracer import NTracer
    from ntracer.wavefront_obj import load_obj
    if args.obj:
        nt = NTracer(3)
        scene = nt.build_composite_scene(load_obj(args.obj, nt))
        cam_dist = -4.0
    else:
        nt = NTracer(max(args.dimension, 3))
        scene = nt.BoxScene()
        cam_dist = 0.0  # start inside the box
    camera = nt.Camera()
    if cam_dist:
        camera.translate(nt.Vector.axis(2, cam_dist))
    scene.set_camera(camera)
    return nt, scene, camera


def benchmark(args, w, h, nt, scene, camera):
    import time
    from ntracer import ImageFormat, Channel, BlockingRenderer
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
              args.frames, total, total / args.frames, args.frames / total))


def main():
    parser = argparse.ArgumentParser(
        description="Navigate the inside of a hypercube or around a mesh.")
    parser.add_argument("-d", "--dimension", type=int, default=4)
    parser.add_argument("-s", "--screen", metavar="WIDTHxHEIGHT",
                        default="640x480")
    parser.add_argument("-o", "--obj", "-f", "--file", dest="obj",
                        metavar="PATH",
                        help="render a 3-D Wavefront OBJ mesh instead")
    parser.add_argument("--benchmark", action="store_true",
                        help="render a fixed rotation without a window and "
                             "print timings")
    parser.add_argument("-f2", "--frames", type=int, default=60)
    args = parser.parse_args()

    w, _, h = args.screen.partition("x")
    w, h = int(w), int(h)

    nt, scene, camera = build_scene(args)
    if args.benchmark:
        benchmark(args, w, h, nt, scene, camera)
        return

    import pygame
    from ntracer.pygame_render import PygameRenderer, ON_COMPLETE

    pygame.display.init()
    pygame.display.set_caption("ntracer")
    screen = pygame.display.set_mode((w, h), pygame.RESIZABLE)
    # double buffering: render into next_img while current_img is shown
    current_img = pygame.Surface(screen.get_size())
    next_img = pygame.Surface(screen.get_size())

    renderer = PygameRenderer()
    TICK_EVENT = pygame.USEREVENT + 1
    ui = SliderUI(pygame, TICK_EVENT)

    d = nt.dimension
    planes = list(combinations(range(d), 2))
    state = {"rendering": False, "dirty": False}

    def begin_render():
        state["rendering"] = True
        scene.set_camera(camera)
        renderer.begin_render(next_img, scene)

    def request_render():
        if state["rendering"]:
            state["dirty"] = True
        else:
            begin_render()

    def translate(axis):
        def slide(t):
            camera.origin += camera.axes[axis] * (t * MOVE_SENSITIVITY)
            request_render()
        return slide

    def rotate(a, b):
        def slide(t):
            camera.transform(nt.Matrix.rotation(
                camera.axes[a], camera.axes[b], t * ROTATE_SENSITIVITY))
            camera.normalize()
            request_render()
        return slide

    ui.label("Slide", (15, 15))
    for i in range(d):
        ui.slider(axis_name(i), (15, 35 + 20 * i), translate(i))
    ui.label("Turn", (15, 50 + 20 * d))
    for i, (a, b) in enumerate(planes):
        ui.slider(f"{axis_name(a)} -> {axis_name(b)}",
                  (15, 70 + 20 * (i + d)), rotate(a, b))

    rot_speed = 0.05
    move_speed = 0.15
    keymap = {}

    def handle_key(key):
        moved = True
        if key == pygame.K_w:
            camera.translate(nt.Vector.axis(2, move_speed))
        elif key == pygame.K_s:
            camera.translate(nt.Vector.axis(2, -move_speed))
        elif key == pygame.K_a:
            camera.translate(nt.Vector.axis(0, -move_speed))
        elif key == pygame.K_d:
            camera.translate(nt.Vector.axis(0, move_speed))
        elif key in (pygame.K_LEFT, pygame.K_RIGHT):
            s = rot_speed if key == pygame.K_RIGHT else -rot_speed
            camera.transform(nt.Matrix.rotation(
                camera.axes[2], camera.axes[0], s))
            camera.normalize()
        elif key in (pygame.K_UP, pygame.K_DOWN):
            s = rot_speed if key == pygame.K_UP else -rot_speed
            camera.transform(nt.Matrix.rotation(
                camera.axes[2], camera.axes[1], s))
            camera.normalize()
        elif pygame.K_1 <= key <= pygame.K_9 and key - pygame.K_1 < len(planes):
            a, b = planes[key - pygame.K_1]
            camera.transform(nt.Matrix.rotation(
                camera.axes[a], camera.axes[b], rot_speed))
            camera.normalize()
        else:
            moved = False
        if moved:
            request_render()

    del keymap
    begin_render()
    while True:
        e = pygame.event.wait()
        if e.type == pygame.QUIT:
            return
        if e.type in (pygame.MOUSEMOTION, pygame.MOUSEBUTTONDOWN,
                      pygame.MOUSEBUTTONUP):
            ui.on_mouse(e)
            screen.blit(current_img, (0, 0))
            ui.draw(screen)
            pygame.display.flip()
        elif e.type == TICK_EVENT:
            ui.tick()
        elif e.type == pygame.KEYDOWN:
            handle_key(e.key)
        elif e.type == ON_COMPLETE:
            state["rendering"] = False
            current_img, next_img = next_img, current_img
            screen.blit(current_img, (0, 0))
            ui.draw(screen)
            pygame.display.flip()
            if ui.tick(reset=True) or state["dirty"]:
                state["dirty"] = False
                begin_render()
        elif e.type == pygame.VIDEORESIZE:
            renderer.abort_render()
            pygame.event.clear(ON_COMPLETE)
            state["rendering"] = False
            screen = pygame.display.set_mode(e.size, pygame.RESIZABLE)
            del current_img, next_img
            current_img = pygame.Surface(e.size)
            next_img = pygame.Surface(e.size)
            begin_render()


if __name__ == "__main__":
    main()
