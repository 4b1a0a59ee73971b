"""Interactive progressive viewer.

Headless-first framework, optional window.  The loop mirrors the reference
app: progressive accumulation that resets on camera motion or any edit,
WASD+QE navigation and mouse-look (Camera.ProcessInputs physics,
src/Camera.cs:35-77), and every ImGui control of src/Render/Gui.cs mapped
to a live action:

  Overview panel      -> screenshot 'p' (Samples_{N}.png, Gui.cs:28-33),
                         spp  '-'/'='   (range 1-10,  Gui.cs:40),
                         depth '['/']'  (range 1-50,  Gui.cs:48),
                         focal 'f'/'g'  (step 0.1,    Gui.cs:55),
                         aperture 'v'/'b' (step 0.002, Gui.cs:62),
                         random materials 'M' (36 grid spheres, Gui.cs:69-73)
  EnvironmentMap panel-> env toggle 'e' (skybox <-> atmosphere, Gui.cs:80-87),
                         atmosphere time 't'/'y' (re-runs the precompute,
                         Gui.cs:114-144),
                         atmosphere resolution ','/'.' (the {32..2048}
                         combo, Gui.cs:93-112)
  GameObjectProperties-> left-click picks (CPU ray cast, Gui.cs:223-262);
                         arrows / 'u'/'o' move the picked object,
                         'm' randomizes its material, '<'/'>' scales
                         specular chance with the reference's cross-clamp
                         (spec + refr <= 1, Gui.cs:193,205)

All state and edit logic live in :class:`ViewerSession` (pure host code —
unit-tested headless in tests/test_interactive.py); matplotlib is only the
optional display shell.

Run: ``python -m tpt.interactive [--scene demo] [--size 256]``.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

from .config import AtmosphereConfig, CameraConfig, RenderConfig


class ViewerSession:
    """The reference app's mutable runtime state, functional-core style:
    scene/env/camera/accumulator plus one method per GUI control."""

    def __init__(self, scene_name: str = "demo", size: int = 256,
                 env_name: str = "atmosphere", atmosphere_size: int = 128,
                 screenshot_dir: str = "Screenshots", cubemap_files=None):
        from . import init_accumulator
        from .camera_controller import CameraState
        from .cli import _build_scene

        self.cfg = RenderConfig(width=size, height=size)
        self.scene_name = scene_name
        self.builder = _build_scene(scene_name)
        self.scene = self.builder.build()
        self.base_cam = CameraConfig()
        self.cam = CameraState.from_config(self.base_cam)
        self.atmo = AtmosphereConfig(size=atmosphere_size, i_steps=30,
                                     j_steps=10)
        self.env_is_atmosphere = env_name == "atmosphere"
        # 'e' toggles atmosphere <-> skybox (Gui.cs:80-87).  The reference's
        # skybox is a 6-PNG sRGB cubemap (src/Helper.cs:18-50); pass the
        # face paths to get the same, else a constant-color stand-in.
        self.cubemap_files = list(cubemap_files) if cubemap_files else None
        self._skybox = None  # lazily built constant/file skybox
        self.atmosphere_ms = 0.0  # last precompute GPU+wall ms (Gui.cs:91)
        self.env_faces = self._make_env()
        self.acc = init_accumulator(self.cfg.height, self.cfg.width)
        self.picked = None  # (kind str, index int) into builder lists
        self.screenshot_dir = screenshot_dir
        self.frame_changed = False

    # ---- environment (Gui.cs:80-144) ----
    def _make_env(self):
        if self.env_is_atmosphere:
            from .sky import compute_atmosphere
            t0 = time.time()
            faces = compute_atmosphere(self.atmo)
            faces.block_until_ready()
            # the reference surfaces the precompute time in the GUI via a
            # GL TimerQuery (AtmosphericScatterer.cs:104-112, Gui.cs:91)
            self.atmosphere_ms = (time.time() - t0) * 1e3
            return faces
        if self._skybox is None:
            if self.cubemap_files:
                from .env import load_cubemap_files
                self._skybox = load_cubemap_files(self.cubemap_files)
            else:
                # the reference ships a 6-PNG environment map
                # (src/MainWindow.cs:177-187); with no files we synthesize
                # an equivalent non-constant default (tpt.env.default_skybox)
                from .env import default_skybox
                self._skybox = default_skybox()
        return self._skybox

    # the reference's EnvironmentMap resolution combo (Gui.cs:93-112)
    ATMOSPHERE_SIZES = (32, 64, 128, 256, 512, 1024, 2048)

    def set_atmosphere_size(self, size: int):
        """Select an atmosphere cubemap resolution from the reference's combo
        {32..2048} (Gui.cs:93-112): reallocates the cubemap and re-runs the
        precompute."""
        if size not in self.ATMOSPHERE_SIZES:
            raise ValueError(f"atmosphere size {size} not in "
                             f"{self.ATMOSPHERE_SIZES}")
        self.set_atmosphere(size=int(size))

    def adjust_atmosphere_size(self, direction: int):
        """Step through the resolution combo (keyboard analogue)."""
        sizes = self.ATMOSPHERE_SIZES
        i = min(range(len(sizes)), key=lambda k: abs(sizes[k] - self.atmo.size))
        self.set_atmosphere_size(sizes[int(np.clip(i + direction, 0,
                                                   len(sizes) - 1))])

    def toggle_environment(self):
        self.env_is_atmosphere = not self.env_is_atmosphere
        self.env_faces = self._make_env()
        self.invalidate()

    def set_atmosphere(self, **kw):
        """Change atmosphere params (time/i_steps/j_steps/light_intensity/
        size) and re-run the precompute — the GUI re-dispatch path."""
        self.atmo = dataclasses.replace(self.atmo, **kw)
        if self.env_is_atmosphere:
            self.env_faces = self._make_env()
            self.invalidate()

    def adjust_time(self, delta: float):
        self.set_atmosphere(time=float(self.atmo.time + delta))

    # ---- tracer params (Gui.cs:40-66; ranges identical) ----
    def set_spp(self, value: int):
        self.cfg = dataclasses.replace(
            self.cfg, spp=int(np.clip(value, 1, 10)))
        self.invalidate()

    def adjust_spp(self, delta: int):
        self.set_spp(self.cfg.spp + delta)

    def set_ray_depth(self, value: int):
        self.cfg = dataclasses.replace(
            self.cfg, ray_depth=int(np.clip(value, 1, 50)))
        self.invalidate()

    def adjust_ray_depth(self, delta: int):
        self.set_ray_depth(self.cfg.ray_depth + delta)

    def set_focal(self, value: float):
        self.base_cam = dataclasses.replace(
            self.base_cam, focal_length=float(value))
        self.invalidate()

    def adjust_focal(self, delta: float):
        self.set_focal(self.base_cam.focal_length + delta)

    def set_aperture(self, value: float):
        self.base_cam = dataclasses.replace(
            self.base_cam, aperture_diameter=float(value))
        self.invalidate()

    def adjust_aperture(self, delta: float):
        self.set_aperture(self.base_cam.aperture_diameter + delta)

    # ---- camera (src/Camera.cs) ----
    def tick(self, dt: float, keys=(), mouse_delta=(0.0, 0.0)) -> bool:
        from .camera_controller import process_inputs
        self.cam, changed = process_inputs(self.cam, dt, keys, mouse_delta)
        if changed:
            self.invalidate()
        return changed

    # ---- picking + object editing (Gui.cs:156-262) ----
    def pick(self, x: float, y_gl: float):
        from .camera import camera_matrices
        from .pick import pick_pixel
        from .scene import SphereObject
        cam_cfg = self.cam.to_config(self.base_cam)
        inv_p, inv_v, pos = camera_matrices(cam_cfg, self.cfg.width,
                                            self.cfg.height)
        obj, t1, t2 = pick_pixel(self.builder, inv_p, inv_v, pos, x, y_gl,
                                 self.cfg.width, self.cfg.height)
        if obj is None:
            self.picked = None
            return None
        kind = "sphere" if isinstance(obj, SphereObject) else "cuboid"
        group = (self.builder.spheres if kind == "sphere"
                 else self.builder.cuboids)
        self.picked = (kind, group.index(obj))
        return obj

    def _picked_obj(self):
        if self.picked is None:
            return None
        kind, idx = self.picked
        group = (self.builder.spheres if kind == "sphere"
                 else self.builder.cuboids)
        return group[idx]

    def move_picked(self, delta3) -> bool:
        obj = self._picked_obj()
        if obj is None:
            return False
        obj.position = tuple(float(p + d) for p, d in
                             zip(obj.position, delta3))
        self._rebuild()
        return True

    def set_picked_material(self, **params) -> bool:
        """Edit the picked object's material with the reference GUI's
        cross-clamping (spec in [0,1]; refr in [0, 1-spec]; IOR >= 1)."""
        from .materials import Material
        obj = self._picked_obj()
        if obj is None:
            return False
        m = obj.material
        vals = dict(albedo=m.albedo, emissive=m.emissive,
                    absorbance=m.absorbance,
                    specular_chance=m.specular_chance,
                    specular_roughness=m.specular_roughness, ior=m.ior,
                    refraction_chance=m.refraction_chance,
                    refraction_roughness=m.refraction_roughness)
        vals.update(params)
        obj.material = Material.make(**vals)
        self._rebuild()
        return True

    def randomize_picked_material(self) -> bool:
        from .materials import random_material
        obj = self._picked_obj()
        if obj is None:
            return False
        obj.material = random_material(np.random.default_rng())
        self._rebuild()
        return True

    def randomize_grid_materials(self, n: int = 36):
        """The GUI's random-materials button (src/MainWindow.cs:324-336)."""
        from .scene import randomize_materials
        changed = randomize_materials(self.builder, n)
        self._rebuild()
        return changed

    def _rebuild(self):
        self.scene = self.builder.build()
        self.invalidate()

    def reload_scene(self):
        """'R': rebuild the scene from scratch — the reference re-runs
        LoadScene and resets (src/MainWindow.cs:109-123).  Discards every
        object edit and the pick."""
        from .cli import _build_scene
        self.builder = _build_scene(self.scene_name)
        self.picked = None
        self._rebuild()

    def set_size(self, width: int, height: int):
        """Window-resize semantics: reallocate the accumulator and reset
        (PathTracer.SetSize, src/Render/PathTracer.cs:131-137); the inverse
        projection is recomputed per frame from the new size
        (src/MainWindow.cs:270-283)."""
        from . import init_accumulator
        self.cfg = dataclasses.replace(self.cfg, width=int(width),
                                       height=int(height))
        self.acc = init_accumulator(self.cfg.height, self.cfg.width)

    # ---- accumulation ----
    def invalidate(self):
        from . import reset
        self.acc = reset(self.acc)

    def render_one(self):
        """Render + accumulate one progressive frame; returns the display
        (post-processed sRGB) image as a numpy array."""
        from . import accumulate
        from .kernels.render import render_frame
        from .postfx import post_process
        cam_cfg = self.cam.to_config(self.base_cam)
        image, _rays = render_frame(self.scene, self.env_faces, cam_cfg,
                                    self.cfg, int(self.acc.frame))
        self.acc = accumulate(self.acc, image)
        return np.asarray(post_process(self.acc.image))

    def screenshot(self) -> str:
        from .postfx import post_process
        from .utils import write_png
        n = int(self.acc.frame) * self.cfg.spp
        os.makedirs(self.screenshot_dir, exist_ok=True)
        path = os.path.join(self.screenshot_dir, f"Samples_{n}.png")
        write_png(path, np.asarray(post_process(self.acc.image)))
        return path

    @property
    def samples_per_pixel(self) -> int:
        return int(self.acc.frame) * self.cfg.spp

    @property
    def f_number(self) -> float:
        """Lens f-number = focal length / aperture diameter (Gui.cs:67)."""
        ap = self.base_cam.aperture_diameter
        return self.base_cam.focal_length / ap if ap > 0 else float("inf")


class ControlPanel:
    """Widget-panel analogue of the reference's ImGui windows
    (src/Render/Gui.cs) built on matplotlib.widgets: one slider/button per
    GUI control, with the reference's ranges, all driving a ViewerSession.

    Works headless under the Agg backend (Slider.set_val triggers the same
    callbacks a drag does — tests/test_interactive.py drives it that way).
    """

    def __init__(self, ses: "ViewerSession", fig=None):
        import matplotlib.pyplot as plt
        from matplotlib.widgets import Button, Slider

        self.ses = ses
        self.fig = fig or plt.figure(figsize=(4.2, 6.2))
        self.fig.canvas.manager.set_window_title("tpt controls") \
            if hasattr(self.fig.canvas.manager, "set_window_title") else None

        def row(i, h=0.035):
            return self.fig.add_axes([0.32, 0.95 - i * 0.055, 0.58, h])

        # Overview panel (Gui.cs:40-66)
        self.s_spp = Slider(row(0), "SPP", 1, 10, valinit=ses.cfg.spp,
                            valstep=1)
        self.s_spp.on_changed(lambda v: ses.set_spp(int(v)))
        self.s_depth = Slider(row(1), "MaxRayDepth", 1, 50,
                              valinit=ses.cfg.ray_depth, valstep=1)
        self.s_depth.on_changed(lambda v: ses.set_ray_depth(int(v)))
        self.s_focal = Slider(row(2), "FocalLength", 0.1, 60.0,
                              valinit=ses.base_cam.focal_length)
        self.s_focal.on_changed(ses.set_focal)
        self.s_aperture = Slider(row(3), "ApertureDiam", 0.0, 0.6,
                                 valinit=ses.base_cam.aperture_diameter)
        self.s_aperture.on_changed(ses.set_aperture)

        # EnvironmentMap panel (Gui.cs:93-144)
        self.s_time = Slider(row(4), "Time", 0.0, 1.0,
                             valinit=ses.atmo.time)
        self.s_time.on_changed(lambda v: ses.set_atmosphere(time=float(v)))
        self.s_intensity = Slider(row(5), "Intensity", 0.0, 40.0,
                                  valinit=ses.atmo.light_intensity)
        self.s_intensity.on_changed(
            lambda v: ses.set_atmosphere(light_intensity=float(v)))
        self.s_isteps = Slider(row(6), "ISteps", 1, 100,
                               valinit=ses.atmo.i_steps, valstep=1)
        self.s_isteps.on_changed(
            lambda v: ses.set_atmosphere(i_steps=int(v)))
        self.s_jsteps = Slider(row(7), "JSteps", 1, 40,
                               valinit=ses.atmo.j_steps, valstep=1)
        self.s_jsteps.on_changed(
            lambda v: ses.set_atmosphere(j_steps=int(v)))
        # resolution combo {32..2048} (Gui.cs:93-112) as an index slider
        sizes = ses.ATMOSPHERE_SIZES
        init_i = min(range(len(sizes)),
                     key=lambda k: abs(sizes[k] - ses.atmo.size))
        self.s_size = Slider(row(8), f"Resolution {sizes}", 0, len(sizes) - 1,
                             valinit=init_i, valstep=1)
        self.s_size.on_changed(
            lambda v: ses.set_atmosphere_size(sizes[int(v)]))

        def button(i, label, cb):
            b = Button(self.fig.add_axes([0.1, 0.95 - i * 0.055, 0.8, 0.04]),
                       label)
            b.on_clicked(lambda _ev: cb())
            return b

        self.b_env = button(9, "Toggle atmosphere/skybox", ses.toggle_environment)
        self.b_shot = button(10, "Screenshot", ses.screenshot)
        self.b_rand = button(11, "Random materials (36)",
                             ses.randomize_grid_materials)
        self.b_reload = button(12, "Reload scene", ses.reload_scene)


def run_viewer(scene_name: str = "demo", size: int = 256,
               env_name: str = "atmosphere", frames_per_draw: int = 1,
               cubemap_files=None, panel: bool = False) -> int:
    try:
        import matplotlib.pyplot as plt
    except ImportError:
        print("interactive viewer requires matplotlib", file=sys.stderr)
        return 1

    ses = ViewerSession(scene_name, size, env_name,
                        cubemap_files=cubemap_files)
    # keep a strong reference: matplotlib widgets die when collected
    control_panel = ControlPanel(ses) if panel else None  # noqa: F841
    keys_down = set()
    fig, ax = plt.subplots(figsize=(6, 6))
    im = ax.imshow(np.zeros((ses.cfg.height, ses.cfg.width, 3)),
                   origin="lower", interpolation="nearest")
    ax.set_axis_off()
    status = ax.set_title("tpt — WASD move, drag look, click pick, p png, "
                          "-/= spp, [/] depth, f/g focal, v/b apert, "
                          "e env, t/y time, m/M rnd mat")

    key_map = {"w": "w", "a": "a", "s": "s", "d": "d",
               "shift": "shift", "control": "ctrl"}
    drag = {"pos": None, "moved": False, "delta": (0.0, 0.0)}
    actions = {
        "p": lambda: print("wrote", ses.screenshot()),
        "r": ses.invalidate,
        "R": ses.reload_scene,
        "-": lambda: ses.adjust_spp(-1), "=": lambda: ses.adjust_spp(1),
        "[": lambda: ses.adjust_ray_depth(-1),
        "]": lambda: ses.adjust_ray_depth(1),
        "f": lambda: ses.adjust_focal(-0.1),
        "g": lambda: ses.adjust_focal(0.1),
        "v": lambda: ses.adjust_aperture(-0.002),
        "b": lambda: ses.adjust_aperture(0.002),
        "e": ses.toggle_environment,
        "t": lambda: ses.adjust_time(-0.02), "y": lambda: ses.adjust_time(0.02),
        # atmosphere resolution combo {32..2048} (Gui.cs:93-112)
        ",": lambda: ses.adjust_atmosphere_size(-1),
        ".": lambda: ses.adjust_atmosphere_size(1),
        "m": ses.randomize_picked_material,
        "M": ses.randomize_grid_materials,
        "left": lambda: ses.move_picked((-0.5, 0, 0)),
        "right": lambda: ses.move_picked((0.5, 0, 0)),
        "up": lambda: ses.move_picked((0, 0, -0.5)),
        "down": lambda: ses.move_picked((0, 0, 0.5)),
        "u": lambda: ses.move_picked((0, 0.5, 0)),
        "o": lambda: ses.move_picked((0, -0.5, 0)),
        "<": lambda: ses.set_picked_material(
            specular_chance=(ses._picked_obj().material.specular_chance - 0.05
                             if ses._picked_obj() else 0)),
        ">": lambda: ses.set_picked_material(
            specular_chance=(ses._picked_obj().material.specular_chance + 0.05
                             if ses._picked_obj() else 0)),
    }

    def on_key(event, down):
        k = key_map.get(event.key)
        if k:
            (keys_down.add if down else keys_down.discard)(k)
        elif down and event.key in actions:
            actions[event.key]()

    def on_press(event):
        if event.inaxes is ax and event.xdata is not None:
            drag["pos"] = (event.x, event.y)
            drag["moved"] = False

    def on_motion(event):
        if drag["pos"] is None or event.x is None:
            return
        dx = event.x - drag["pos"][0]
        dy = event.y - drag["pos"][1]
        if dx or dy:
            drag["moved"] = True
            # GL window coords are y-down; matplotlib's are y-up
            drag["delta"] = (drag["delta"][0] + dx, drag["delta"][1] - dy)
            drag["pos"] = (event.x, event.y)

    def on_release(event):
        if drag["pos"] is not None and not drag["moved"] \
                and event.inaxes is ax and event.xdata is not None:
            obj = ses.pick(event.xdata, ses.cfg.height - event.ydata)
            if obj is None:
                print("picked: nothing")
            else:
                print(f"picked: {type(obj).__name__} at {obj.position}: "
                      f"{obj.material}")
        drag["pos"] = None

    fig.canvas.mpl_connect("key_press_event", lambda e: on_key(e, True))
    fig.canvas.mpl_connect("key_release_event", lambda e: on_key(e, False))
    fig.canvas.mpl_connect("button_press_event", on_press)
    fig.canvas.mpl_connect("motion_notify_event", on_motion)
    fig.canvas.mpl_connect("button_release_event", on_release)

    last = time.time()
    while plt.fignum_exists(fig.number):
        now = time.time()
        dt = min(now - last, 0.1)
        last = now
        delta = drag["delta"]
        drag["delta"] = (0.0, 0.0)
        ses.tick(dt, keys_down, delta)
        for _ in range(frames_per_draw):
            disp = ses.render_one()
        im.set_data(disp)
        status.set_text(f"samples/px: {ses.samples_per_pixel}   "
                        f"pos: {np.round(ses.cam.position, 2)}   "
                        f"f/{ses.f_number:.1f}   "
                        f"atmo {ses.atmosphere_ms:.0f} ms")
        fig.canvas.draw_idle()
        plt.pause(0.001)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene", default="demo")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--env", default="atmosphere")
    p.add_argument("--cubemap-files", default="",
                   help="6 comma-separated face images (+X,-X,+Y,-Y,+Z,-Z) "
                        "for the 'e' skybox toggle")
    p.add_argument("--panel", action="store_true",
                   help="open a widget control panel (ImGui-panel analogue)")
    args = p.parse_args(argv)
    files = args.cubemap_files.split(",") if args.cubemap_files else None
    return run_viewer(args.scene, args.size, args.env, cubemap_files=files,
                      panel=args.panel)


if __name__ == "__main__":
    sys.exit(main())
