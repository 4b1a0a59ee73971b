"""Interactive progressive viewer (matplotlib).

Headless-first framework, optional window: the viewer mirrors the reference
app's loop — progressive accumulation that resets on camera motion or
parameter edits, WASD+QE navigation (the Camera.ProcessInputs physics via
tpt.camera_controller), click-to-pick showing object/material info
(src/Render/Gui.cs:223-262), and 'p' for a Samples_{N}.png screenshot.

Run: ``python -m tpt.interactive [--scene demo] [--size 256]`` (requires a
display or an Agg-incompatible backend will refuse; everything else in the
framework stays usable without matplotlib).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def run_viewer(scene_name: str = "demo", size: int = 256, env_name: str = "atmosphere",
               frames_per_draw: int = 1) -> int:
    try:
        import matplotlib
        import matplotlib.pyplot as plt
    except ImportError:
        print("interactive viewer requires matplotlib", file=sys.stderr)
        return 1

    import jax.numpy as jnp
    from . import (AccumulatorState, CameraConfig, RenderConfig, accumulate,
                   init_accumulator, reset)
    from .camera import camera_matrices
    from .camera_controller import CameraState, process_inputs
    from .cli import _build_scene
    from .config import AtmosphereConfig
    from .env import constant_environment
    from .kernels.render import render_frame
    from .pick import pick_pixel
    from .postfx import post_process
    from .utils import write_png

    cfg = RenderConfig(width=size, height=size)
    builder = _build_scene(scene_name)
    scene = builder.build()
    if env_name == "atmosphere":
        from .sky import compute_atmosphere
        env_faces = compute_atmosphere(AtmosphereConfig(size=128, i_steps=30, j_steps=10))
    else:
        env_faces = constant_environment((0.7, 0.8, 1.0))

    base_cam = CameraConfig()
    cam_state = CameraState.from_config(base_cam)
    acc = init_accumulator(cfg.height, cfg.width)
    keys_down = set()

    fig, ax = plt.subplots(figsize=(6, 6))
    im = ax.imshow(np.zeros((cfg.height, cfg.width, 3)), origin="lower",
                   interpolation="nearest")
    ax.set_axis_off()
    status = ax.set_title("tpt — WASD+QE move, drag to look, click to pick, p=png")

    key_map = {"w": "w", "a": "a", "s": "s", "d": "d",
               "shift": "shift", "control": "ctrl"}
    state = {"acc": acc, "cam": cam_state, "drag": None, "dirty": True}

    def on_key(event, down):
        k = key_map.get(event.key)
        if k:
            (keys_down.add if down else keys_down.discard)(k)
        if down and event.key == "p":
            n = int(state["acc"].frame) * cfg.spp
            os.makedirs("Screenshots", exist_ok=True)
            path = os.path.join("Screenshots", f"Samples_{n}.png")
            write_png(path, np.asarray(post_process(state["acc"].image)))
            print(f"wrote {path}")
        if down and event.key == "r":
            state["acc"] = reset(state["acc"])

    def on_click(event):
        if event.inaxes is not ax or event.xdata is None:
            return
        cam_cfg = state["cam"].to_config(base_cam)
        inv_p, inv_v, pos = camera_matrices(cam_cfg, cfg.width, cfg.height)
        # imshow origin="lower" -> ydata is already GL bottom-up
        obj, t1, t2 = pick_pixel(builder, inv_p, inv_v, pos,
                                 event.xdata, cfg.height - event.ydata,
                                 cfg.width, cfg.height)
        if obj is None:
            print("picked: nothing")
        else:
            print(f"picked: {type(obj).__name__} at {obj.position}: {obj.material}")

    fig.canvas.mpl_connect("key_press_event", lambda e: on_key(e, True))
    fig.canvas.mpl_connect("key_release_event", lambda e: on_key(e, False))
    fig.canvas.mpl_connect("button_press_event", on_click)

    last = time.time()
    while plt.fignum_exists(fig.number):
        now = time.time()
        dt = min(now - last, 0.1)
        last = now
        new_cam, changed = process_inputs(state["cam"], dt, keys_down)
        state["cam"] = new_cam
        if changed:
            state["acc"] = reset(state["acc"])

        cam_cfg = state["cam"].to_config(base_cam)
        for _ in range(frames_per_draw):
            image, _rays = render_frame(scene, env_faces, cam_cfg, cfg,
                                        int(state["acc"].frame))
            state["acc"] = accumulate(state["acc"], image)

        im.set_data(np.asarray(post_process(state["acc"].image)))
        spp = int(state["acc"].frame) * cfg.spp
        status.set_text(f"samples/px: {spp}   pos: {np.round(new_cam.position, 2)}")
        fig.canvas.draw_idle()
        plt.pause(0.001)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene", default="demo")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--env", default="atmosphere")
    args = p.parse_args(argv)
    return run_viewer(args.scene, args.size, args.env)


if __name__ == "__main__":
    sys.exit(main())
