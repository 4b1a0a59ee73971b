"""Generate the bundled 6-PNG sRGB skybox asset.

The reference ships a 6-face environment map
(res/textures/EnvironmentMap/*.png, loaded with hardware sRGB decode at
src/MainWindow.cs:177-187).  We ship our own original art: a late-afternoon
sky rendered by tpt.sky's atmospheric-scattering precompute, ACES-tonemapped
and sRGB-encoded, with the procedural ground hemisphere from
tpt.env.default_skybox blended in below the horizon.

Run: python tools/make_skybox_asset.py  (writes tpt/assets/EnvironmentMap/)
"""
import os
import sys

import numpy as np

sys.path.insert(0, ".")

FACES = ("posx", "negx", "posy", "negy", "posz", "negz")


def main(size: int = 256) -> int:
    import jax
    jax.config.update("jax_platforms", "cpu")
    from tpt.config import AtmosphereConfig
    from tpt.env import default_skybox
    from tpt.postfx import post_process
    from tpt.sky import compute_atmosphere

    # low warm sun (time just past 0 = sunrise-ish) for a colorful sky
    faces = np.asarray(compute_atmosphere(
        AtmosphereConfig(size=size, i_steps=40, j_steps=10, time=0.035,
                         light_intensity=18.0)))
    # the atmosphere model is sky-only; below the horizon use the
    # procedural ground so -Y isn't black
    ground = np.asarray(default_skybox(size))
    blend = faces.sum(-1, keepdims=True) < 1e-3
    hdr = np.where(blend, ground * 0.6, faces)
    out_dir = os.path.join("tpt", "assets", "EnvironmentMap")
    os.makedirs(out_dir, exist_ok=True)
    from PIL import Image
    for i, name in enumerate(FACES):
        srgb = np.asarray(post_process(hdr[i]))  # ACES + gamma -> [0,1]
        img = (np.clip(srgb, 0, 1) * 255 + 0.5).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(out_dir, f"{name}.png"))
        print("wrote", os.path.join(out_dir, f"{name}.png"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
