"""Bisect the backward kernel's 2.3 s/step at 1080p: time pallas_trace_grad
directly under ablations (fwd sweep only / reverse primal only / no d_table
accumulate / full) and tile-row variants.

Usage: python benchmarks/exp_bwd_bisect.py [ablate1 ablate2 ...]
       names: none norev primalonly nodtbl nostores nocam + '16' suffix
       (trailing '16' = tile_rows 16; nostores/nocam imply skipping the
       reverse sweep is NOT implied — combine by reading the code)
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    which = sys.argv[1:] or ["norev", "primalonly", "nodtbl", "none",
                             "none16"]
    import jax
    import jax.numpy as jnp
    from tpt.utils import enable_persistent_cache
    enable_persistent_cache()
    from tpt import CameraConfig, demo_scene
    from tpt.camera import camera_matrices
    from tpt.kernels.trace_grad import pallas_trace_grad

    width, height, ray_depth, spp, counts = 1920, 1080, 13, 1, (48, 7)
    cam = CameraConfig()
    scene = demo_scene().build()
    inv_p, inv_v, _ = camera_matrices(cam, width, height)
    focal = jnp.float32(cam.focal_length)
    aperture = jnp.float32(cam.aperture_diameter)
    key = jax.random.PRNGKey(0)
    g_rad = jax.random.normal(key, (3, height, width), jnp.float32) * 1e-3
    g_missd = jnp.zeros((spp, 3, height, width), jnp.float32)
    g_misst = jax.random.normal(key, (spp, 3, height, width), jnp.float32) * 1e-3

    for name in which:
        tile_rows = 16 if name.endswith("16") else 8
        ablate = name[:-2] if name.endswith("16") else name

        def run(frame):
            return pallas_trace_grad(
                scene, inv_p, inv_v, frame, focal, aperture,
                g_rad, g_missd, g_misst, width=width, height=height,
                ray_depth=ray_depth, spp=spp, counts=counts,
                tile_rows=tile_rows, ablate=ablate)

        t0 = time.time()
        out = run(jnp.int32(0))
        s0 = float(jnp.sum(out[0].sphere_material))  # sync
        print(f"{name:12s}: compile+first {time.time()-t0:6.1f}s "
              f"(dtbl sum {s0:.3e})", flush=True)
        ts = []
        for i in range(4):
            t0 = time.time()
            out = run(jnp.int32(i + 1))
            _ = float(jnp.sum(out[0].sphere_material))
            ts.append(time.time() - t0)
        print(f"{name:12s}: {np.median(ts)*1e3:8.1f} ms median", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
