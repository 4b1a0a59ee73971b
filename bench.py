"""Benchmark: demo scene at 1080p on one chip, Pallas kernel path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The metric is Mrays/s per chip — traced path segments (counted in-kernel,
so Russian-roulette termination is reflected) per wall second, steady-state.
Baseline target from BASELINE.md: 100 Mrays/s/chip.
"""

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp
    from tpt import CameraConfig, demo_scene
    from tpt.camera import camera_matrices
    from tpt.env import constant_environment
    from tpt.kernels.render import render_fields

    width, height = 1920, 1080
    ray_depth, spp = 13, 1
    cam = CameraConfig()
    scene = demo_scene().build()
    inv_proj, inv_view, pos = camera_matrices(cam, width, height)
    env_faces = constant_environment((0.7, 0.8, 1.0))

    def frame(i):
        return render_fields(scene, env_faces, inv_proj, inv_view, pos,
                             jnp.int32(i), jnp.float32(cam.focal_length),
                             jnp.float32(cam.aperture_diameter),
                             width=width, height=height,
                             ray_depth=ray_depth, spp=spp, counts=(48, 7))

    # warmup / compile; several fully-blocked frames absorb one-off stalls
    # (remote-tunnel program load can hiccup on early executions)
    for i in range(3):
        img, rays = frame(i)
        img.block_until_ready()

    n = 20
    times = []
    ray_counts = []
    for i in range(3, 3 + n):
        t0 = time.time()
        img, rays = frame(i)
        img.block_until_ready()
        times.append(time.time() - t0)
        ray_counts.append(int(rays))

    # median frame time: robust steady-state throughput
    med = float(np.median(times))
    mrays = float(np.mean(ray_counts)) / med / 1e6
    baseline = 100.0
    print(json.dumps({
        "metric": "demo_scene_1080p_mrays_per_sec_per_chip",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
