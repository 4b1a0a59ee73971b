"""Scaling-efficiency harness: dp=1..N on whatever devices exist.

Runs the production sharded renderer (Pallas kernel backend) at each mesh
size and reports parallel efficiency = T(1) / (N * T(N)).

On a real multi-chip slice this measures ICI scaling; on a single-chip or
CPU host it runs against the virtual-device mesh
(JAX_PLATFORMS=cpu + jax_num_cpu_devices), which exercises the identical
shard_map/psum program — a correctness-of-scaling harness, not a hardware
number (interpret-mode Pallas on CPU is orders slower; only the *relative*
efficiency column is meaningful there).

Usage: python benchmarks/scaling.py [--cpu N] [--width W] [--height H]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0,
                    help="simulate N virtual CPU devices (0 = real devices)")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default=None,
                    help="write the results JSON to this file as well")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu)
    import jax
    import jax.numpy as jnp
    from tpt import CameraConfig, RenderConfig, demo_scene
    from tpt.camera import camera_matrices
    from tpt.env import constant_environment
    from tpt.parallel import make_dist_renderer, make_mesh

    n_dev = len(jax.devices())
    cam = CameraConfig()
    cfg = RenderConfig(width=args.width, height=args.height,
                       ray_depth=args.depth, spp=1, static_counts=(48, 7))
    scene = demo_scene().build()
    inv_p, inv_v, _ = camera_matrices(cam, cfg.width, cfg.height)
    env = constant_environment((0.7, 0.8, 1.0))

    results = []
    t1 = None
    dp = 1
    while dp <= n_dev:
        mesh = make_mesh(dp=dp, sp=1, devices=np.asarray(jax.devices()[:dp]))
        render = make_dist_renderer(mesh, cfg)
        out, rays = render(scene, env, inv_p, inv_v, cam.focal_length,
                           cam.aperture_diameter, 0)
        jax.block_until_ready(out)
        ts = []
        for i in range(args.reps):
            t0 = time.time()
            out, rays = render(scene, env, inv_p, inv_v, cam.focal_length,
                               cam.aperture_diameter, i + 1)
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        t = float(np.median(ts))
        if t1 is None:
            t1 = t
        eff = t1 / (dp * t)
        results.append({"dp": dp, "ms": round(t * 1e3, 2),
                        "efficiency": round(eff, 3)})
        print(f"dp={dp:2d}: {t*1e3:9.2f} ms  efficiency {eff:5.1%}",
              flush=True)
        dp *= 2

    payload = {
        "metric": "dp_scaling",
        "platform": jax.default_backend(),
        "n_devices": n_dev,
        "virtual_cpu_mesh": bool(args.cpu),
        "note": ("virtual CPU mesh: validates the sharded program "
                 "(shard_map/psum correctness), NOT ICI efficiency — "
                 "interpret-mode Pallas timing is not a hardware number"
                 if args.cpu else
                 "real devices: wall-clock parallel efficiency"),
        "config": {"width": args.width, "height": args.height,
                   "ray_depth": args.depth, "spp": 1},
        "results": results,
    }
    print(json.dumps(payload))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
