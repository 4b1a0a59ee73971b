"""Measured (xprof-derived) profile of the BACKWARD path at 1080p.

VERDICT-r3 item 1: the forward got an xprof treatment in r2/r3, the
backward got none.  This harness runs the full 1080p training step
(Pallas forward + in-kernel reverse-sweep backward + SGD on the material
tables, exactly benchmarks/train_bench.py's kernel config) under a
jax.profiler perfetto trace and reports where the device time goes:
forward kernel, backward kernel, env-fetch/loss fusions, everything else.

Usage: python benchmarks/roofline_bwd.py [--out artifacts/roofline_bwd_1080p.json]
       [--size WxH] [--steps N]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from roofline import _parse_perfetto  # noqa: E402  (same dir)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/roofline_bwd_1080p.json")
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()
    width, height = map(int, args.size.split("x"))

    import jax
    import jax.numpy as jnp
    from tpt.utils import enable_persistent_cache
    enable_persistent_cache()
    from tpt import CameraConfig, demo_scene
    from tpt.camera import camera_matrices
    from tpt.env import constant_environment, pack_block_table
    from tpt.integrator import apply_environment_blocked
    from tpt.kernels.trace_grad import trace_diff

    ray_depth, spp, counts = 13, 1, (48, 7)
    cam = CameraConfig()
    scene = demo_scene().build()
    inv_p, inv_v, _ = camera_matrices(cam, width, height)
    env_table = pack_block_table(constant_environment((0.7, 0.8, 1.0)))
    focal = jnp.float32(cam.focal_length)
    aperture = jnp.float32(cam.aperture_diameter)
    target = jnp.zeros((height, width, 3), jnp.float32) + 0.25

    def loss_fn(params, frame):
        sm, cm = params
        s = dataclasses.replace(scene, sphere_material=sm, cuboid_material=cm)
        res = trace_diff(s, inv_p, inv_v, frame, focal, aperture,
                         jnp.int32(0), width, height, ray_depth, spp, counts)
        img = jnp.moveaxis(apply_environment_blocked(res, env_table, spp),
                           0, -1)
        err = img - target
        return jnp.mean(err * err)

    @jax.jit
    def step(params, frame):
        loss, grads = jax.value_and_grad(loss_fn)(params, frame)
        return jax.tree.map(lambda p, g: p - 0.01 * g, params, grads), loss

    params = (scene.sphere_material, scene.cuboid_material)
    t0 = time.time()
    params, loss = step(params, jnp.int32(0))
    print(f"compile+first: {time.time()-t0:.1f}s loss={float(loss):.5f}",
          flush=True)
    params, loss = step(params, jnp.int32(1))
    _ = float(loss)

    # wall-clock median (sync by fetching the scalar loss; block_until_ready
    # does not wait under the axon tunnel)
    ts = []
    for i in range(args.steps):
        t0 = time.time()
        params, loss = step(params, jnp.int32(2 + i))
        _ = float(loss)
        ts.append(time.time() - t0)
    wall_ms = float(np.median(ts)) * 1e3

    log_dir = "/tmp/tpt_roofline_bwd_trace"
    jax.profiler.start_trace(log_dir, create_perfetto_trace=True)
    params, loss = step(params, jnp.int32(99))
    _ = float(loss)
    jax.profiler.stop_trace()

    totals = _parse_perfetto(log_dir)
    fwd_us = sum(v for k, v in totals.items() if k.startswith("pallas_trace")
                 and "grad" not in k)
    bwd_us = sum(v for k, v in totals.items() if "trace_grad" in k
                 or "grad_kernel" in k)
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:14]
    device_us = sum(v for k, v in totals.items() if not k.startswith("jit_")
                    and not k.startswith("while"))

    result = {
        "metric": "roofline_bwd_1080p",
        "size": f"{width}x{height}",
        "wall_step_ms": round(wall_ms, 1),
        "device_step_ms_sum_nonwrapper": round(device_us / 1e3, 2),
        "forward_kernel_ms": round(fwd_us / 1e3, 2),
        "backward_kernel_ms": round(bwd_us / 1e3, 2),
        "top_device_ops_us": {k: round(v, 1) for k, v in top},
        "note": ("one traced training step; device_step_ms sums all "
                 "non-wrapper device events (no while loop wraps the step, "
                 "so nesting double-count only affects fusion groupings)"),
    }
    print(json.dumps(result, indent=1))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
