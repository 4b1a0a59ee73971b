"""Kernel cost vs ray depth at 1080p: reveals how much of the bounce loop
runs on dead work.

r4 finding: traced segments saturate (~5.5M by depth 8; Russian roulette
keeps E[bounces] ~ 2.7) but kernel device time keeps growing ~1.8 ms per
bounce, flat through depth 13 — the all-dead tile skip needs EVERY lane of
a (24, 128) tile dead, and the binomial tail makes that essentially never
happen: with per-bounce RR survival ~0.6, any 3072-lane tile keeps a
straggler to depth ~log(1/3072)/log(0.6) ~ 15 REGARDLESS of how pixels are
ordered into tiles (the tail is per-lane randomness, not heterogeneity —
sorting by expected depth cannot help).  Perfect dead-work skipping would
put the kernel near ~9 ms/frame (vs 22.2); it requires per-lane path
compaction between bounce phases, recorded as the candidate r5 lever.

Usage: python benchmarks/depth_sweep.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tpt.utils import enable_persistent_cache
enable_persistent_cache()
from tpt import CameraConfig, demo_scene
from tpt.camera import camera_matrices
from tpt.kernels.trace import pallas_trace


def main() -> int:
    W, H = 1920, 1080
    cam = CameraConfig()
    scene = demo_scene().build()
    inv_p, inv_v, _ = camera_matrices(cam, W, H)

    for depth in (1, 2, 4, 8, 13):
        def frame(i, depth=depth):
            res = pallas_trace(scene, inv_p, inv_v, jnp.int32(i),
                               jnp.float32(cam.focal_length),
                               jnp.float32(cam.aperture_diameter),
                               width=W, height=H, ray_depth=depth, spp=1,
                               counts=(48, 7))
            return jnp.sum(res.radiance), jnp.sum(res.ray_count)

        # sync by fetching the ray count (block_until_ready is a no-op
        # under the axon tunnel); wall times carry ~27 ms of per-call
        # roundtrip — compare DIFFERENCES between depths, not absolutes
        s, r = frame(0); _ = int(r)
        for i in range(2):
            s, r = frame(i + 1); _ = int(r)
        ts, cs = [], []
        for i in range(8):
            t0 = time.time()
            s, r = frame(i + 3)
            cs.append(int(r))
            ts.append(time.time() - t0)
        med = float(np.median(ts))
        print(f"depth {depth:2d}: {med*1e3:6.1f} ms/frame (incl. sync)  "
              f"segs {np.mean(cs)/1e6:5.2f}M", flush=True)

    # --- refill kernel: the r5 answer to the dead-work tail ---
    # Per-frame cost should FLATTEN once segments saturate (~depth 8):
    # lanes drain a 30-frame sample queue back-to-back, so added depth
    # only lengthens the rare deep paths, not every lane's iteration
    # count.  (The per-frame kernel above keeps growing ~1.8 ms/bounce.)
    from tpt.kernels.trace import pallas_trace_progressive
    F = 30
    print("refill kernel (30-frame blocks):", flush=True)
    for depth in (4, 8, 13, 20):
        def block(f0, depth=depth):
            res = pallas_trace_progressive(
                scene, inv_p, inv_v, jnp.int32(f0),
                jnp.float32(cam.focal_length),
                jnp.float32(cam.aperture_diameter),
                width=W, height=H, ray_depth=depth, spp=1, n_frames=F,
                counts=(48, 7))
            return jnp.sum(res.rad_sum), jnp.sum(res.ray_count)

        s, r = block(0); _ = int(r)
        ts, cs = [], []
        for i in range(5):
            t0 = time.time()
            s, r = block((i + 1) * F)
            cs.append(int(r))
            ts.append(time.time() - t0)
        med = float(np.median(ts))
        print(f"depth {depth:2d}: {med/F*1e3:6.2f} ms/frame  "
              f"segs {np.mean(cs)/F/1e6:5.2f}M/frame  "
              f"({np.mean(cs)/med/1e6:5.0f} Mrays/s kernel-only)",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
