"""Kernel tuning sweep: tile_rows x unroll x static/dynamic counts at 1080p.

Usage: python benchmarks/sweep_kernel.py [--quick]
Prints one line per variant: tile_rows, unroll, counts, compile_s, ms/frame,
Mrays/s.  Used to pick DEFAULT_TILE_ROWS / DEFAULT_UNROLL in tpt.kernels.trace.
"""

import argparse
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
from tpt.env import constant_environment
from tpt.integrator import apply_environment
from tpt.kernels.trace import pallas_trace


def run_variant(scene, inv_proj, inv_view, cam, width, height,
                tile_rows, unroll, counts, reps=8):
    def frame(i):
        res = pallas_trace(scene, inv_proj, inv_view, jnp.int32(i),
                           jnp.float32(cam.focal_length),
                           jnp.float32(cam.aperture_diameter),
                           width=width, height=height, ray_depth=13, spp=1,
                           tile_rows=tile_rows, counts=counts, unroll=unroll)
        return res.radiance, jnp.sum(res.ray_count)

    # sync by fetching the scalar ray count: under the axon tunnel
    # jax.block_until_ready does NOT wait for device completion
    t0 = time.time()
    rad, rays = frame(0)
    _ = int(rays)
    compile_s = time.time() - t0
    for i in range(2):
        rad, rays = frame(i + 1)
        _ = int(rays)
    times, counts_l = [], []
    for i in range(reps):
        t0 = time.time()
        rad, rays = frame(i + 3)
        counts_l.append(int(rays))
        times.append(time.time() - t0)
    med = float(np.median(times))
    mrays = float(np.mean(counts_l)) / med / 1e6
    return compile_s, med * 1e3, mrays


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()

    cam = CameraConfig()
    scene = demo_scene().build()
    inv_proj, inv_view, _ = camera_matrices(cam, args.width, args.height)

    variants = []
    if args.quick:
        for tr in [8, 16, 24, 32]:
            variants.append((tr, 1, (48, 7)))
    else:
        for tr in [8, 16, 24, 32, 64]:
            variants.append((tr, 0, None))
            variants.append((tr, 0, (48, 7)))
            variants.append((tr, 1, (48, 7)))

    print(f"{'tile':>4} {'unroll':>6} {'counts':>8} {'compile_s':>9} "
          f"{'ms/frame':>9} {'Mrays/s':>8}")
    for tr, un, counts in variants:
        try:
            c, ms, mr = run_variant(scene, inv_proj, inv_view, cam,
                                    args.width, args.height, tr, un, counts)
            print(f"{tr:>4} {un:>6} {str(counts):>8} {c:>9.1f} {ms:>9.1f} "
                  f"{mr:>8.1f}", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep survives bad variants
            print(f"{tr:>4} {un:>6} {str(counts):>8} FAILED: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
