"""Microbenchmark harness for the trace kernel and env pass at 1080p.

Synchronization note: on the axon-tunnel platform `block_until_ready()`
returns before device execution completes, so every timed call is synced by
fetching a scalar reduction of the result to the host (the transfer cannot
complete before the program does).  Every timed call varies the `frame`
input so no layer (jit, runtime, RPC tunnel) can serve a cached result;
reported time is the median of n calls.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpt import CameraConfig, demo_scene
from tpt.camera import camera_matrices
from tpt.env import constant_environment
from tpt.integrator import apply_environment
from tpt.kernels.trace import pallas_trace
from tpt.kernels.render import render_fields

W, H = 1920, 1080
cam = CameraConfig()
scene = demo_scene().build()
inv_proj, inv_view, pos = camera_matrices(cam, W, H)
env_faces = constant_environment((0.7, 0.8, 1.0))


def timeit(fn, n=5):
    """fn(i) must return a jax scalar; fetching it syncs the device."""
    t0 = time.time()
    float(fn(0))
    compile_s = time.time() - t0
    ts = []
    for i in range(1, n + 1):
        t0 = time.time()
        float(fn(i))
        ts.append(time.time() - t0)
    return float(np.median(ts)), compile_s


def trace_scalar(i, depth):
    res = pallas_trace(
        scene, inv_proj, inv_view, jnp.int32(i), jnp.float32(cam.focal_length),
        jnp.float32(cam.aperture_diameter), width=W, height=H,
        ray_depth=depth, spp=1, counts=(48, 7))
    return res.radiance.sum() + jnp.sum(res.ray_count)


if __name__ == "__main__":
    for depth in (1, 2, 4, 13):
        t, c = timeit(lambda i, d=depth: trace_scalar(i, d))
        print(f"trace depth={depth:2d}: {t*1e3:8.2f} ms   [compile {c:.1f}s]",
              flush=True)

    res = pallas_trace(
        scene, inv_proj, inv_view, jnp.int32(0),
        jnp.float32(cam.focal_length), jnp.float32(cam.aperture_diameter),
        width=W, height=H, ray_depth=13, spp=1, counts=(48, 7))
    res = jax.tree.map(lambda x: x + 0, res)  # materialize
    envf = jax.jit(lambda r, e, s: apply_environment(
        r._replace(radiance=r.radiance + s), e, 1).sum())
    t, c = timeit(lambda i: envf(res, env_faces, jnp.float32(i) * 0))
    print(f"env fetch pass : {t*1e3:8.2f} ms   [compile {c:.1f}s]", flush=True)

    t, c = timeit(lambda i: render_fields(
        scene, env_faces, inv_proj, inv_view, pos, jnp.int32(i),
        jnp.float32(cam.focal_length), jnp.float32(cam.aperture_diameter),
        width=W, height=H, ray_depth=13, spp=1, counts=(48, 7))[0].sum())
    print(f"full frame     : {t*1e3:8.2f} ms   [compile {c:.1f}s]", flush=True)
