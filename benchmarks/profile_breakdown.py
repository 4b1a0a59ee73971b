"""Where does the frame time go?  Times the Pallas kernel at varying depth,
the env-fetch pass, and the full pipeline, on the real chip."""
import time

import jax
import jax.numpy as jnp
import numpy as np

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
    t0 = time.time()
    jax.block_until_ready(fn())
    print(f"  [compile+first: {time.time()-t0:.1f}s]", flush=True)
    jax.block_until_ready(fn())
    ts = []
    for _ in range(n):
        t0 = time.time()
        jax.block_until_ready(fn())
        ts.append(time.time() - t0)
    return float(np.median(ts))


for depth in (1, 4, 13):
    t = timeit(lambda d=depth: pallas_trace(
        scene, inv_proj, inv_view, jnp.int32(5), jnp.float32(cam.focal_length),
        jnp.float32(cam.aperture_diameter), width=W, height=H,
        ray_depth=d, spp=1, counts=(48, 7)))
    print(f"trace depth={depth:2d}: {t*1e3:8.2f} ms")

res = pallas_trace(scene, inv_proj, inv_view, jnp.int32(5),
                   jnp.float32(cam.focal_length), jnp.float32(cam.aperture_diameter),
                   width=W, height=H, ray_depth=13, spp=1, counts=(48, 7))
res = jax.block_until_ready(res)
envf = jax.jit(lambda r, e: apply_environment(r, e, 1))
t = timeit(lambda: envf(res, env_faces))
print(f"env fetch pass : {t*1e3:8.2f} ms")

t = timeit(lambda: render_fields(
    scene, env_faces, inv_proj, inv_view, pos, jnp.int32(5),
    jnp.float32(cam.focal_length), jnp.float32(cam.aperture_diameter),
    width=W, height=H, ray_depth=13, spp=1, counts=(48, 7))[0])
print(f"full frame     : {t*1e3:8.2f} ms")
rays = int(render_fields(
    scene, env_faces, inv_proj, inv_view, pos, jnp.int32(5),
    jnp.float32(cam.focal_length), jnp.float32(cam.aperture_diameter),
    width=W, height=H, ray_depth=13, spp=1, counts=(48, 7))[1])
print(f"rays/frame     : {rays/1e6:.2f} M  (E[seg/pixel] = {rays/(W*H):.2f})")
