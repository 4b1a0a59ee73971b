"""Pallas kernel vs XLA oracle parity (interpreter mode on CPU).

The kernel and oracle share the integrator source, so this validates the
Pallas lowering: tiling, SMEM scalar access, masked loops, RNG in-kernel.
"""

import numpy as np
import jax.numpy as jnp

from tpt import camera
from tpt.config import CameraConfig
from tpt.env import constant_environment
from tpt.kernels.render import render_fields as kernel_render
from tpt.reference import render_fields as oracle_render
from tpt.scene import cornell_scene, demo_scene

ENV = (0.3, 0.45, 0.6)


def run_pair(builder, cam, width, height, frame, ray_depth, spp):
    scene = builder.build()
    inv_p, inv_v, pos = camera.camera_matrices(cam, width, height)
    env_faces = constant_environment(ENV)
    args = (scene, env_faces, inv_p, inv_v, pos, jnp.int32(frame),
            jnp.float32(cam.focal_length), jnp.float32(cam.aperture_diameter))
    kwargs = dict(width=width, height=height, ray_depth=ray_depth, spp=spp)
    a, ra = kernel_render(*args, **kwargs)
    b, rb = oracle_render(*args, **kwargs)
    return np.asarray(a), np.asarray(b), int(ra), int(rb)


def test_kernel_matches_oracle_cornell():
    cam = CameraConfig(position=(0.0, 0.5, 2.0), look_x=-90.0, look_y=-5.0,
                       focal_length=8.0, aperture_diameter=0.1)
    a, b, ra, rb = run_pair(cornell_scene(), cam, 32, 24, 0, 4, 1)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    assert ra == rb


def test_kernel_matches_oracle_demo():
    cam = CameraConfig()
    a, b, ra, rb = run_pair(demo_scene(), cam, 40, 24, 2, 13, 2)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    assert ra == rb


def test_kernel_nonaligned_size():
    """Image sizes that don't divide the tile shape exercise padding."""
    cam = CameraConfig(position=(0.0, 0.5, 2.0), look_x=-90.0, look_y=-5.0,
                       focal_length=8.0, aperture_diameter=0.0)
    a, b, _, _ = run_pair(cornell_scene(), cam, 17, 9, 1, 3, 1)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
