"""End-to-end parity: jnp integrator vs the independent NumPy ground truth.

This is the framework's version of the reference's CPU/GLSL duplicated
intersection math (SURVEY.md §4), promoted to a real test: the whole
integrator — RNG stream, scan order, BSDF branches, RR, DoF — must agree.
"""

import numpy as np
import jax.numpy as jnp

from tpt import camera
from tpt.config import CameraConfig
from tpt.env import constant_environment, sample_environment
from tpt.reference import render_fields, render_fields_vmap
from tpt.scene import cornell_scene, demo_scene

import numpy_oracle as npo


def np_env_fn(color):
    color = np.asarray(color, np.float32)

    def fn(_d):
        return color

    return fn


ENV_COLOR = (0.3, 0.45, 0.6)


def run_both(scene_builder, cam: CameraConfig, width, height, frame,
             ray_depth, spp):
    scene = scene_builder.build()
    inv_p, inv_v, pos = camera.camera_matrices(cam, width, height)
    env_faces = constant_environment(ENV_COLOR)
    got, rays = render_fields(
        scene, env_faces, inv_p, inv_v, pos, jnp.int32(frame),
        jnp.float32(cam.focal_length), jnp.float32(cam.aperture_diameter),
        width=width, height=height, ray_depth=ray_depth, spp=spp)
    want = npo.render(npo.scene_from_tpt(scene), np_env_fn(ENV_COLOR),
                      np.asarray(inv_p), np.asarray(inv_v), np.asarray(pos),
                      width, height, frame, ray_depth, spp,
                      cam.focal_length, cam.aperture_diameter)
    return np.asarray(got), want, int(rays)


def test_cornell_parity():
    """BASELINE.json config 1: Cornell 4-sphere, small image, fixed RNG."""
    cam = CameraConfig(position=(0.0, 0.5, 2.0), look_x=-90.0, look_y=-5.0,
                       focal_length=8.0, aperture_diameter=0.0)
    got, want, rays = run_both(cornell_scene(), cam, 16, 16, frame=0,
                               ray_depth=4, spp=1)
    assert rays > 0
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_cornell_parity_with_dof_and_spp():
    cam = CameraConfig(position=(0.0, 0.5, 2.0), look_x=-90.0, look_y=-5.0,
                       focal_length=8.0, aperture_diameter=0.3)
    got, want, _ = run_both(cornell_scene(), cam, 8, 8, frame=3,
                            ray_depth=5, spp=3)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_demo_scene_parity():
    """The full demo scene: glass, absorption, mirror walls, area light."""
    cam = CameraConfig()  # reference defaults
    got, want, _ = run_both(demo_scene(), cam, 12, 12, frame=1,
                            ray_depth=13, spp=1)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_vmap_oracle_matches_batched():
    cam = CameraConfig(position=(0.0, 0.5, 2.0), look_x=-90.0, look_y=-5.0,
                       focal_length=8.0, aperture_diameter=0.1)
    scene = cornell_scene().build()
    inv_p, inv_v, pos = camera.camera_matrices(cam, 8, 8)
    env_faces = constant_environment(ENV_COLOR)
    kwargs = dict(width=8, height=8, ray_depth=4, spp=2)
    a, ra = render_fields(scene, env_faces, inv_p, inv_v, pos, jnp.int32(0),
                          jnp.float32(8.0), jnp.float32(0.1), **kwargs)
    b, rb = render_fields_vmap(scene, env_faces, inv_p, inv_v, pos, jnp.int32(0),
                               jnp.float32(8.0), jnp.float32(0.1), **kwargs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)
    assert int(ra) == int(rb)


def test_emissive_direct_hit():
    """A camera staring straight at an emissive sphere sees its emission."""
    from tpt.scene import SceneBuilder
    from tpt.materials import Material
    b = SceneBuilder()
    b.add_sphere((0, 0, -5), 3.0, Material.make(
        (0, 0, 0), (2.0, 3.0, 4.0), (0, 0, 0), 0.0, 0.0, 1.0, 0.0, 0.0))
    cam = CameraConfig(position=(0, 0, 0), look_x=-90.0, look_y=0.0,
                       aperture_diameter=0.0, focal_length=5.0)
    scene = b.build()
    inv_p, inv_v, pos = camera.camera_matrices(cam, 4, 4)
    env_faces = constant_environment((0, 0, 0))
    img, _ = render_fields(scene, env_faces, inv_p, inv_v, pos, jnp.int32(0),
                           jnp.float32(5.0), jnp.float32(0.0),
                           width=4, height=4, ray_depth=2, spp=1)
    center = np.asarray(img)[2, 2]
    np.testing.assert_allclose(center, (2.0, 3.0, 4.0), rtol=1e-5)


def test_miss_sees_environment():
    from tpt.scene import SceneBuilder
    b = SceneBuilder()  # empty scene
    cam = CameraConfig(position=(0, 0, 0), look_x=-90.0, look_y=0.0,
                       aperture_diameter=0.0)
    scene = b.build()
    inv_p, inv_v, pos = camera.camera_matrices(cam, 4, 4)
    env_faces = constant_environment(ENV_COLOR)
    img, rays = render_fields(scene, env_faces, inv_p, inv_v, pos, jnp.int32(0),
                              jnp.float32(20.0), jnp.float32(0.0),
                              width=4, height=4, ray_depth=3, spp=1)
    np.testing.assert_allclose(np.asarray(img),
                               np.tile(ENV_COLOR, (4, 4, 1)), rtol=1e-5)
    assert int(rays) == 16  # each sample casts exactly one (missing) ray
