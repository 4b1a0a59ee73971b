"""Camera matrix and ray-generation tests."""

import numpy as np
import jax.numpy as jnp

from tpt import camera
from tpt.config import CameraConfig


def test_perspective_inverse_consistency():
    p = camera.perspective(103.0, 1.0)
    pinv = camera.inverse_perspective(103.0, 1.0)
    np.testing.assert_allclose(np.asarray(p @ pinv), np.eye(4), atol=1e-5)


def test_look_at_inverse_consistency():
    eye = (1.0, 2.0, 3.0)
    target = (4.0, -1.0, 0.5)
    up = (0.0, 1.0, 0.0)
    v = camera.look_at(eye, target, up)
    vinv = camera.inverse_look_at(eye, target, up)
    np.testing.assert_allclose(np.asarray(v @ vinv), np.eye(4), atol=1e-5)


def test_view_direction_angles():
    # reference: src/Camera.cs:21-23 — yaw -90 deg looks along -z
    d = np.asarray(camera.view_direction(-90.0, 0.0))
    np.testing.assert_allclose(d, (0.0, 0.0, -1.0), atol=1e-6)
    d = np.asarray(camera.view_direction(0.0, 0.0))
    np.testing.assert_allclose(d, (1.0, 0.0, 0.0), atol=1e-6)


def test_center_ray_is_view_direction():
    cam = CameraConfig()
    inv_p, inv_v, pos = camera.camera_matrices(cam, 64, 64)
    o, d = camera.eye_ray(inv_p, inv_v, pos, jnp.array([0.0, 0.0]))
    vdir = np.asarray(camera.view_direction(cam.look_x, cam.look_y))
    np.testing.assert_allclose(np.asarray(d), vdir, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o), cam.position, atol=1e-6)


def test_corner_ray_fov():
    """The horizontal angle between left and right edge center rays ~ FOV."""
    cam = CameraConfig(position=(0, 0, 0), look_x=-90.0, look_y=0.0)
    inv_p, inv_v, pos = camera.camera_matrices(cam, 100, 100)
    _, d_left = camera.eye_ray(inv_p, inv_v, pos, jnp.array([-1.0, 0.0]))
    _, d_right = camera.eye_ray(inv_p, inv_v, pos, jnp.array([1.0, 0.0]))
    cos_angle = float(jnp.dot(d_left, d_right))
    angle = np.degrees(np.arccos(cos_angle))
    assert abs(angle - 103.0) < 0.1


def test_thin_lens_zero_aperture_keeps_ray():
    cam = CameraConfig()
    inv_p, inv_v, pos = camera.camera_matrices(cam, 64, 64)
    o, d = camera.eye_ray(inv_p, inv_v, pos, jnp.array([0.3, -0.2]))
    o2, d2 = camera.thin_lens(o, d, inv_v, 20.0, 0.0,
                              jnp.float32(0.7), jnp.float32(0.3))
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d), atol=1e-5)


def test_thin_lens_converges_at_focal_plane():
    """Rays from different lens points pass through the same focal point."""
    cam = CameraConfig(position=(0, 0, 0), look_x=-90.0, look_y=0.0)
    inv_p, inv_v, pos = camera.camera_matrices(cam, 64, 64)
    o, d = camera.eye_ray(inv_p, inv_v, pos, jnp.array([0.25, 0.1]))
    focal = 15.0
    fp = np.asarray(o) + np.asarray(d) * focal
    for ra, rr in [(0.1, 0.9), (0.5, 0.5), (0.9, 0.2)]:
        o2, d2 = camera.thin_lens(o, d, inv_v, focal, 0.5,
                                  jnp.float32(ra), jnp.float32(rr))
        # the new ray hits fp at t = |fp - o2|
        t = np.linalg.norm(fp - np.asarray(o2))
        hit = np.asarray(o2) + np.asarray(d2) * t
        np.testing.assert_allclose(hit, fp, atol=1e-4)
