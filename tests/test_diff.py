"""Differentiable-rendering tests: custom VJP consistency + finite differences."""

import numpy as np
import jax
import jax.numpy as jnp

from tpt import camera
from tpt.config import CameraConfig
from tpt.diff import DiffInputs, render_diff, _oracle_image
from tpt.env import constant_environment
from tpt.scene import cornell_scene

W, H, DEPTH, SPP = 24, 16, 3, 1
COUNTS = (4, 0)


def setup():
    cam = CameraConfig(position=(0.0, 0.5, 2.0), look_x=-90.0, look_y=-5.0,
                       focal_length=8.0, aperture_diameter=0.1)
    scene = cornell_scene().build()
    inv_p, inv_v, _pos = camera.camera_matrices(cam, W, H)
    env = constant_environment((0.3, 0.45, 0.6), size=4)
    diff = DiffInputs.from_scene(scene, env, 8.0, 0.1)
    return diff, inv_p, inv_v


def test_primal_matches_oracle():
    diff, inv_p, inv_v = setup()
    fast = render_diff(diff, inv_p, inv_v, jnp.int32(0), W, H, DEPTH, SPP, COUNTS)
    slow = _oracle_image(diff, inv_p, inv_v, jnp.int32(0), W, H, DEPTH, SPP, COUNTS)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               rtol=1e-5, atol=1e-6)


def test_gradients_finite_and_match_oracle_grads():
    diff, inv_p, inv_v = setup()

    def loss_fast(d):
        return jnp.sum(render_diff(d, inv_p, inv_v, jnp.int32(0),
                                   W, H, DEPTH, SPP, COUNTS) ** 2)

    def loss_slow(d):
        return jnp.sum(_oracle_image(d, inv_p, inv_v, jnp.int32(0),
                                     W, H, DEPTH, SPP, COUNTS) ** 2)

    g_fast = jax.grad(loss_fast)(diff)
    g_slow = jax.grad(loss_slow)(diff)
    for name, a, b in zip(DiffInputs._fields, g_fast, g_slow):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all(), name
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5, err_msg=name)
    # env gradient is live (misses exist in a 4-sphere scene)
    assert float(jnp.abs(g_fast.env_faces).sum()) > 0


def test_emissive_gradient_finite_difference():
    """Emission never enters discrete decisions -> FD must match AD."""
    diff, inv_p, inv_v = setup()

    def loss(em):
        d = diff._replace(sphere_material=diff.sphere_material.at[3, 4].set(em))
        return jnp.sum(render_diff(d, inv_p, inv_v, jnp.int32(0),
                                   W, H, DEPTH, SPP, COUNTS))

    x0 = jnp.float32(diff.sphere_material[3, 4])
    ad = float(jax.grad(loss)(x0))
    eps = 0.05
    fd = (float(loss(x0 + eps)) - float(loss(x0 - eps))) / (2 * eps)
    np.testing.assert_allclose(ad, fd, rtol=2e-2)


def test_focal_aperture_gradients_exist():
    """Thin-lens DoF params are differentiable (BASELINE config 3).

    Needs a direction-dependent environment: with a constant env and a
    diffuse scene the detached-decision gradient w.r.t. lens parameters is
    *legitimately* zero (lens perturbations only move directions, and
    radiance is piecewise-constant in direction away from silhouettes).
    A graded sky makes the continuous env term respond."""
    diff, inv_p, inv_v = setup()
    grad_env = np.zeros((6, 8, 8, 3), np.float32)
    ramp = np.linspace(0.0, 1.0, 8, dtype=np.float32)
    grad_env[:, :, :, 0] = ramp[None, :, None]       # red ramps along t
    grad_env[:, :, :, 1] = ramp[None, None, :]       # green ramps along s
    grad_env[:, :, :, 2] = 0.5
    diff = diff._replace(env_faces=jnp.asarray(grad_env))

    def loss(focal, aperture):
        d = diff._replace(focal_length=focal, aperture_diameter=aperture)
        return jnp.sum(render_diff(d, inv_p, inv_v, jnp.int32(0),
                                   W, H, DEPTH, SPP, COUNTS) ** 2)

    gf, ga = jax.grad(loss, argnums=(0, 1))(jnp.float32(8.0), jnp.float32(0.3))
    assert np.isfinite(float(gf)) and np.isfinite(float(ga))
    assert float(ga) != 0.0
    assert float(gf) != 0.0
    # finite-difference agreement on the aperture axis
    eps = 1e-2
    fd = (float(loss(jnp.float32(8.0), jnp.float32(0.3 + eps)))
          - float(loss(jnp.float32(8.0), jnp.float32(0.3 - eps)))) / (2 * eps)
    np.testing.assert_allclose(float(ga), fd, rtol=0.1)


def test_geometry_gradients_exist():
    """Position/radius gradients flow through hit normals into bounce
    directions and the (graded) environment term."""
    diff, inv_p, inv_v = setup()
    grad_env = np.zeros((6, 8, 8, 3), np.float32)
    grad_env[..., 0] = np.linspace(0, 1, 8, dtype=np.float32)[None, :, None]
    grad_env[..., 1] = np.linspace(0, 1, 8, dtype=np.float32)[None, None, :]
    grad_env[..., 2] = 0.5
    diff = diff._replace(env_faces=jnp.asarray(grad_env))

    def loss(spr):
        d = diff._replace(sphere_pos_radius=spr)
        return jnp.sum(render_diff(d, inv_p, inv_v, jnp.int32(0),
                                   W, H, DEPTH, SPP, COUNTS) ** 2)

    g = jax.grad(loss)(diff.sphere_pos_radius)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g[:4]).sum() > 0  # real spheres get gradient
    assert np.abs(g[4:]).sum() == 0  # padded slots stay zero
