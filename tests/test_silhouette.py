"""Silhouette (boundary) gradients for sphere geometry.

The headline check: on a silhouette-dominated view, interior + boundary
gradients must agree with a finite difference of the true (matched-seed)
loss in sign and magnitude — r4's interior-only gradients pointed the
WRONG WAY (radius inflated; PERF.md), which is exactly what the boundary
term fixes.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpt import camera
from tpt.config import CameraConfig
from tpt.env import constant_environment
from tpt.integrator import (apply_environment, camera_params,
                            compose_trace_fn, make_scene_scan_fn,
                            make_xla_gather_fn, trace_paths)
from tpt.materials import Material
from tpt.scene import SceneBuilder
from tpt.silhouette import (forward_matrices, geometry_grad,
                            project_to_screen, silhouette_points)

W, H, DEPTH = 96, 96, 2
CAM = CameraConfig(position=(0.0, 0.0, 6.0), look_x=-90.0, look_y=0.0,
                   focal_length=8.0, aperture_diameter=0.0)
ENV = constant_environment((0.15, 0.2, 0.3))


def _scene(center=(0.0, 0.0, 0.0), radius=1.2):
    b = SceneBuilder()
    b.add_sphere(center, radius, Material.make(
        (0.85, 0.3, 0.2), (0, 0, 0), (0, 0, 0), 0.0, 0.0, 1.0, 0.0, 0.0))
    return b.build()


def _render(scene, frame=0):
    inv_p, inv_v, _ = camera.camera_matrices(CAM, W, H)
    cpar = camera_params(inv_p, inv_v, jnp.float32(CAM.focal_length),
                         jnp.float32(0.0))
    trace = compose_trace_fn(make_scene_scan_fn(scene, counts=(1, 0)),
                             make_xla_gather_fn(scene))
    py = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    px = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    res = trace_paths(trace, cpar, px, py, W, H, jnp.int32(frame), DEPTH, 1,
                      russian_roulette=False)
    return jnp.moveaxis(apply_environment(res, ENV, 1), 0, -1)


def test_projection_matches_eye_rays():
    # project_to_screen must invert the tracer's eye-ray construction: a
    # ray through the projected pixel passes through the world point
    from tpt.integrator import primary_ray
    proj, view = forward_matrices(CAM, W, H)
    pts = jnp.asarray([[0.5, -0.3, 0.2], [-1.0, 0.8, -1.5]], jnp.float32)
    xy = project_to_screen(proj, view, pts, W, H)
    inv_p, inv_v, _ = camera.camera_matrices(CAM, W, H)
    cpar = camera_params(inv_p, inv_v, jnp.float32(CAM.focal_length),
                         jnp.float32(0.0))
    zero = xy[:, 0] * 0.0
    o, d = primary_ray(cpar, xy[:, 0], xy[:, 1], W, H,
                       (zero, zero, zero, zero))
    o = np.asarray(o).T
    d = np.asarray(d).T
    for k in range(2):
        to_p = np.asarray(pts[k]) - o[k]
        cos = np.dot(to_p / np.linalg.norm(to_p), d[k])
        assert cos > 0.99999, cos


def test_silhouette_points_are_tangent():
    # every silhouette point p satisfies (p - c) . (p - eye) == 0 and
    # |p - c| == r (tangency circle geometry)
    center = jnp.asarray([0.3, -0.2, -1.0], jnp.float32)
    eye = jnp.asarray(CAM.position, jnp.float32)
    phis = jnp.linspace(0.0, 2 * np.pi, 16, endpoint=False)
    p = silhouette_points(center, 1.2, eye, phis)
    rad = np.linalg.norm(np.asarray(p - center[None]), axis=-1)
    np.testing.assert_allclose(rad, 1.2, rtol=1e-5)
    dots = np.sum(np.asarray(p - center[None]) * np.asarray(p - eye[None]),
                  axis=-1)
    np.testing.assert_allclose(dots, 0.0, atol=1e-4)


def test_position_grad_matches_finite_difference():
    """Central finite difference of the matched-seed loss vs interior +
    boundary gradient for x-position — the axis the r4 estimator could
    not handle.  The FD crosses many per-pixel visibility flips, so it
    approximates the expected-loss derivative; agreement is checked in
    sign and to ~35%."""
    axis, delta = 0, 0.05
    scene = _scene()
    target = _render(_scene(center=(0.25, 0.1, 0.0), radius=1.05))

    def loss_at(spr_val):
        s = dataclasses.replace(
            scene, sphere_pos_radius=scene.sphere_pos_radius
            .at[0, axis].set(spr_val))
        img = _render(s)
        return float(jnp.mean((img - target) ** 2))

    base = float(scene.sphere_pos_radius[0, axis])
    fd = (loss_at(base + delta) - loss_at(base - delta)) / (2 * delta)

    rendered = _render(scene)
    g = geometry_grad(scene, CAM, ENV, rendered, target, 0, [0],
                      width=W, height=H, ray_depth=DEPTH, counts=(1, 0),
                      n_edge=1024)
    got = float(g[0, axis])
    assert np.sign(got) == np.sign(fd), (got, fd)
    assert abs(got - fd) < 0.35 * abs(fd), (got, fd)


def test_radius_grad_matches_analytic():
    """Depth-1 makes the image exactly (0 inside the silhouette disc, env
    outside): the loss is an annulus-area integral with a closed-form
    radius derivative dL/dr = 2 pi rho drho/dr sum(env^2)/(H W 3).  The
    boundary estimator must land within 25% (residual: the perspective
    silhouette is an ellipse treated circularly here + nearest-pixel
    loss-derivative sampling at a ~8 px disc).  Pixel-flip FD noise at
    this scale is ~2x — this is the check FD cannot provide."""
    from tpt.silhouette import (forward_matrices, project_to_screen,
                                silhouette_points, sphere_silhouette_grad)
    r, rt = 1.2, 1.05
    scene = _scene(radius=r)

    def render1(s):
        # ray_depth 1: hit lanes never escape -> exact two-tone image
        inv_p, inv_v, _ = camera.camera_matrices(CAM, W, H)
        cpar = camera_params(inv_p, inv_v, jnp.float32(CAM.focal_length),
                             jnp.float32(0.0))
        trace = compose_trace_fn(make_scene_scan_fn(s, counts=(1, 0)),
                                 make_xla_gather_fn(s))
        py = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        px = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        res = trace_paths(trace, cpar, px, py, W, H, jnp.int32(0), 1, 1,
                          russian_roulette=False)
        return jnp.moveaxis(apply_environment(res, ENV, 1), 0, -1)

    target = render1(_scene(radius=rt))
    rendered = render1(scene)

    eye = np.asarray(CAM.position, np.float32)
    proj, view = forward_matrices(CAM, W, H)

    def rho_screen(rr):
        phis = jnp.linspace(0.0, 2 * np.pi, 64, endpoint=False)
        p = silhouette_points(jnp.zeros(3, jnp.float32), rr,
                              jnp.asarray(eye), phis)
        xy = np.asarray(project_to_screen(proj, view, p, W, H))
        return np.linalg.norm(xy - xy.mean(0), axis=1).mean()

    rho = rho_screen(r)
    drho = (rho_screen(r + 1e-3) - rho_screen(r - 1e-3)) / 2e-3
    env2 = float(np.sum(np.asarray(ENV)[0, 0, 0] ** 2))
    want = 2 * np.pi * rho * drho * env2 / (H * W * 3)

    _d_c, d_r = sphere_silhouette_grad(
        scene, CAM, ENV, rendered, target, 0, sphere_idx=0, width=W,
        height=H, ray_depth=1, counts=(1, 0), n_edge=2048)
    got = float(d_r)
    assert got > 0  # growing past the target radius increases the loss
    assert abs(got - want) < 0.25 * want, (got, want)


def test_boundary_term_dominates_interior_for_position():
    """With a diffuse sphere on a constant background, the interior-only
    position gradient is near-useless (the r4 diagnosis); the boundary
    term must contribute the bulk of the true derivative."""
    scene = _scene()
    target = _render(_scene(center=(0.3, 0.0, 0.0)))
    rendered = _render(scene)
    g_full = geometry_grad(scene, CAM, ENV, rendered, target, 0, [0],
                           width=W, height=H, ray_depth=DEPTH,
                           counts=(1, 0), n_edge=512)
    # interior-only: same call with zero edge weight via n_edge-less path
    import tpt.silhouette as sil
    d_c, d_r = sil.sphere_silhouette_grad(
        scene, CAM, ENV, rendered, target, 0, sphere_idx=0, width=W,
        height=H, ray_depth=DEPTH, counts=(1, 0), n_edge=512)
    g_interior_x = float(g_full[0, 0]) - float(d_c[0])
    # moving +x reduces the loss (target sphere sits at +x): d loss/d x < 0
    assert float(g_full[0, 0]) < 0.0
    assert abs(float(d_c[0])) > abs(g_interior_x)
