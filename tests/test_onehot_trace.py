"""One-hot (MXU-gather) differentiable trace vs the standard oracle trace.

make_onehot_trace_fn is the gradient-path formulation used by the Pallas
backward kernel: detached fold, one-hot winner gather, recomputed t.  Its
primal must equal compose_trace_fn's exactly, and its gradients must match
reverse-mode AD through the standard oracle path.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tpt import camera
from tpt.config import CameraConfig
from tpt.integrator import (apply_environment, build_attr_table, camera_params,
                            compose_trace_fn, make_onehot_trace_fn,
                            make_scene_scan_fn, make_xla_gather_fn,
                            trace_paths)
from tpt.scene import cornell_scene, demo_scene
from tpt.env import constant_environment

W, H, DEPTH, SPP = 20, 12, 4, 1
ENV = constant_environment((0.3, 0.45, 0.6))


def _render(scene, counts, cam_cfg, use_onehot, sphere_mat=None,
            cuboid_mat=None, spr=None, focal=None):
    import dataclasses
    if sphere_mat is not None:
        scene = dataclasses.replace(scene, sphere_material=sphere_mat)
    if cuboid_mat is not None:
        scene = dataclasses.replace(scene, cuboid_material=cuboid_mat)
    if spr is not None:
        scene = dataclasses.replace(scene, sphere_pos_radius=spr)
    inv_p, inv_v, _ = camera.camera_matrices(cam_cfg, W, H)
    cam = camera_params(inv_p, inv_v,
                        cam_cfg.focal_length if focal is None else focal,
                        cam_cfg.aperture_diameter)
    scan = make_scene_scan_fn(scene, counts=counts)
    if use_onehot:
        table = build_attr_table(scene, counts)
        trace = make_onehot_trace_fn(scan, table, counts[0])
    else:
        trace = compose_trace_fn(scan, make_xla_gather_fn(scene))
    py = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    px = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    res = trace_paths(trace, cam, px, py, W, H, jnp.int32(0), DEPTH, SPP)
    return apply_environment(res, ENV, SPP)


def test_onehot_primal_bitexact():
    cam_cfg = CameraConfig(position=(0.0, 0.5, 2.0), look_x=-90.0,
                           look_y=-5.0, focal_length=8.0,
                           aperture_diameter=0.1)
    scene = cornell_scene().build()
    a = np.asarray(jax.jit(lambda: _render(scene, (4, 0), cam_cfg, False))())
    b = np.asarray(jax.jit(lambda: _render(scene, (4, 0), cam_cfg, True))())
    np.testing.assert_array_equal(a, b)


def test_onehot_primal_bitexact_demo():
    cam_cfg = CameraConfig()
    scene = demo_scene().build()
    a = np.asarray(jax.jit(lambda: _render(scene, (48, 7), cam_cfg, False))())
    b = np.asarray(jax.jit(lambda: _render(scene, (48, 7), cam_cfg, True))())
    np.testing.assert_array_equal(a, b)


def test_onehot_grads_match_oracle():
    """d(loss)/d(materials, sphere geometry, focal) agree between the
    one-hot formulation and plain reverse-mode through the oracle."""
    cam_cfg = CameraConfig(position=(0.0, 0.5, 2.0), look_x=-90.0,
                           look_y=-5.0, focal_length=8.0,
                           aperture_diameter=0.1)
    scene = cornell_scene().build()
    counts = (4, 0)
    g = jnp.asarray(np.random.default_rng(3).normal(
        size=(3, H, W)).astype(np.float32))

    def loss(use_onehot, sm, cm, spr, focal):
        img = _render(scene, counts, cam_cfg, use_onehot,
                      sphere_mat=sm, cuboid_mat=cm, spr=spr, focal=focal)
        return jnp.sum(img * g)

    args = (scene.sphere_material, scene.cuboid_material,
            scene.sphere_pos_radius, jnp.float32(cam_cfg.focal_length))
    grad_fn = jax.jit(jax.grad(lambda *a: loss(False, *a),
                               argnums=(0, 1, 2, 3)))
    want = grad_fn(*args)
    grad_fn1 = jax.jit(jax.grad(lambda *a: loss(True, *a),
                                argnums=(0, 1, 2, 3)))
    got = grad_fn1(*args)
    for w, gg, name in zip(want, got, ["sphere_mat", "cuboid_mat",
                                       "sphere_pos_radius", "focal"]):
        w, gg = np.asarray(w), np.asarray(gg)
        assert np.isfinite(gg).all(), name
        np.testing.assert_allclose(gg, w, rtol=2e-4, atol=2e-6, err_msg=name)
