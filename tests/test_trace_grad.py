"""Pallas backward kernel vs reverse-mode AD through the XLA oracle.

trace_diff (kernel forward + kernel backward) composed with the blocked env
fetch must produce the same loss gradients as jax.grad through the oracle
renderer — for materials, sphere geometry, cuboid bounds, inverse matrices,
focal length and aperture.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from tpt import camera
from tpt.config import CameraConfig
from tpt.env import constant_environment, pack_block_table
from tpt.integrator import (apply_environment, apply_environment_blocked,
                            camera_params, compose_trace_fn,
                            make_scene_scan_fn, make_xla_gather_fn,
                            trace_paths)
from tpt.kernels.trace_grad import trace_diff
from tpt.scene import cornell_scene, demo_scene

W, H, DEPTH, SPP = 20, 12, 3, 1
ENV = constant_environment((0.3, 0.45, 0.6))
ENV_TABLE = pack_block_table(ENV)


def oracle_loss(scene, inv_p, inv_v, focal, aperture, counts, g):
    cam = camera_params(inv_p, inv_v, focal, aperture)
    scan = make_scene_scan_fn(scene, counts=counts)
    trace = compose_trace_fn(scan, make_xla_gather_fn(scene))
    py = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    px = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    res = trace_paths(trace, cam, px, py, W, H, jnp.int32(0), DEPTH, SPP)
    return jnp.sum(apply_environment(res, ENV, SPP) * g)


def kernel_loss(scene, inv_p, inv_v, focal, aperture, counts, g):
    res = trace_diff(scene, inv_p, inv_v, jnp.int32(0), focal, aperture,
                     jnp.int32(0), W, H, DEPTH, SPP, counts)
    return jnp.sum(apply_environment_blocked(res, ENV_TABLE, SPP) * g)


def check_grads(builder, cam_cfg, counts):
    scene = builder.build()
    inv_p, inv_v, _ = camera.camera_matrices(cam_cfg, W, H)
    g = jnp.asarray(np.random.default_rng(5).normal(
        size=(3, H, W)).astype(np.float32))
    focal = jnp.float32(cam_cfg.focal_length)
    ap = jnp.float32(cam_cfg.aperture_diameter)

    def wrap(loss):
        def f(sm, cm, spr, cmin, cmax, ivp, ivv, fo, a):
            s = dataclasses.replace(scene, sphere_material=sm,
                                    cuboid_material=cm, sphere_pos_radius=spr,
                                    cuboid_min=cmin, cuboid_max=cmax)
            return loss(s, ivp, ivv, fo, a, counts, g)
        return jax.jit(jax.grad(f, argnums=tuple(range(9))))

    args = (scene.sphere_material, scene.cuboid_material,
            scene.sphere_pos_radius, scene.cuboid_min, scene.cuboid_max,
            inv_p, inv_v, focal, ap)
    want = wrap(oracle_loss)(*args)
    got = wrap(kernel_loss)(*args)
    names = ["sphere_mat", "cuboid_mat", "sphere_pos_radius", "cuboid_min",
             "cuboid_max", "inv_proj", "inv_view", "focal", "aperture"]
    for w, gg, name in zip(want, got, names):
        w, gg = np.asarray(w), np.asarray(gg)
        assert np.isfinite(gg).all(), name
        scale = max(np.abs(w).max(), 1e-3)
        # the inverse-matrix gradients are cancellation-dominated in these
        # enclosed scenes (analytic value near zero; f32 remnants ~1e-7 per
        # hundreds of pixel contributions), so their comparison needs an
        # absolute floor above summation-order noise
        atol = max(3e-4 * scale,
                   1e-6 if name in ("inv_proj", "inv_view") else 0.0)
        np.testing.assert_allclose(gg, w, rtol=3e-4, atol=atol, err_msg=name)


def test_grad_kernel_matches_oracle_cornell():
    cam_cfg = CameraConfig(position=(0.0, 0.5, 2.0), look_x=-90.0,
                           look_y=-5.0, focal_length=8.0,
                           aperture_diameter=0.1)
    check_grads(cornell_scene(), cam_cfg, (4, 0))


def test_grad_kernel_matches_oracle_demo_subset():
    # a 10-sphere/7-cuboid subset of the demo scene: full 55-primitive
    # unrolled+vjp'd interpret-mode graphs blow XLA:CPU compile time; the
    # full-scale configuration runs on TPU via benchmarks/train_bench.py
    check_grads(demo_scene(), CameraConfig(), (10, 7))


def test_grad_kernel_matches_oracle_spp2():
    # spp > 1 exercises the backward's cross-sample seed chain: sample 1's
    # jitter/lens draws depend on sample 0's final bounce-loop seed, which
    # the reverse-sweep kernel recomputes rather than stores
    global SPP
    old = SPP
    try:
        globals()["SPP"] = 2
        cam_cfg = CameraConfig(position=(0.0, 0.5, 2.0), look_x=-90.0,
                               look_y=-5.0, focal_length=8.0,
                               aperture_diameter=0.1)
        check_grads(cornell_scene(), cam_cfg, (4, 0))
    finally:
        globals()["SPP"] = old


def test_grad_kernel_matches_oracle_rr_off():
    """Fixed-depth (russian_roulette=False) differentiable transport: the
    inverse-rendering path uses it because RR divides surviving throughput
    by its max channel, making rendered values depend only on albedo
    RATIOS — the albedo scale is then invisible to any pixel loss (r4
    diagnosis, tpt.integrator.bounce_step docstring).  The kernel backward
    must match oracle AD in this mode too."""
    import dataclasses
    from tpt import camera
    from tpt.config import CameraConfig
    from tpt.env import constant_environment, pack_block_table
    from tpt.integrator import (apply_environment, apply_environment_blocked,
                                camera_params, compose_trace_fn,
                                make_scene_scan_fn, make_xla_gather_fn,
                                trace_paths)
    from tpt.kernels.trace_grad import trace_diff
    from tpt.scene import cornell_scene

    W, H, DEPTH, SPP = 40, 24, 3, 1
    scene = cornell_scene().build()
    cc = CameraConfig(position=(0.0, 0.5, 2.0), look_x=-90.0, look_y=-5.0,
                      focal_length=8.0, aperture_diameter=0.1)
    inv_p, inv_v, _ = camera.camera_matrices(cc, W, H)
    env = constant_environment((0.3, 0.45, 0.6))
    env_t = pack_block_table(env)

    def loss_kernel(sm):
        s = dataclasses.replace(scene, sphere_material=sm)
        res = trace_diff(s, inv_p, inv_v, jnp.int32(0), jnp.float32(8.0),
                         jnp.float32(0.1), jnp.int32(0), W, H, DEPTH, SPP,
                         (4, 5), None, "corner", False)
        return jnp.sum(apply_environment_blocked(res, env_t, SPP) ** 2)

    def loss_oracle(sm):
        s = dataclasses.replace(scene, sphere_material=sm)
        px = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        py = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        cam = camera_params(inv_p, inv_v, 8.0, 0.1)
        trace = compose_trace_fn(make_scene_scan_fn(s, counts=(4, 5)),
                                 make_xla_gather_fn(s))
        res = trace_paths(trace, cam, px, py, W, H, jnp.int32(0), DEPTH, SPP,
                          russian_roulette=False)
        return jnp.sum(apply_environment(res, env, SPP) ** 2)

    lk, gk = jax.value_and_grad(loss_kernel)(scene.sphere_material)
    lo, go = jax.value_and_grad(loss_oracle)(scene.sphere_material)
    np.testing.assert_allclose(float(lk), float(lo), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(go),
                               rtol=2e-4, atol=2e-5)
    # rr=False must differ from rr=True (no silent flag drop): fixed-depth
    # transport keeps more paths alive, changing the primal
    def loss_rr(sm):
        s = dataclasses.replace(scene, sphere_material=sm)
        res = trace_diff(s, inv_p, inv_v, jnp.int32(0), jnp.float32(8.0),
                         jnp.float32(0.1), jnp.int32(0), W, H, DEPTH, SPP,
                         (4, 5))
        return jnp.sum(apply_environment_blocked(res, env_t, SPP) ** 2)

    assert abs(float(loss_rr(scene.sphere_material)) - float(lk)) > 0.0
