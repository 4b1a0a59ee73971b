"""tpt.optim: the library inverse-rendering recipe.

Covers the clipped-Adam step (loss decreases, params move toward truth),
bitwise checkpoint/resume mid-optimization (SURVEY §5), and the
make_train_step(optimizer=...) sharded path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpt import camera
from tpt.config import CameraConfig, RenderConfig
from tpt.env import constant_environment, pack_block_table
from tpt.optim import (clipped_adam, load_optim_checkpoint, make_inverse_step,
                       make_renderer, save_optim_checkpoint)
from tpt.scene import cornell_scene

W, H, DEPTH, SPP = 16, 12, 2, 1
COUNTS = (4, 0)
CAM = CameraConfig(position=(0.0, 0.5, 2.0), look_x=-90.0, look_y=-5.0,
                   focal_length=8.0, aperture_diameter=0.0)
ENV_TABLE = pack_block_table(constant_environment((0.3, 0.45, 0.6)))


def _problem():
    scene = cornell_scene().build()
    render = make_renderer(scene, [CAM], width=W, height=H, ray_depth=DEPTH,
                           spp=SPP, counts=COUNTS, env_table=ENV_TABLE)
    true_sm = scene.sphere_material
    true_cm = scene.cuboid_material
    targets = jnp.stack([jnp.stack([render(true_sm, true_cm,
                                           jnp.int32(f), 0)])
                         for f in range(1)])  # [grad_frames=1, views=1, ...]
    sm0 = np.asarray(true_sm).copy()
    sm0[1, 0:3] = [0.9, 0.1, 0.6]   # perturb the red sphere's albedo
    mask_s = np.zeros_like(sm0)
    mask_s[1, 0:3] = 1.0
    mask = (jnp.asarray(mask_s), jnp.zeros_like(true_cm))
    params = (jnp.asarray(sm0), true_cm)
    return scene, render, params, targets, mask, true_sm


def test_inverse_step_recovers_albedo():
    scene, render, params, targets, mask, true_sm = _problem()
    opt = clipped_adam(0.02, total_steps=60)
    step = make_inverse_step(render, opt, n_views=1, param_mask=mask)
    state = opt.init(params)
    err0 = float(jnp.abs(params[0][1, 0:3] - true_sm[1, 0:3]).mean())
    first = None
    for i in range(60):
        params, state, loss = step(params, state, jnp.int32(0), targets)
        if first is None:
            first = float(loss)
    err = float(jnp.abs(params[0][1, 0:3] - true_sm[1, 0:3]).mean())
    assert float(loss) < first * 0.25
    assert err < err0 * 0.35
    # frozen entries never moved
    np.testing.assert_array_equal(np.asarray(params[0][0]),
                                  np.asarray(true_sm[0]))


def test_checkpoint_resume_is_bitwise(tmp_path):
    scene, render, params, targets, mask, _ = _problem()
    opt = clipped_adam(0.02)
    step = make_inverse_step(render, opt, n_views=1, param_mask=mask)
    state = opt.init(params)
    # 3 steps, checkpoint, 3 more -> reference trajectory
    for i in range(3):
        params, state, loss = step(params, state, jnp.int32(i), targets)
    path = str(tmp_path / "opt.npz")
    save_optim_checkpoint(path, params, state, step=3)
    ref_params, ref_state = params, state
    for i in range(3, 6):
        ref_params, ref_state, _ = step(ref_params, ref_state,
                                        jnp.int32(i), targets)
    # resume from the file and replay: identical continuation
    example = (jnp.zeros_like(params[0]), jnp.zeros_like(params[1]))
    r_params, r_state, start = load_optim_checkpoint(path, opt, example)
    assert start == 3
    for i in range(start, 6):
        r_params, r_state, _ = step(r_params, r_state, jnp.int32(i), targets)
    for a, b in zip(ref_params, r_params):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_make_train_step_with_optimizer():
    from tpt.parallel import make_mesh, make_train_step
    cfg = RenderConfig(width=16, height=8, ray_depth=2, spp=1)
    import jax
    mesh = make_mesh(dp=2, sp=1, devices=jax.devices()[:2])
    scene = cornell_scene().build()
    inv_p, inv_v, _ = camera.camera_matrices(CAM, cfg.width, cfg.height)
    env = constant_environment((0.3, 0.45, 0.6))
    opt = clipped_adam(0.05)

    from tpt.parallel import make_dist_renderer
    render = make_dist_renderer(mesh, cfg)
    target, _ = render(scene, env, inv_p, inv_v, CAM.focal_length,
                       CAM.aperture_diameter, 0)

    sm0 = np.asarray(scene.sphere_material).copy()
    sm0[0, 0:3] = [0.9, 0.1, 0.6]   # the floor sphere — visible everywhere
    import dataclasses
    start = dataclasses.replace(scene, sphere_material=jnp.asarray(sm0))

    step = make_train_step(mesh, cfg, counts=COUNTS, optimizer=opt)
    params = (start.sphere_material, start.cuboid_material)
    state = opt.init(params)
    s, losses = start, []
    for i in range(4):
        s, state, loss = step(s, env, inv_p, inv_v, CAM.focal_length,
                              CAM.aperture_diameter, 0, target, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert not np.array_equal(np.asarray(s.sphere_material), sm0)
