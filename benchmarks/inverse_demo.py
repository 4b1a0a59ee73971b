"""BASELINE config 5: demo-scene-scale inverse rendering on one chip.

Recovers perturbed material parameters (albedo + emissive across many
objects) of the 48-sphere/7-cuboid demo scene by pixel-MSE gradient descent
against a rendered target, using the production differentiable path
(Pallas forward + Pallas backward, tpt.kernels.trace_grad).

The detached-decision estimator's bias characterization: discrete choices
(BSDF lobe pick, Russian-roulette survival, closest-hit winner) carry no
gradient, so parameters are recovered through the continuous factors only
(throughput products, emission pickup, Fresnel weights, Beer exponents).
For albedo/emissive at fixed geometry this estimator is unbiased in
expectation over RNG (with fixed-depth transport — see --view help and
tpt.integrator.bounce_step); convergence below is the empirical check.

GEOMETRY recovery (sphere positions/radii) is out of scope by estimator
design, not by missing gradients: the detached closest-hit drops the
silhouette boundary term (moving a sphere changes WHICH pixels hit it),
and r4 probes show the interior-only gradient misleads — e.g. radius
drifts upward because growing the sphere reduces interior residuals while
the silhouette penalty is invisible.  Recovering geometry needs
edge-sampling / reparameterized estimators (Li 2018, Loubet 2019) — a
research feature beyond the reference's capability set.  The geometry
GRADIENTS themselves exist, are finite, and match oracle AD
(tests/test_diff.py::test_geometry_gradients_exist).

Usage: python benchmarks/inverse_demo.py [--steps N] [--size WxH]
"""
import argparse
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--size", default="512x512")
    ap.add_argument("--lr", type=float, default=0.005)
    ap.add_argument("--grad-frames", type=int, default=1,
                    help="independent RNG frames averaged per gradient step")
    ap.add_argument("--view", default="both",
                    choices=["both", "grid", "default"],
                    help="'grid' = identifiability view facing the 6x6 "
                         "sphere grid with a pinhole aperture; 'default' = "
                         "the reference camera (sees the two glass-sphere "
                         "rows the grid view cannot); 'both' = optimize "
                         "against both targets — every perturbed sphere is "
                         "observed by at least one view")
    ap.add_argument("--out", default="artifacts/inverse_demo.json")
    args = ap.parse_args()
    width, height = map(int, args.size.split("x"))

    import jax
    import jax.numpy as jnp
    from tpt.utils import enable_persistent_cache
    enable_persistent_cache()
    from tpt import CameraConfig, demo_scene
    from tpt.camera import camera_matrices
    from tpt.env import constant_environment, pack_block_table
    from tpt.integrator import apply_environment_blocked
    from tpt.kernels.trace_grad import trace_diff

    ray_depth, spp, counts = 8, 1, (48, 7)
    # Identifiability views (a parameter no light path observes cannot be
    # recovered by ANY estimator):
    #   grid    — faces the 6x6 grid (centers x in [-12, 10],
    #             y in [-11.2, 9.6], z = -5, just inside the green wall at
    #             z = -2.5; room interior z in [-22.5, -2.5]) head-on with
    #             a pinhole aperture;
    #   default — the reference camera, which observes the two glass-sphere
    #             rows at z = -20 that sit outside the grid view's frustum.
    grid_cam = CameraConfig(position=(-1.0, -0.8, -21.0), look_x=90.0,
                            look_y=0.0, aperture_diameter=0.0)
    default_cam = CameraConfig()
    cams = {"grid": [grid_cam], "default": [default_cam],
            "both": [grid_cam, default_cam]}[args.view]
    scene = demo_scene().build()
    views = []
    for c in cams:
        inv_p, inv_v, _ = camera_matrices(c, width, height)
        views.append((inv_p, inv_v, jnp.float32(c.focal_length),
                      jnp.float32(c.aperture_diameter)))
    env_table = pack_block_table(constant_environment((0.7, 0.8, 1.0)))

    def render(sm, cm, frame, view):
        inv_p, inv_v, focal, aperture = views[view]
        s = dataclasses.replace(scene, sphere_material=sm, cuboid_material=cm)
        # rr=False: fixed-depth differentiable transport.  With Russian
        # roulette active, survivor throughputs are divided by their max
        # channel, so the rendered values depend only on albedo RATIOS —
        # a pixel loss then cannot see the albedo scale (r4 diagnosis in
        # tpt.integrator.bounce_step) and recovery stalls.  Fixed depth
        # keeps the loss smooth; matched-seed targets make it exactly zero
        # at the true parameters.
        res = trace_diff(s, inv_p, inv_v, frame, focal, aperture,
                         jnp.int32(0), width, height, ray_depth, spp, counts,
                         None, "corner", False)
        return jnp.moveaxis(apply_environment_blocked(res, env_table, spp),
                            0, -1)

    # target: the true scene, fixed RNG stream
    true_sm, true_cm = scene.sphere_material, scene.cuboid_material

    @jax.jit
    def target_frame(frame):
        return jnp.stack([render(true_sm, true_cm, frame, v)
                          for v in range(len(views))])

    # Perturb and recover the parameters the light transport OBSERVES:
    # the 36 grid spheres' albedos (lanes 0:3) and the area light's
    # emissive (cuboid 1, lanes 4:7 — LoadScene order: floor, light, ...).
    # The 12 glass spheres (indices 36:48) are 98% refractive
    # (src/MainWindow.cs:225-243): their albedo multiplies throughput on
    # only the ~2% non-refracted interactions, so it is near-unidentifiable
    # from ANY view by ANY pixel-loss estimator — their observable color
    # parameter is the Beer absorbance, which the reference also uses for
    # their tint.  Recovery of a parameter requires the transport to carry
    # its signal; r4 restricts the perturbation to observable lanes and
    # reports MAE over exactly the perturbed set (earlier rounds perturbed
    # all 48 albedos and measured a floor made of the 12 unobservable
    # ones).
    rng = np.random.default_rng(11)
    sm0 = np.asarray(true_sm).copy()
    cm0 = np.asarray(true_cm).copy()
    N_OBS = 36
    sm0[:N_OBS, 0:3] = rng.uniform(0.2, 0.9, (N_OBS, 3))
    cm0[1, 4:7] = np.clip(cm0[1, 4:7] + rng.uniform(-2, 2, 3), 0.5, None)
    mask_s = np.zeros_like(sm0); mask_s[:N_OBS, 0:3] = 1.0
    mask_c = np.zeros_like(cm0); mask_c[1, 4:7] = 1.0

    # Clipped Adam: per-parameter scaling handles the orders-of-magnitude
    # spread between albedo and emissive gradients, and global-norm
    # clipping tames the firefly frames that fixed-depth (rr=False)
    # transport produces (a low-probability Fresnel lobe pick weights a
    # path by 1/p; with RR off nothing clamps it, so occasional frames
    # carry huge but correctly-signed gradients).  Constant lr for the
    # first 60%, cosine decay to ~0 after (the final MAE floor tracks
    # lr x gradient noise).
    import optax
    sched = optax.join_schedules(
        [optax.constant_schedule(args.lr),
         optax.cosine_decay_schedule(args.lr, max(args.steps * 2 // 5, 1),
                                     0.01)],
        [max(args.steps * 3 // 5, 1)])
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))

    @jax.jit
    def step(params, opt_state, frame, target):
        def loss_fn(p):
            # average the pixel-MSE over --grad-frames independent RNG
            # streams and all identifiability views: each frame is a fresh
            # Monte-Carlo draw (progressive-rendering style), so the
            # gradient noise drops ~1/sqrt(F)
            total = jnp.float32(0.0)
            for f in range(args.grad_frames):
                for v in range(len(views)):
                    img = render(p[0], p[1], frame * args.grad_frames + f, v)
                    err = img - target[f, v]
                    total = total + jnp.mean(err * err)
            return total / (args.grad_frames * len(views))
        loss, (gs, gc) = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update((gs * mask_s, gc * mask_c), opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    import os
    from tpt.postfx import post_process
    from tpt.utils import write_png
    os.makedirs("artifacts", exist_ok=True)

    params = (jnp.asarray(sm0), jnp.asarray(cm0))
    write_png("artifacts/inverse_before.png",
              np.asarray(post_process(render(*params, jnp.int32(0), 0))))
    write_png("artifacts/inverse_target.png",
              np.asarray(post_process(target_frame(jnp.int32(0))[0])))
    t0 = time.time()
    losses = []
    opt_state = opt.init(params)
    for i in range(args.steps):
        frame = jnp.int32(i)
        tgt = jnp.stack([target_frame(jnp.int32(i * args.grad_frames + f))
                         for f in range(args.grad_frames)])
        params, opt_state, loss = step(params, opt_state, frame, tgt)
        if i % 20 == 0 or i == args.steps - 1:
            losses.append(float(loss))
            if i % 200 == 0 or i == args.steps - 1:
                print(f"step {i:4d}  loss {float(loss):.6f}", flush=True)

    sm_err0 = float(np.abs(sm0[:N_OBS, 0:3]
                           - np.asarray(true_sm)[:N_OBS, 0:3]).mean())
    sm_err = float(np.abs(np.asarray(params[0])[:N_OBS, 0:3]
                          - np.asarray(true_sm)[:N_OBS, 0:3]).mean())
    cm_err0 = float(np.abs(cm0[1, 4:7] - np.asarray(true_cm)[1, 4:7]).mean())
    cm_err = float(np.abs(np.asarray(params[1])[1, 4:7]
                          - np.asarray(true_cm)[1, 4:7]).mean())
    wall = time.time() - t0
    result = {
        "metric": "inverse_demo_material_recovery",
        "steps": args.steps, "size": args.size, "wall_s": round(wall, 1),
        # per-frame losses jump with firefly draws under rr=False;
        # median over the tail is the stable convergence figure
        "loss_first": losses[0], "loss_last": losses[-1],
        "loss_final_median": float(np.median(losses[-10:])),
        "loss_reduction_x": round(losses[0] /
                                  max(float(np.median(losses[-10:])), 1e-12)),
        "sphere_param_mae_before": round(sm_err0, 4),
        "sphere_param_mae_after": round(sm_err, 4),
        "cuboid_param_mae_before": round(cm_err0, 4),
        "cuboid_param_mae_after": round(cm_err, 4),
    }
    write_png("artifacts/inverse_after.png",
              np.asarray(post_process(render(*params, jnp.int32(0), 0))))
    print(json.dumps(result))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
