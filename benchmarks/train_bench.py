"""Inverse-rendering step benchmark at 1080p (BASELINE config 5 scale).

Times one full gradient step (forward + backward + SGD update on the
material tables) of a pixel-MSE loss on the demo scene:

  kernel : Pallas forward + Pallas backward (tpt.kernels.trace_grad)
  oracle : XLA integrator forward + remat reverse-mode
           (tpt.parallel.make_train_step backend='oracle')

Usage: python benchmarks/train_bench.py [kernel|oracle] [--size WxH]
       [--out artifacts/train_bench.json]
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "kernel"
    size = "1920x1080"
    out = None
    env_bf16 = "--env-bf16" in sys.argv
    for a in sys.argv[2:]:
        if a.startswith("--size"):
            size = a.split("=")[1]
        if a.startswith("--out"):
            out = a.split("=")[1]
    width, height = map(int, size.split("x"))

    import jax
    import jax.numpy as jnp
    from tpt.utils import enable_persistent_cache
    enable_persistent_cache()
    from tpt import CameraConfig, demo_scene
    from tpt.camera import camera_matrices
    from tpt.env import constant_environment, pack_block_table
    from tpt.integrator import apply_environment_blocked

    ray_depth, spp, counts = 13, 1, (48, 7)
    cam = CameraConfig()
    scene = demo_scene().build()
    inv_p, inv_v, _ = camera_matrices(cam, width, height)
    env = constant_environment((0.7, 0.8, 1.0))
    env_table = pack_block_table(
        env, dtype=jnp.bfloat16 if env_bf16 else jnp.float32)
    focal = jnp.float32(cam.focal_length)
    aperture = jnp.float32(cam.aperture_diameter)
    target = jnp.zeros((height, width, 3), jnp.float32) + 0.25

    if which == "kernel":
        from tpt.kernels.trace_grad import trace_diff
        import dataclasses

        def loss_fn(params, frame):
            sm, cm = params
            s = dataclasses.replace(scene, sphere_material=sm,
                                    cuboid_material=cm)
            res = trace_diff(s, inv_p, inv_v, frame, focal, aperture,
                             jnp.int32(0), width, height, ray_depth, spp,
                             counts)
            img = jnp.moveaxis(
                apply_environment_blocked(res, env_table, spp), 0, -1)
            err = img - target
            return jnp.mean(err * err)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(params, frame):
            loss, grads = jax.value_and_grad(loss_fn)(params, frame)
            return jax.tree.map(lambda p, g: p - 0.01 * g, params, grads), loss

        # --scan: fuse K optimizer steps into ONE device program with
        # lax.fori_loop (a production training loop runs fused step
        # blocks anyway) — removes the per-step dispatch RPC that the
        # chained-dispatch mode still pays through the tunnel.
        scan_k = 0
        for a in sys.argv[2:]:
            if a.startswith("--scan"):
                scan_k = int(a.split("=")[1]) if "=" in a else 20

        params = (scene.sphere_material, scene.cuboid_material)
        if scan_k:
            import jax.lax as lax

            @functools.partial(jax.jit, donate_argnums=(0,),
                               static_argnums=(2,))
            def step_block(params, frame0, k):
                def body(i, carry):
                    p, _ = carry
                    loss, grads = jax.value_and_grad(loss_fn)(p, frame0 + i)
                    p = jax.tree.map(lambda a, g: a - 0.01 * g, p, grads)
                    return p, loss
                return lax.fori_loop(0, k, body, (params, jnp.float32(0)))

            t0 = time.time()
            params, loss = step_block(params, jnp.int32(0), scan_k)
            print(f"compile+first block: {time.time()-t0:.1f}s "
                  f"loss={float(loss):.5f}", flush=True)
            ts = []
            frame = scan_k
            for _ in range(3):
                t0 = time.time()
                params, loss = step_block(params, jnp.int32(frame), scan_k)
                frame += scan_k
                _ = float(loss)
                ts.append((time.time() - t0) / scan_k)
            med_ms = float(np.median(ts)) * 1e3
            print(f"kernel bwd step (fori_loop x{scan_k}): {med_ms:.1f} ms "
                  f"median (loss {float(loss):.5f})", flush=True)
            if out:
                os.makedirs(os.path.dirname(out), exist_ok=True)
                with open(out, "w") as f:
                    json.dump({
                        "metric": "train_step_1080p_kernel_scan",
                        "env_bf16": env_bf16, "scan_k": scan_k,
                        "size": size, "ray_depth": ray_depth, "spp": spp,
                        "median_step_ms": round(med_ms, 1),
                        "loss_last": float(loss),
                        "config": "fori_loop-fused step block: Pallas fwd + "
                                  "in-kernel reverse-sweep bwd + SGD, "
                                  "demo scene",
                    }, f, indent=1)
            return 0

        t0 = time.time()
        params, loss = step(params, jnp.int32(0))
        print(f"compile+first step: {time.time()-t0:.1f}s loss={float(loss):.5f}",
              flush=True)
        # Measurement discipline (see PERF.md preamble): each host fetch
        # costs ~30-40 ms of tunnel roundtrip, so steps are timed in
        # chained blocks of K with ONE loss fetch per block — successive
        # steps serialize on the params dependency, so block/K is the
        # true steady-state step time (bench.py amortizes the same way).
        K = 20
        ts = []
        frame = 1
        for _ in range(3):
            t0 = time.time()
            for _k in range(K):
                params, loss = step(params, jnp.int32(frame))
                frame += 1
            _ = float(loss)  # sync
            ts.append((time.time() - t0) / K)
        med_ms = float(np.median(ts)) * 1e3
        print(f"kernel bwd step: {med_ms:.1f} ms median "
              f"(loss {float(loss):.5f})", flush=True)
        if out:
            os.makedirs(os.path.dirname(out), exist_ok=True)
            with open(out, "w") as f:
                json.dump({
                    "metric": "train_step_1080p_kernel",
                    "env_bf16": env_bf16,
                    "size": size, "ray_depth": ray_depth, "spp": spp,
                    "median_step_ms": round(med_ms, 1),
                    "loss_last": float(loss),
                    "config": "Pallas fwd + in-kernel reverse-sweep bwd + "
                              "SGD on material tables, demo scene",
                }, f, indent=1)
    else:
        from tpt.parallel import make_dist_renderer, make_mesh, make_train_step
        from tpt.config import RenderConfig
        cfg = RenderConfig(width=width, height=height, ray_depth=ray_depth,
                           spp=spp)
        mesh = make_mesh(dp=1, sp=1)
        step = make_train_step(mesh, cfg, counts=counts, backend="oracle")
        t0 = time.time()
        new_scene, loss = step(scene, env, inv_p, inv_v, cam.focal_length,
                               cam.aperture_diameter, 0, target, 0.01)
        print(f"compile+first step: {time.time()-t0:.1f}s loss={float(loss):.5f}",
              flush=True)
        ts = []
        for i in range(3):
            t0 = time.time()
            new_scene, loss = step(scene, env, inv_p, inv_v, cam.focal_length,
                                   cam.aperture_diameter, i + 1, target, 0.01)
            _ = float(loss)
            ts.append(time.time() - t0)
        print(f"oracle bwd step: {np.median(ts)*1e3:.1f} ms median "
              f"(loss {float(loss):.5f})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
