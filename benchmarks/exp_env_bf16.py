"""Environment-fetch economics at 1080p: bf16 table + overlap additivity.

Two questions from the r4 verdict:

1. Can the 12.8 ms/frame env gather be HIDDEN behind the trace kernel?
   Measured here by additivity: time (kernel-only block), (env-apply-only
   block), and (full block).  The TPU TensorCore runs one program op at a
   time — if full ~ kernel + env, there is no overlap to be had at the
   XLA level (the r4 assertion, now measured).

2. How much does the bf16 block table save?  A bf16 row is 24 bytes = ONE
   32-byte gather quantum (vs two for f32) at the measured ~3.3 vs 6.2
   ns/row floor — expect the env term to halve.  Also reports the image
   error vs the f32 table (opt-in precision trade).

Run on the real chip: python benchmarks/exp_env_bf16.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    import jax
    import jax.numpy as jnp
    assert jax.default_backend() == "tpu", jax.default_backend()
    from tpt.utils import enable_persistent_cache
    enable_persistent_cache()
    from tpt import CameraConfig, demo_scene, init_accumulator
    from tpt.camera import camera_matrices
    from tpt.config import AtmosphereConfig
    from tpt.env import pack_block_table, sample_environment_blocked
    from tpt.kernels.render import progressive_frames
    from tpt.kernels.trace import pallas_trace_progressive
    from tpt.sky import compute_atmosphere

    W, H, F = 1920, 1080, 30
    cam = CameraConfig()
    scene = demo_scene().build()
    inv_p, inv_v, _ = camera_matrices(cam, W, H)
    faces = compute_atmosphere(AtmosphereConfig())
    focal = jnp.float32(cam.focal_length)
    ap = jnp.float32(cam.aperture_diameter)

    def timed(fn, n=6):
        fn(0)  # compile + warm
        fn(1)
        ts = []
        for i in range(n):
            t0 = time.time()
            fn(i + 2)
            ts.append(time.time() - t0)
        return float(np.median(ts))

    out = {}

    # --- kernel-only block ---
    def kernel_only(i):
        res = pallas_trace_progressive(
            scene, inv_p, inv_v, jnp.int32(i * F), focal, ap, width=W,
            height=H, ray_depth=13, spp=1, n_frames=F, counts=(48, 7))
        int(jnp.sum(res.ray_count))  # sync via scalar fetch (axon tunnel)

    out["kernel_only_ms_per_frame"] = round(timed(kernel_only) / F * 1e3, 2)

    # --- env-apply-only block (fixed miss buffers, fresh each call via a
    # tiny perturbation so XLA cannot hoist the gathers) ---
    res0 = pallas_trace_progressive(
        scene, inv_p, inv_v, jnp.int32(0), focal, ap, width=W, height=H,
        ray_depth=13, spp=1, n_frames=F, counts=(48, 7))
    jax.block_until_ready(res0.miss_dir)

    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        table = pack_block_table(faces, dtype=dtype)

        @jax.jit
        def env_only(miss_dir, miss_thr, eps, table=table):
            total = jnp.zeros_like(miss_dir[0])
            for k in range(F):
                envc = sample_environment_blocked(table,
                                                  miss_dir[k] + eps)
                total = total + miss_thr[k] * envc
            return jnp.sum(total)

        def env_call(i):
            int(env_only(res0.miss_dir, res0.miss_thr,
                         jnp.float32(i) * 1e-30) * 0 + 1)

        out[f"env_only_{name}_ms_per_frame"] = round(
            timed(env_call) / F * 1e3, 2)

        def full(i, table=table):
            acc = init_accumulator(H, W)
            acc, rays = progressive_frames(
                acc, scene, table, inv_p, inv_v, jnp.int32(i * F), focal,
                ap, width=W, height=H, ray_depth=13, spp=1, counts=(48, 7),
                n_frames=F, refill=True)
            int(rays)

        out[f"full_{name}_ms_per_frame"] = round(timed(full) / F * 1e3, 2)
        out[f"full_{name}_mrays"] = round(
            5.53e6 * F / (out[f"full_{name}_ms_per_frame"] * F / 1e3) / 1e6, 1)

    # additivity: overlap would show full << kernel + env
    out["additivity_f32"] = round(
        out["full_f32_ms_per_frame"]
        / (out["kernel_only_ms_per_frame"] + out["env_only_f32_ms_per_frame"]),
        3)

    # bf16 image error vs f32 on one accumulated block
    accs = {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        acc = init_accumulator(H, W)
        acc, _ = progressive_frames(
            acc, scene, pack_block_table(faces, dtype=dtype), inv_p, inv_v,
            jnp.int32(0), focal, ap, width=W, height=H, ray_depth=13,
            spp=1, counts=(48, 7), n_frames=F, refill=True)
        accs[name] = np.asarray(acc.image)
    err = np.abs(accs["bf16"] - accs["f32"])
    rel = err / np.maximum(np.abs(accs["f32"]), 1e-3)
    out["bf16_max_abs_err"] = float(err.max())
    out["bf16_mean_rel_err"] = float(rel.mean())

    print(json.dumps(out, indent=1))
    with open("artifacts/env_bf16.json", "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
