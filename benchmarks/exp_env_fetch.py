"""Experiment: decompose the out-of-kernel env-fetch/accumulate fusion cost
at 1080p (the 32%-of-device-time bubble in artifacts/roofline_1080p.json)
and race alternative formulations on the real chip.

Timing method: the axon tunnel adds ~35-45 ms of host roundtrip per fetch
AND jax.block_until_ready does not wait for device completion — so each
candidate op runs K times inside ONE jitted lax.scan whose carry perturbs
the input (defeating loop-invariant code motion), synced once by fetching a
scalar; per-iteration cost = (t_K - t_0) / K with a null-scan baseline.
"""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

K = 64


def scan_time(op, perturb, *args, k=K, n=5):
    """Median wall ms of `op(*args)` amortized over k in-jit iterations.

    op(*args) -> array; perturb(args, i, prev_scalar) -> new args, so each
    iteration's input depends on the previous output (no hoisting)."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("steps",))
    def run(args, steps):
        def body(carry, i):
            a = perturb(args, i, carry)
            out = op(*a)
            return jnp.sum(out[0] if isinstance(out, tuple) else out,
                           dtype=jnp.float32) * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0),
                            jnp.arange(steps, dtype=jnp.int32))
        return c

    def measure(steps):
        out = float(run(args, steps))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = float(run(args, steps))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_full = measure(k)
    t_null = measure(1)
    return (t_full - t_null) / (k - 1) * 1e3


def main() -> int:
    import jax
    import jax.numpy as jnp
    from tpt.utils import enable_persistent_cache
    enable_persistent_cache()
    from tpt.config import AtmosphereConfig
    from tpt.env import (pack_block_table, sample_environment_blocked,
                         sample_environment_planar)
    from tpt.sky import compute_atmosphere

    H, W = 1080, 1920
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (3, H, W), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
    missed = jax.random.uniform(jax.random.PRNGKey(1), (H, W)) < 0.55
    miss_dir = jnp.where(missed[None], d, 0.0)
    miss_thr = jnp.where(missed[None], 0.7, 0.0)
    rad = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (3, H, W)))
    img_hw3 = jnp.zeros((H, W, 3), jnp.float32)
    img_3hw = jnp.zeros((3, H, W), jnp.float32)

    def pdir(args, i, c):
        # rotate the dependence into the directions: same rows, new tensor
        return (args[0],) + tuple(
            a * (1.0 + c) if a.ndim == 3 else a for a in args[1:])

    for size in (32, 64, 128, 256):
        faces = compute_atmosphere(AtmosphereConfig(size=size, i_steps=4,
                                                    j_steps=2))
        table = pack_block_table(faces)
        t = scan_time(sample_environment_blocked, pdir, table, miss_dir)
        print(f"A. blocked gather+lerp S={size:4d} "
              f"(table {table.nbytes/2**20:6.2f} MiB): {t:7.2f} ms", flush=True)

    faces = compute_atmosphere(AtmosphereConfig(size=256, i_steps=4, j_steps=2))
    table = pack_block_table(faces)

    t = scan_time(sample_environment_planar, pdir, faces, miss_dir)
    print(f"3. planar 4-tap sampler  S= 256: {t:7.2f} ms", flush=True)

    t = scan_time(sample_environment_blocked, pdir,
                  table.astype(jnp.bfloat16), miss_dir)
    print(f"5. bf16 blocked gather   S= 256: {t:7.2f} ms", flush=True)

    def fusion_hw3(tb, md, mt, r, img):
        env = sample_environment_blocked(tb, md)
        mean = jnp.moveaxis(r + mt * env, 0, -1)
        return img + (mean - img) * 0.125

    t = scan_time(fusion_hw3, pdir, table, miss_dir, miss_thr, rad, img_hw3)
    print(f"1. full fusion, [H,W,3] accum : {t:7.2f} ms", flush=True)

    def fusion_3hw(tb, md, mt, r, img):
        env = sample_environment_blocked(tb, md)
        mean = r + mt * env
        return img + (mean - img) * 0.125

    t = scan_time(fusion_3hw, pdir, table, miss_dir, miss_thr, rad, img_3hw)
    print(f"2. full fusion, [3,H,W] accum : {t:7.2f} ms", flush=True)

    t = scan_time(lambda r: jnp.moveaxis(r, 0, -1) + 0.0,
                  lambda a, i, c: (a[0] * (1.0 + c),), rad)
    print(f"D. moveaxis [3,H,W]->[H,W,3]  : {t:7.2f} ms", flush=True)

    def gather_only(tb, md):
        from tpt.env import cubemap_face_uv_planar, env_size_from_table
        size = env_size_from_table(tb)
        pad = size + 2
        face, s, tt = cubemap_face_uv_planar(md[0], md[1], md[2])
        x0 = jnp.clip(jnp.floor(s * size - 0.5).astype(jnp.int32), -1,
                      size - 1) + 1
        y0 = jnp.clip(jnp.floor(tt * size - 0.5).astype(jnp.int32), -1,
                      size - 1) + 1
        rows = (face * pad + y0) * pad + x0
        return tb[rows.reshape(-1)]

    t = scan_time(gather_only, pdir, table, miss_dir)
    print(f"A'. row gather only S=256     : {t:7.2f} ms", flush=True)

    # elementwise control: one [3,H,W] multiply (VPU+HBM floor)
    t = scan_time(lambda r: r * 1.0001,
                  lambda a, i, c: (a[0] * (1.0 + c),), rad)
    print(f"0. elementwise control [3,H,W]: {t:7.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
