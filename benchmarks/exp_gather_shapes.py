"""Experiment: what bounds XLA:TPU's random row gather — rows or elements?

The env fetch gathers one [12]-float row per pixel (2.07M rows/frame at
1080p) and costs ~13.5 ms = 6.5 ns/row = ~0.54 ns/element.  If the engine
is ELEMENT-rate-bound, shrinking elements-per-row wins directly; c64
bitcasting (2 adjacent f32 = 1 element, bit-exact) would halve the cost.
"""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

K = 64
N_TABLE = 6 * 258 * 258   # 256^2 padded cubemap rows
N_PIX = 1080 * 1920


def scan_time(op, args, k=K, n=5):
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("steps",))
    def run(args, steps):
        def body(carry, i):
            rows = (args[1] + i) % N_TABLE   # iteration-dependent indices
            out = op(args[0], rows)
            return jnp.sum(jnp.real(out).astype(jnp.float32)) * 1e-30, None
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

    return (measure(k) - measure(1)) / (k - 1) * 1e3


def main() -> int:
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    rows = jax.random.randint(key, (N_PIX,), 0, N_TABLE, jnp.int32)
    rows_sorted = jnp.sort(rows)

    take = lambda tb, r: tb[r]

    for w in (1, 3, 4, 6, 12, 24):
        tb = jax.random.normal(key, (N_TABLE, w), jnp.float32)
        t = scan_time(take, (tb, rows))
        print(f"f32 [N,{w:3d}] row gather: {t:7.2f} ms "
              f"({t*1e6/N_PIX:5.2f} ns/row, {t*1e6/N_PIX/w:5.2f} ns/elem)",
              flush=True)

    tb = jax.random.normal(key, (N_TABLE, 12), jnp.float32)
    t = scan_time(take, (tb.view(jnp.complex64), rows))
    print(f"c64 [N,  6] row gather: {t:7.2f} ms (bit-exact f32 pairs)",
          flush=True)

    t = scan_time(take, (tb, rows_sorted))
    print(f"f32 [N, 12] sorted idx : {t:7.2f} ms", flush=True)

    # flat 1-element gather (12x separate takes of a flat table)
    flat = tb.reshape(-1)

    def take12(fl, r):
        base = r * 12
        return jnp.stack([jnp.take(fl, base + c) for c in range(12)], -1)

    t = scan_time(take12, (flat, rows))
    print(f"f32 12x flat elem take : {t:7.2f} ms", flush=True)

    # transposed: gather along minor axis with shared indices
    tbT = tb.T  # [12, N]
    t = scan_time(lambda a, r: jnp.take(a, r, axis=1), (tbT, rows))
    print(f"f32 [12,N] minor gather: {t:7.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
