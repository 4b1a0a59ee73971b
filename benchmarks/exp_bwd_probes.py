"""Mosaic capability probes for the backward-kernel design.

P1: 2D dot_general [2048,128]@[128,32] in-kernel (MXU gather core)
P2: reshape (16,128)<->(2048,1)/(1,2048) in-kernel
P3: batched 3D dot_general [16,128,128]x[128,32]
P4: jax.vjp of a bounce-like function traced inside a kernel
P5: masked-reduce transpose loop cost (55 prims x 24 attrs)
"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TR, L, R, K = 16, 128, 128, 32
key = jax.random.PRNGKey(0)


def run(name, build):
    try:
        f = build()
        r = f()
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(3):
            r = f()
        float(jax.tree.leaves(r)[0].ravel()[0])
        print(f"{name:12s}: OK   {(time.time()-t0)/3*1e3:8.2f} ms/3calls", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"{name:12s}: FAIL {type(e).__name__}: {msg}", flush=True)


GRID = 100  # emulate ~100 tiles of work per call

idx = jax.random.randint(key, (GRID * TR, L), 0, 55, jnp.int32)
table = jax.random.normal(key, (R, K), jnp.float32)
gvals = jax.random.normal(key, (GRID * TR, L), jnp.float32)

tile_spec = pl.BlockSpec((TR, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
tab_spec = pl.BlockSpec((R, K), lambda i: (0, 0), memory_space=pltpu.VMEM)
out_spec = pl.BlockSpec((R, K), lambda i: (0, 0), memory_space=pltpu.VMEM)


def p1():
    def kern(i_ref, t_ref, o_ref):
        oh = (i_ref[:].reshape(TR * L, 1) ==
              jax.lax.broadcasted_iota(jnp.int32, (TR * L, R), 1)).astype(jnp.float32)
        w = jnp.dot(oh, t_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = w[:, 0].reshape(TR, L)
    return jax.jit(lambda: pl.pallas_call(
        kern, grid=(GRID,), in_specs=[tile_spec, tab_spec], out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((GRID * TR, L), jnp.float32))(idx, table))


def p1t():
    # transpose direction: d_table = onehot^T @ g  accumulated over grid
    def kern(i_ref, g_ref, o_ref):
        oh = (i_ref[:].reshape(TR * L, 1) ==
              jax.lax.broadcasted_iota(jnp.int32, (TR * L, R), 1)).astype(jnp.float32)
        g = jnp.broadcast_to(g_ref[:].reshape(TR * L, 1), (TR * L, K))
        d = jnp.dot(oh.T, g, preferred_element_type=jnp.float32)
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += d
    return jax.jit(lambda: pl.pallas_call(
        kern, grid=(GRID,), in_specs=[tile_spec, tile_spec], out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((R, K), jnp.float32))(idx, gvals))


def p2():
    def kern(x_ref, o_ref):
        a = x_ref[:].reshape(1, TR * L)
        o_ref[:] = (a * 2.0).reshape(TR, L)
    return jax.jit(lambda: pl.pallas_call(
        kern, grid=(GRID,), in_specs=[tile_spec], out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((GRID * TR, L), jnp.float32))(gvals))


def p3():
    def kern(i_ref, t_ref, o_ref):
        oh = (i_ref[:][..., None] ==
              jax.lax.broadcasted_iota(jnp.int32, (TR, L, R), 2)).astype(jnp.float32)
        w = jax.lax.dot_general(oh, t_ref[:], (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[:] = w[..., 0]
    return jax.jit(lambda: pl.pallas_call(
        kern, grid=(GRID,), in_specs=[tile_spec, tab_spec], out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((GRID * TR, L), jnp.float32))(idx, table))


def p4():
    # vjp of a bounce-like function (normalize, fresnel-ish, selects) in-kernel
    def kern(x_ref, g_ref, o_ref):
        def f(x):
            y = x * jax.lax.rsqrt(x * x + 1.0)
            z = jnp.where(x > 0, y * y, jnp.exp(-y))
            return jnp.tanh(z) + y / (z + 2.0)
        out, vjp = jax.vjp(f, x_ref[:])
        (dx,) = vjp(g_ref[:])
        o_ref[:] = out + dx
    return jax.jit(lambda: pl.pallas_call(
        kern, grid=(GRID,), in_specs=[tile_spec, tile_spec], out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((GRID * TR, L), jnp.float32))(gvals, gvals))


def p5():
    # naive transpose: 55 prims x 24 attrs masked reduces -> SMEM scalars
    def kern(i_ref, g_ref, o_ref):
        g = g_ref[:]
        for r in range(55):
            m = jnp.where(i_ref[:] == r, g, 0.0)
            s = jnp.sum(m)
            for k in range(4):
                o_ref[r, k] = s * (k + 1.0)
    return jax.jit(lambda: pl.pallas_call(
        kern, grid=(GRID,), in_specs=[tile_spec, tile_spec],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((55, 4), jnp.float32))(idx, gvals))




def p6():
    # vjp of the 3D one-hot dot_general w.r.t. the table
    def kern(i_ref, g_ref, o_ref):
        oh = (i_ref[:][..., None] ==
              jax.lax.broadcasted_iota(jnp.int32, (TR, L, R), 2)).astype(jnp.float32)
        def f(tab):
            w = jax.lax.dot_general(oh, tab, (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return jnp.sum(w[..., 0] * g_ref[:]) + jnp.sum(w[..., 1])
        tab0 = jnp.zeros((R, K), jnp.float32) + 1.0
        _, vjp = jax.vjp(f, tab0)
        (dtab,) = vjp(jnp.float32(1.0))
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += dtab
    return jax.jit(lambda: pl.pallas_call(
        kern, grid=(GRID,), in_specs=[tile_spec, tile_spec], out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((R, K), jnp.float32))(idx, gvals))



def p7():
    # custom-phrased gather transpose: per-sublane [R,L]@[L,K] matmuls
    def kern(i_ref, g_ref, o_ref):
        idx = i_ref[:]
        acc = jnp.zeros((R, K), jnp.float32)
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
        for i in range(TR):
            oh_t = (jnp.broadcast_to(idx[i:i+1, :], (R, L)) == iota_r
                    ).astype(jnp.float32)
            g_row = jnp.broadcast_to(g_ref[i:i+1, :].reshape(L, 1), (L, K))
            acc = acc + jnp.dot(oh_t, g_row, preferred_element_type=jnp.float32)
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += acc
    return jax.jit(lambda: pl.pallas_call(
        kern, grid=(GRID,), in_specs=[tile_spec, tile_spec], out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((R, K), jnp.float32))(idx, gvals))


def p8():
    # same but contracting first dims via dot_general (no explicit transpose)
    def kern(i_ref, g_ref, o_ref):
        oh = (i_ref[:][..., None] ==
              jax.lax.broadcasted_iota(jnp.int32, (TR, L, R), 2)).astype(jnp.float32)
        g3 = jnp.broadcast_to(g_ref[:][..., None], (TR, L, K))
        acc = jnp.zeros((R, K), jnp.float32)
        for i in range(TR):
            acc = acc + jax.lax.dot_general(
                oh[i], g3[i], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += acc
    return jax.jit(lambda: pl.pallas_call(
        kern, grid=(GRID,), in_specs=[tile_spec, tile_spec], out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((R, K), jnp.float32))(idx, gvals))

if __name__ == "__main__":
    which = sys.argv[1:] or ["p1", "p1t", "p2", "p3", "p4", "p5", "p6", "p7", "p8"]
    for name in which:
        run(name, globals()[name])
