"""Pallas backward kernel: in-kernel reverse-mode of the path trace.

``trace_diff`` is the differentiable production trace: the forward is the
Pallas trace kernel (tpt.kernels.trace), the backward is a second Pallas
kernel (``pallas_trace_grad``) that re-runs the tile's transport with the
*one-hot differentiable formulation* (tpt.integrator.make_onehot_trace_fn)
under jax.vjp — traced inside the kernel, so Mosaic compiles the transpose
like any other op stream:

  * the closest-hit fold is recomputed detached (discrete winner choice —
    the standard detached-decision estimator of differentiable path
    tracing; SURVEY.md §7.5);
  * winner attributes flow through an MXU one-hot matmul whose hand-phrased
    transpose is also an MXU contraction (tpt.integrator._onehot_rows), so
    parameter cotangents accumulate at matmul speed instead of per-primitive
    masked lane reductions;
  * per-bounce rematerialization (jax.checkpoint in trace_paths) bounds
    VMEM: only inter-bounce carries live across the reverse sweep;
  * parameter cotangents accumulate across grid steps into a
    constant-index output block (d_table f32[128, 24]) and SMEM scalars
    (d_cam, 20 camera/lens entries); the Pallas TPU grid is sequential, so
    read-modify-write accumulation is race-free;
  * RNG is recomputed bit-identically from (px, py, frame) — no stored
    randomness.

The environment term stays OUTSIDE: callers differentiate through
apply_environment_blocked in XLA (gather transpose = scatter-add), which
yields the cubemap cotangent; this kernel receives the resulting
(d radiance, d miss_dir, d miss_thr) cotangents per pixel.

Gradient coverage matches the oracle VJP: material tables, sphere
positions/radii, cuboid bounds, inverse projection/view entries, focal
length, aperture diameter.  Verified against reverse-mode AD through the
XLA oracle in tests/test_trace_grad.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..integrator import (ATTR_COLS, ATTR_ROWS, CameraParams, TraceResult,
                          build_attr_table, make_onehot_trace_fn, trace_paths)
from .trace import (DEFAULT_UNROLL, LANES, _scene_smem_arrays, _use_interpret,
                    make_smem_scan_fold)

# Backward tiles default to 8 rows (vs 16 forward): the per-bounce
# linearization roughly doubles live VMEM.
DEFAULT_GRAD_TILE_ROWS = 8

N_CAM = 20  # ip00,ip01,ip02,ip10,ip11,ip12, right, up, backward, eye, focal, aperture


def _grad_kernel(frame_ref, cam_ref, sphere_geom_ref, cuboid_geom_ref,
                 table_ref, px_ref, py_ref, grad_ref, gmissd_ref, gmisst_ref,
                 dtable_ref, dcam_ref,
                 *, width: int, height: int, ray_depth: int, spp: int,
                 counts: Tuple[int, int], unroll: int):
    num_spheres, num_cuboids = counts
    frame = frame_ref[0]

    # The fold is detached (forward-only) in the gradient formulation, so a
    # rolled loop costs little runtime and keeps the already-large backward
    # graph's Mosaic compile time in check.
    del unroll

    def loop(n, body, init):
        return jax.lax.fori_loop(0, n, body, init)

    fold = make_smem_scan_fold(sphere_geom_ref, cuboid_geom_ref,
                               num_spheres, num_cuboids, loop)
    px = px_ref[:]
    py = py_ref[:]

    cam_vals = tuple(cam_ref[k] for k in range(N_CAM))

    # Hand-rolled per-bounce rematerialization: jax.checkpoint lowers to
    # closed_call, which Mosaic cannot compile, so the same semantics are
    # expressed as a custom_vjp whose residuals are ONLY the bounce inputs
    # (inter-bounce carry + parameter table); the backward re-traces the
    # bounce inline and transposes it.
    def bounce_on(table, state):
        from ..integrator import bounce_step
        return bounce_step(state, make_onehot_trace_fn(fold, table,
                                                       num_spheres))

    bounce_remat = jax.custom_vjp(bounce_on)

    def _bounce_fwd(table, state):
        return bounce_on(table, state), (table, state)

    def _bounce_bwd(res, ct):
        table, state = res
        _, vjp = jax.vjp(bounce_on, table, state)
        return vjp(ct)

    bounce_remat.defvjp(_bounce_fwd, _bounce_bwd)

    def tile_forward(table, cam_vals):
        (ip00, ip01, ip02, ip10, ip11, ip12,
         rx, ry, rz, ux, uy, uz, bx, by, bz, ex, ey, ez,
         focal, aperture) = cam_vals
        cam = CameraParams(ip00=ip00, ip01=ip01, ip02=ip02,
                           ip10=ip10, ip11=ip11, ip12=ip12,
                           right=(rx, ry, rz), up=(ux, uy, uz),
                           backward=(bx, by, bz), eye=(ex, ey, ez),
                           focal_length=focal, aperture_diameter=aperture)
        trace_fn = make_onehot_trace_fn(fold, table, num_spheres)
        res = trace_paths(trace_fn, cam, px, py, width, height, frame,
                          ray_depth, spp,
                          step_fn=lambda s: bounce_remat(table, s))
        return res.radiance, res.miss_dir, res.miss_thr

    _, vjp = jax.vjp(tile_forward, table_ref[:], cam_vals)
    d_table, d_cam = vjp((grad_ref[:], gmissd_ref[:], gmisst_ref[:]))

    @pl.when(pl.program_id(0) == 0)
    def _():
        dtable_ref[:] = jnp.zeros_like(dtable_ref)
        for k in range(N_CAM):
            dcam_ref[k] = jnp.float32(0.0)

    dtable_ref[:] += d_table
    for k in range(N_CAM):
        dcam_ref[k] += d_cam[k]


@functools.partial(jax.jit, static_argnames=("width", "height", "ray_depth",
                                             "spp", "tile_rows", "interpret",
                                             "counts", "unroll", "n_rows"))
def pallas_trace_grad(scene, inv_proj, inv_view, frame, focal_length,
                      aperture_diameter, g_rad, g_missd, g_misst,
                      *, width: int, height: int, ray_depth: int, spp: int,
                      counts: Tuple[int, int],
                      tile_rows: int = DEFAULT_GRAD_TILE_ROWS,
                      interpret: bool | None = None,
                      unroll: int = DEFAULT_UNROLL,
                      n_rows: int | None = None, row0=0):
    """Cotangents of pallas_trace's differentiable outputs.

    ``g_rad``: f32[3, n_rows, width]; ``g_missd``/``g_misst``:
    f32[spp, 3, n_rows, width].  Returns (d_scene, d_inv_proj, d_inv_view,
    d_focal, d_aperture) where d_scene matches the Scene pytree's float
    leaves (int leaves are float0 zeros).
    """
    if counts is None:
        raise ValueError("the backward kernel requires static counts")
    if interpret is None:
        interpret = _use_interpret()
    if n_rows is None:
        n_rows = height
    tile = tile_rows * LANES
    npix = width * n_rows
    npad = -(-npix // tile) * tile
    rows = npad // LANES
    grid = (rows // tile_rows,)

    flat = jnp.arange(npad, dtype=jnp.int32)
    px = (flat % width).reshape(rows, LANES)
    py = (jnp.minimum(flat // width + jnp.asarray(row0, jnp.int32), height - 1)
          .reshape(rows, LANES))

    def flatten_ct(a, lead):
        # inverse of trace.unflatten; padded duplicate pixels are discarded
        # by the forward's slice, so their cotangent is zero
        a = jnp.asarray(a, jnp.float32).reshape(lead + (npix,))
        a = jnp.pad(a, [(0, 0)] * len(lead) + [(0, npad - npix)])
        return a.reshape(lead + (rows, LANES))

    g_rad = flatten_ct(g_rad, (3,))
    g_missd = flatten_ct(g_missd, (spp, 3))
    g_misst = flatten_ct(g_misst, (spp, 3))

    cam = jnp.concatenate([
        jnp.asarray(inv_proj, jnp.float32).ravel(),
        jnp.asarray(inv_view, jnp.float32).ravel(),
        jnp.asarray(focal_length, jnp.float32).reshape(1),
        jnp.asarray(aperture_diameter, jnp.float32).reshape(1),
    ])
    # kernel cam layout: 6 inv-proj entries, 4 inv-view columns, focal, ap
    ip = jnp.asarray(inv_proj, jnp.float32)
    iv = jnp.asarray(inv_view, jnp.float32)
    cam20 = jnp.stack([ip[0, 0], ip[0, 1], ip[0, 2],
                       ip[1, 0], ip[1, 1], ip[1, 2],
                       iv[0, 0], iv[1, 0], iv[2, 0],
                       iv[0, 1], iv[1, 1], iv[2, 1],
                       iv[0, 2], iv[1, 2], iv[2, 2],
                       iv[0, 3], iv[1, 3], iv[2, 3],
                       jnp.asarray(focal_length, jnp.float32),
                       jnp.asarray(aperture_diameter, jnp.float32)])
    del cam

    table, table_vjp = jax.vjp(
        lambda s: build_attr_table(s, counts), scene)

    sphere_geom, _sphere_mat, cuboid_geom, _cuboid_mat = _scene_smem_arrays(scene)
    frame_arr = jnp.asarray(frame, jnp.int32).reshape(1)

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    tile_spec = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    vec3_spec = pl.BlockSpec((3, tile_rows, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    miss_spec = pl.BlockSpec((spp, 3, tile_rows, LANES),
                             lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec((ATTR_ROWS, ATTR_COLS), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)

    kernel = functools.partial(_grad_kernel, width=width, height=height,
                               ray_depth=ray_depth, spp=spp, counts=counts,
                               unroll=unroll)
    d_table, d_cam = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem(), smem(), smem(), smem(), table_spec,
                  tile_spec, tile_spec, vec3_spec, miss_spec, miss_spec],
        out_specs=(table_spec, smem()),
        out_shape=(
            jax.ShapeDtypeStruct((ATTR_ROWS, ATTR_COLS), jnp.float32),
            jax.ShapeDtypeStruct((N_CAM,), jnp.float32),
        ),
        interpret=interpret,
    )(frame_arr, cam20, sphere_geom, cuboid_geom, table, px, py,
      g_rad, g_missd, g_misst)

    (d_scene,) = table_vjp(d_table)
    d_ip = jnp.zeros((4, 4), jnp.float32)
    d_ip = d_ip.at[0, 0].set(d_cam[0]).at[0, 1].set(d_cam[1]).at[0, 2].set(d_cam[2])
    d_ip = d_ip.at[1, 0].set(d_cam[3]).at[1, 1].set(d_cam[4]).at[1, 2].set(d_cam[5])
    d_iv = jnp.zeros((4, 4), jnp.float32)
    for j in range(4):
        for i in range(3):
            d_iv = d_iv.at[i, j].set(d_cam[6 + 3 * j + i])
    return d_scene, d_ip, d_iv, d_cam[18], d_cam[19]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def trace_diff(scene, inv_proj, inv_view, frame, focal_length,
               aperture_diameter, row0, width: int, height: int,
               ray_depth: int, spp: int, counts: Tuple[int, int],
               n_rows: int | None = None) -> TraceResult:
    """Differentiable production trace: Pallas forward, Pallas backward.

    Returns pallas_trace's TraceResult; reverse-mode differentiable w.r.t.
    scene float leaves, inverse matrices, focal length and aperture.
    Compose with tpt.integrator.apply_environment_blocked for a fully
    differentiable frame (the env cotangent comes from XLA's gather
    transpose).  ``row0``/``n_rows`` select a pixel-row band (the sharded
    training path); row0 is a traced int with zero cotangent."""
    from .trace import pallas_trace
    return pallas_trace(scene, inv_proj, inv_view, frame, focal_length,
                        aperture_diameter, width=width, height=height,
                        ray_depth=ray_depth, spp=spp, counts=counts,
                        n_rows=n_rows, row0=row0)


def _trace_diff_fwd(scene, inv_proj, inv_view, frame, focal_length,
                    aperture_diameter, row0, width, height, ray_depth, spp,
                    counts, n_rows=None):
    out = trace_diff(scene, inv_proj, inv_view, frame, focal_length,
                     aperture_diameter, row0, width, height, ray_depth, spp,
                     counts, n_rows)
    return out, (scene, inv_proj, inv_view, frame, focal_length,
                 aperture_diameter, row0)


def _trace_diff_bwd(width, height, ray_depth, spp, counts, n_rows,
                    residuals, ct):
    scene, inv_proj, inv_view, frame, focal, aperture, row0 = residuals
    d_scene, d_ip, d_iv, d_focal, d_ap = pallas_trace_grad(
        scene, inv_proj, inv_view, frame, focal, aperture,
        ct.radiance, ct.miss_dir, ct.miss_thr,
        width=width, height=height, ray_depth=ray_depth, spp=spp,
        counts=counts, n_rows=n_rows, row0=row0)
    d_frame = np.zeros(np.shape(frame), jax.dtypes.float0)
    d_row0 = np.zeros(np.shape(row0), jax.dtypes.float0)
    return d_scene, d_ip, d_iv, d_frame, d_focal, d_ap, d_row0


trace_diff.defvjp(_trace_diff_fwd, _trace_diff_bwd)
