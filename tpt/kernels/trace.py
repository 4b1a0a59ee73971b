"""Pallas TPU path-tracing kernel.

The production counterpart of the GLSL compute kernel
(res/shaders/PathTracing/compute.glsl): the image is flattened and tiled into
(TILE_ROWS, 128) VPU-shaped pixel tiles; the grid walks tiles; each grid step
runs the *shared* integrator (tpt.integrator — the same code the XLA oracle
executes) over one tile:

  * scene geometry and materials live in SMEM: the closest-hit fold reads
    per-primitive scalars that broadcast over the whole tile (the UBO
    analogue — the scene is uniform across pixels, so scalar memory is the
    right home, exactly like the shader's uniform buffer);
  * per-lane state (ray origin/direction/throughput/seed/...) are
    (TILE_ROWS, 128) f32/u32 registers;
  * the winner-attribute gather is a second primitive loop of masked
    broadcast-selects (no per-lane dynamic addressing needed — TPU-friendly);
  * the environment fetch is deferred to plain XLA outside the kernel
    (see tpt.integrator docstring: exact, since a sample misses at most once).

Because the kernel and the oracle share every line of transport math, their
outputs agree draw-for-draw; tests assert allclose at tight tolerance.

On non-TPU backends the kernel runs in interpreter mode (tests/CI).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MAX_SPHERES, MAX_CUBOIDS
from ..integrator import (ATTR_COLS, ATTR_ROWS, CameraParams, TraceResult,
                          Winner, build_attr_table, trace_paths)
from ..ops.intersect import (FLOAT_MAX, ray_cuboid, ray_sphere,
                             smallest_positive)

LANES = 128
# (24, 128) pixel tiles won the r4 1080p sweep over {8, 16, 24, 32} rows
# (benchmarks/sweep_kernel.py --quick, tunnel-aware sync; Pallas requires
# sublane blocks divisible by 8, so 20/28 are not lowerable); unroll=1
# means "fully unroll the primitive loops when counts are static" (Mosaic
# supports only full/none).
DEFAULT_TILE_ROWS = 24
DEFAULT_UNROLL = 1


def make_smem_scan_fold(sphere_geom_ref, cuboid_geom_ref,
                        num_spheres, num_cuboids, loop):
    """Closest-hit scan fold over SMEM scene tables in the shader's order
    (compute.glsl:226-258), shared by the forward and backward kernels.

    Returns scan(origin, direction) -> (found bool, idx i32, t f32,
    inside bool) — the tpt.integrator.ScanFn contract.  The found-check is
    T != FLOAT_MAX, the shader's own convention (compute.glsl:257)."""

    def scan(origin, direction):
        batch = origin.shape[1:]
        zero_lane = origin[0] * 0.0

        def splat(c):
            return jnp.broadcast_to(c, batch)

        best_t = zero_lane + FLOAT_MAX
        best_idx = jnp.zeros_like(zero_lane, jnp.int32) - 1
        # loop-carried flags are i32: Mosaic has no i1-vector loop carries
        inside = jnp.zeros_like(zero_lane, jnp.int32)

        def consider(carry, t1, t2, ok, idx):
            b_t, b_idx, b_in = carry
            cond = ok & (t2 > 0.0) & (t1 < b_t)
            t = smallest_positive(t1, t2)
            return (jnp.where(cond, t, b_t),
                    jnp.where(cond, idx, b_idx),
                    jnp.where(cond, (t == t2).astype(jnp.int32), b_in))

        def sphere_scan(i, carry):
            center = jnp.stack([splat(sphere_geom_ref[i, 0]),
                                splat(sphere_geom_ref[i, 1]),
                                splat(sphere_geom_ref[i, 2])])
            t1, t2, ok = ray_sphere(origin, direction, center,
                                    sphere_geom_ref[i, 3])
            return consider(carry, t1, t2, ok, i)

        def cuboid_scan(i, carry):
            mn = jnp.stack([splat(cuboid_geom_ref[i, 0]),
                            splat(cuboid_geom_ref[i, 1]),
                            splat(cuboid_geom_ref[i, 2])])
            mx = jnp.stack([splat(cuboid_geom_ref[i, 4]),
                            splat(cuboid_geom_ref[i, 5]),
                            splat(cuboid_geom_ref[i, 6])])
            t1, t2, ok = ray_cuboid(origin, direction, mn, mx)
            return consider(carry, t1, t2, ok, MAX_SPHERES + i)

        carry = (best_t, best_idx, inside)
        carry = loop(num_spheres, sphere_scan, carry)
        carry = loop(num_cuboids, cuboid_scan, carry)
        best_t, best_idx, inside = carry
        return best_t != FLOAT_MAX, best_idx, best_t, inside != 0

    return scan


def _unpack_cam(cam_ref) -> CameraParams:
    """CameraParams from the packed SMEM camera vector (2 mat4 + 2 floats)."""
    iv = lambda r, c: cam_ref[16 + r * 4 + c]
    return CameraParams(
        ip00=cam_ref[0], ip01=cam_ref[1], ip02=cam_ref[2],
        ip10=cam_ref[4], ip11=cam_ref[5], ip12=cam_ref[6],
        right=(iv(0, 0), iv(1, 0), iv(2, 0)),
        up=(iv(0, 1), iv(1, 1), iv(2, 1)),
        backward=(iv(0, 2), iv(1, 2), iv(2, 2)),
        eye=(iv(0, 3), iv(1, 3), iv(2, 3)),
        focal_length=cam_ref[32],
        aperture_diameter=cam_ref[33],
    )


MAT_LANES = 14  # material lanes 0..13 (14, 15 are std140 padding)


def make_select_trace(sphere_geom_ref, sphere_mat_ref, cuboid_geom_ref,
                      cuboid_mat_ref, num_spheres, num_cuboids, loop):
    """The production kernel TraceFn: SMEM scan fold + winner-attribute
    gather as masked broadcast-selects (the r4 forward winner — the forward
    never needs a table cotangent, so the one-hot MXU machinery buys
    nothing here)."""
    fold = make_smem_scan_fold(sphere_geom_ref, cuboid_geom_ref,
                               num_spheres, num_cuboids, loop)

    def kernel_trace(origin, direction):
        batch = origin.shape[1:]
        zero_lane = origin[0] * 0.0

        def splat(c):
            return jnp.broadcast_to(c, batch)

        def sel_vec(cond, scalars, carried):
            vec = jnp.stack([splat(s) for s in scalars])
            return jnp.where(cond[None], vec, carried)

        # ---- pass 1: scan fold ----
        found, best_idx, best_t, inside_b = fold(origin, direction)
        inside = inside_b.astype(jnp.int32)

        # ---- pass 2: winner attributes ----
        mat = jnp.zeros((MAT_LANES,) + batch, jnp.float32)
        s_center = jnp.zeros((3,) + batch, jnp.float32)
        s_radius = zero_lane
        c_min = jnp.zeros((3,) + batch, jnp.float32)
        c_max = jnp.zeros((3,) + batch, jnp.float32)

        def sphere_gather(i, carry):
            mat, s_center, s_radius = carry
            m = best_idx == i
            mat = sel_vec(m, [sphere_mat_ref[i, k] for k in range(MAT_LANES)], mat)
            s_center = sel_vec(m, [sphere_geom_ref[i, k] for k in range(3)], s_center)
            s_radius = jnp.where(m, sphere_geom_ref[i, 3], s_radius)
            return mat, s_center, s_radius

        mat, s_center, s_radius = loop(
            num_spheres, sphere_gather, (mat, s_center, s_radius))

        def cuboid_gather(i, carry):
            mat, c_min, c_max = carry
            m = best_idx == MAX_SPHERES + i
            mat = sel_vec(m, [cuboid_mat_ref[i, k] for k in range(MAT_LANES)], mat)
            c_min = sel_vec(m, [cuboid_geom_ref[i, k] for k in range(3)], c_min)
            c_max = sel_vec(m, [cuboid_geom_ref[i, k] for k in range(4, 7)], c_max)
            return mat, c_min, c_max

        mat, c_min, c_max = loop(
            num_cuboids, cuboid_gather, (mat, c_min, c_max))

        winner = Winner(material=mat, sphere_center=s_center,
                       sphere_radius=s_radius, cuboid_min=c_min,
                       cuboid_max=c_max,
                       is_sphere=(best_idx >= 0) & (best_idx < MAX_SPHERES))
        return found, best_t, inside != 0, winner

    return kernel_trace


def _kernel(counts_ref, frame_ref, cam_ref,
            sphere_geom_ref, sphere_mat_ref, cuboid_geom_ref, cuboid_mat_ref,
            px_ref, py_ref,
            rad_ref, missd_ref, misst_ref, rays_ref, seed_ref,
            *, width: int, height: int, ray_depth: int, spp: int,
            counts: Tuple[int, int] | None, unroll: int,
            jitter: str = "corner", gather: str = "select",
            rr: bool = True, table_t_ref=None):
    # Static counts (the fast path) bake the primitive-loop trip counts into
    # the program so Mosaic can unroll them, hoisting the per-iteration SMEM
    # scalar reads and loop control off the critical path.  Dynamic counts
    # (counts=None) read the trip counts from SMEM — one compilation serves
    # any scene, at a throughput cost.
    if counts is not None:
        num_spheres, num_cuboids = counts
    else:
        num_spheres = counts_ref[0]
        num_cuboids = counts_ref[1]
    frame = frame_ref[0]

    def loop(n, body, init):
        # Pallas TPU lowers fori_loop either rolled or fully unrolled.
        full = counts is not None and unroll
        return jax.lax.fori_loop(0, n, body, init, unroll=True if full else None)

    cam = _unpack_cam(cam_ref)

    # Two-pass closest-hit trace: (1) a lean scan fold carrying only
    # (bestT, idx, inside) in the shader's order (compute.glsl:226-258);
    # (2) a winner-attribute pass of masked broadcast-selects from SMEM.
    # (A fused single-loop variant carrying the 20 winner attributes through
    # the scan was tried and is algebraically identical, but its large fori
    # carries explode Mosaic compile time; the two-pass form compiles in
    # seconds and runs at the same speed.)
    fold = make_smem_scan_fold(sphere_geom_ref, cuboid_geom_ref,
                               num_spheres, num_cuboids, loop)

    if gather == "onehot":
        # winner attributes via the attribute-major one-hot MXU matmul
        # (tpt.integrator._onehot_cols layout): one [K, R] x [R, B]
        # contraction replaces the 55-iteration masked-select loops.  The
        # matmul is exact — each output sums one f32 value and zeros at
        # HIGHEST precision — so results stay bit-identical to the select
        # gather (asserted by the kernel-vs-oracle suite either way).
        table_t = table_t_ref[:]

        def kernel_trace(origin, direction):
            found, best_idx, best_t, inside_b = fold(origin, direction)
            is_sphere = (best_idx >= 0) & (best_idx < MAX_SPHERES)
            row = jnp.where(best_idx < 0, -1,
                            jnp.where(is_sphere, best_idx,
                                      best_idx - MAX_SPHERES + num_spheres))
            oh = (row[..., None] == jax.lax.broadcasted_iota(
                jnp.int32, row.shape + (ATTR_ROWS,), row.ndim)
                ).astype(jnp.float32)
            attrs_t = jax.lax.dot_general(
                table_t, oh, (((1,), (oh.ndim - 1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            winner = Winner(material=attrs_t[10:24],
                            sphere_center=attrs_t[0:3],
                            sphere_radius=attrs_t[3],
                            cuboid_min=attrs_t[4:7],
                            cuboid_max=attrs_t[7:10],
                            is_sphere=is_sphere)
            return found, best_t, inside_b, winner

        res = trace_paths(kernel_trace, cam, px_ref[:], py_ref[:],
                          width, height, frame, ray_depth, spp, jitter=jitter,
                          russian_roulette=rr)
        rad_ref[:] = res.radiance
        missd_ref[:] = res.miss_dir
        misst_ref[:] = res.miss_thr
        rays_ref[:] = res.ray_count
        seed_ref[:] = res.seed
        return

    kernel_trace = make_select_trace(sphere_geom_ref, sphere_mat_ref,
                                     cuboid_geom_ref, cuboid_mat_ref,
                                     num_spheres, num_cuboids, loop)

    res = trace_paths(kernel_trace, cam, px_ref[:], py_ref[:],
                      width, height, frame, ray_depth, spp, jitter=jitter,
                      russian_roulette=rr)

    rad_ref[:] = res.radiance
    missd_ref[:] = res.miss_dir
    misst_ref[:] = res.miss_thr
    rays_ref[:] = res.ray_count
    seed_ref[:] = res.seed


def _scene_smem_arrays(scene):
    """Pack the scene for SMEM: sphere f32[256,4]; cuboid f32[64,8] as
    (min.xyz, pad, max.xyz, pad) — the std140 vec3 stride, incidentally."""
    pad = jnp.zeros((MAX_CUBOIDS, 1), jnp.float32)
    cuboid_geom = jnp.concatenate(
        [scene.cuboid_min, pad, scene.cuboid_max, pad], axis=1)
    return scene.sphere_pos_radius, scene.sphere_material, cuboid_geom, scene.cuboid_material


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("width", "height", "ray_depth",
                                             "spp", "tile_rows", "interpret",
                                             "counts", "unroll", "n_rows",
                                             "jitter", "gather", "rr"))
def pallas_trace(scene, inv_proj, inv_view, frame, focal_length, aperture_diameter,
                 *, width: int, height: int, ray_depth: int, spp: int,
                 tile_rows: int = DEFAULT_TILE_ROWS,
                 interpret: bool | None = None,
                 counts: Tuple[int, int] | None = None,
                 unroll: int = DEFAULT_UNROLL,
                 n_rows: int | None = None,
                 row0=0, jitter: str = "corner",
                 gather: str = "select", rr: bool = True) -> TraceResult:
    """Trace every pixel of a width x height frame on TPU.

    Returns a TraceResult with batch shape (height, width) — same contract as
    the oracle's trace, so tpt.integrator.apply_environment works on either.

    Row-band mode (the sharded path): ``n_rows``/``row0`` select a horizontal
    band of ``n_rows`` pixel rows starting at traced row index ``row0``; the
    batch shape becomes (n_rows, width).  Camera NDC math still uses the full
    width x height frame, and seeds depend only on absolute pixel coords
    (compute.glsl:106), so a banded render is bit-identical to the matching
    slice of a whole-frame render.
    """
    if interpret is None:
        interpret = _use_interpret()
    if n_rows is None:
        n_rows = height
    if gather not in ("select", "onehot"):
        raise ValueError(f"gather must be 'select' or 'onehot', got {gather!r}")
    if gather == "onehot" and counts is None:
        raise ValueError("gather='onehot' requires static counts")
    tile = tile_rows * LANES
    npix = width * n_rows
    npad = -(-npix // tile) * tile
    rows = npad // LANES
    grid = (rows // tile_rows,)

    flat = jnp.arange(npad, dtype=jnp.int32)
    px = (flat % width).reshape(rows, LANES)
    py = (jnp.minimum(flat // width + jnp.asarray(row0, jnp.int32), height - 1)
          .reshape(rows, LANES))

    cam = jnp.concatenate([
        jnp.asarray(inv_proj, jnp.float32).ravel(),
        jnp.asarray(inv_view, jnp.float32).ravel(),
        jnp.asarray(focal_length, jnp.float32).reshape(1),
        jnp.asarray(aperture_diameter, jnp.float32).reshape(1),
    ])
    counts_arr = jnp.stack([scene.num_spheres, scene.num_cuboids]).astype(jnp.int32)
    frame = jnp.asarray(frame, jnp.int32).reshape(1)
    sphere_geom, sphere_mat, cuboid_geom, cuboid_mat = _scene_smem_arrays(scene)

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    tile_spec = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    vec3_spec = pl.BlockSpec((3, tile_rows, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    miss_spec = pl.BlockSpec((spp, 3, tile_rows, LANES), lambda i: (0, 0, i, 0),
                             memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, width=width, height=height,
                               ray_depth=ray_depth, spp=spp,
                               counts=counts, unroll=unroll, jitter=jitter,
                               gather=gather, rr=rr)
    in_specs = [smem(), smem(), smem(), smem(), smem(), smem(), smem(),
                tile_spec, tile_spec]
    inputs = [counts_arr, frame, cam, sphere_geom, sphere_mat, cuboid_geom,
              cuboid_mat, px, py]
    if gather == "onehot":
        table_t = build_attr_table(scene, counts).T
        in_specs.append(pl.BlockSpec((ATTR_COLS, ATTR_ROWS), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(table_t)

        # ref order from pallas_call: the 9 main inputs, table_t (10th
        # input), then the 5 outputs
        def kernel(*refs, _k=kernel):
            return _k(*refs[:9], *refs[10:], table_t_ref=refs[9])

    rad, missd, misst, rays, seed = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(vec3_spec, miss_spec, miss_spec, tile_spec, tile_spec),
        out_shape=(
            jax.ShapeDtypeStruct((3, rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((spp, 3, rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((spp, 3, rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
        ),
        interpret=interpret,
    )(*inputs)

    def unflatten(a):
        # [..., rows, LANES] -> [..., n_rows, width]
        lead = a.shape[:-2]
        a = a.reshape(lead + (npad,))[..., :npix]
        return a.reshape(lead + (n_rows, width))

    return TraceResult(radiance=unflatten(rad), miss_dir=unflatten(missd),
                       miss_thr=unflatten(misst), ray_count=unflatten(rays),
                       seed=unflatten(seed))


def _kernel_progressive(counts_ref, frame_ref, nvalid_ref, cam_ref,
                        sphere_geom_ref, sphere_mat_ref, cuboid_geom_ref,
                        cuboid_mat_ref, px_ref, py_ref,
                        rad_ref, missd_ref, misst_ref, rays_ref, seed_ref,
                        *, width: int, height: int, ray_depth: int, spp: int,
                        n_frames: int, counts: Tuple[int, int] | None,
                        unroll: int, jitter: str, rr: bool):
    """Path-regeneration ("refill") kernel: one launch folds ``n_frames``
    frames' samples per lane as a queue (tpt.integrator.trace_progressive's
    in-kernel twin — progressive_iteration is shared verbatim, so the float
    stream is identical).

    Dead-lane economics vs the per-frame kernel: the bounce loop here runs
    a rolled while_loop that exits once every lane has drained its
    n_frames * spp sample queue — expected live iterations
    ~ n_frames * E[segments] + ONE straggler tail for the whole block,
    where the per-frame kernel pays ray_depth masked iterations per frame
    (the SIMT-break gap of compute.glsl:170-179; see PERF.md r5).
    """
    from ..integrator import PathState, progressive_iteration

    if counts is not None:
        num_spheres, num_cuboids = counts
    else:
        num_spheres = counts_ref[0]
        num_cuboids = counts_ref[1]
    frame0 = frame_ref[0]
    n_valid = nvalid_ref[0]

    def loop(n, body, init):
        full = counts is not None and unroll
        return jax.lax.fori_loop(0, n, body, init,
                                 unroll=True if full else None)

    cam = _unpack_cam(cam_ref)
    kernel_trace = make_select_trace(sphere_geom_ref, sphere_mat_ref,
                                     cuboid_geom_ref, cuboid_mat_ref,
                                     num_spheres, num_cuboids, loop)

    px = px_ref[:]
    py = py_ref[:]
    fpx = px.astype(jnp.float32)
    fpy = py.astype(jnp.float32)
    zero_lane = fpx * 0.0
    zero_i = px * 0
    zero_v3 = jnp.stack([zero_lane, zero_lane, zero_lane])
    n_slots = n_frames * spp

    # outputs accumulate across the loop — zero them up front
    rad_ref[:] = zero_v3
    missd_ref[:] = jnp.zeros(missd_ref.shape, missd_ref.dtype)
    misst_ref[:] = jnp.zeros(misst_ref.shape, misst_ref.dtype)
    seed_ref[:] = zero_i.astype(jnp.uint32)
    rays_ref[:] = zero_i

    max_iters = n_frames * spp * ray_depth

    def run(st_f32, st_u32, st_i32):
        """The refill loop with ALL per-lane state in VMEM scratch and a
        scalars-only while carry (iteration counter + work flag).  A
        vector-valued carry hits Mosaic's layout unification: constant
        inits fold to replicated-layout splats which can never be made
        concrete again at the loop boundary ("Invalid relayout ...
        replicated in destination but not in source")."""
        st_f32[:] = jnp.stack([zero_v3, zero_v3 + 1.0, zero_v3, zero_v3,
                               zero_v3, zero_v3])
        st_u32[:] = zero_i.astype(jnp.uint32)[None]
        st_i32[:] = jnp.stack([zero_i] * 5)

        def cond_fn(carry):
            i, any_work = carry
            return (i < max_iters) & (any_work != 0)

        def body_fn(carry):
            i, _ = carry
            state = PathState(
                origin=st_f32[0], direction=st_f32[1], throughput=st_f32[2],
                radiance=st_f32[3], miss_dir=st_f32[4], miss_thr=st_f32[5],
                seed=st_u32[0], alive=st_i32[0], ray_count=st_i32[1])
            lane_frame = st_i32[2]
            lane_sample = st_i32[3]
            lane_bounce = st_i32[4]
            state, lane_frame, lane_sample, lane_bounce, done, slot = \
                progressive_iteration(
                    kernel_trace, cam, px, py, fpx, fpy, width, height,
                    frame0, ray_depth, spp, n_valid, jitter, rr,
                    state, lane_frame, lane_sample, lane_bounce)
            # flush the completed samples straight into the VMEM outputs
            rad_ref[:] = rad_ref[:] + jnp.where(done[None], state.radiance,
                                                zero_v3)
            for k in range(n_slots):
                m = (done & (slot == k))[None]
                missd_ref[k] = jnp.where(m, state.miss_dir, missd_ref[k])
                misst_ref[k] = jnp.where(m, state.miss_thr, misst_ref[k])
            seed_ref[:] = jnp.where(done, state.seed, seed_ref[:])
            st_f32[:] = jnp.stack([state.origin, state.direction,
                                   state.throughput, state.radiance,
                                   state.miss_dir, state.miss_thr])
            st_u32[0] = state.seed
            st_i32[:] = jnp.stack([state.alive, state.ray_count,
                                   lane_frame, lane_sample, lane_bounce])
            any_work = jnp.any(lane_frame < n_valid).astype(jnp.int32)
            return i + 1, any_work

        jax.lax.while_loop(cond_fn, body_fn, (jnp.int32(0), jnp.int32(1)))
        rays_ref[:] = st_i32[1]

    pl.run_scoped(
        run,
        st_f32=pltpu.VMEM((6, 3) + px.shape, jnp.float32),
        st_u32=pltpu.VMEM((1,) + px.shape, jnp.uint32),
        st_i32=pltpu.VMEM((5,) + px.shape, jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=(
    "width", "height", "ray_depth", "spp", "n_frames", "tile_rows",
    "interpret", "counts", "unroll", "n_rows", "jitter", "rr"))
def pallas_trace_progressive(scene, inv_proj, inv_view, frame0, focal_length,
                             aperture_diameter, *, width: int, height: int,
                             ray_depth: int, spp: int, n_frames: int,
                             n_valid=None,
                             tile_rows: int = DEFAULT_TILE_ROWS,
                             interpret: bool | None = None,
                             counts: Tuple[int, int] | None = None,
                             unroll: int = DEFAULT_UNROLL,
                             n_rows: int | None = None, row0=0,
                             jitter: str = "corner", rr: bool = True):
    """Trace ``n_frames`` consecutive progressive frames in ONE kernel
    launch via path regeneration (see _kernel_progressive).

    Returns a tpt.integrator.ProgressiveTraceResult with batch shape
    (n_rows, width) and per-(frame, sample) miss slots [n_frames * spp];
    slots match the per-frame pallas_trace outputs path-for-path:
    integer outputs (seeds, ray counts — the RNG stream and every discrete
    decision) bit-exactly, floats to last-ulp rounding
    (tests/test_refill.py::test_kernel_refill_*).

    ``n_valid``: optional traced i32 — frames >= n_valid are skipped (their
    slots stay zero), so a partial tail chunk reuses the compiled program.
    """
    if interpret is None:
        interpret = _use_interpret()
    if n_rows is None:
        n_rows = height
    if n_valid is None:
        n_valid = jnp.int32(n_frames)
    n_slots = n_frames * spp
    tile = tile_rows * LANES
    npix = width * n_rows
    npad = -(-npix // tile) * tile
    rows = npad // LANES
    grid = (rows // tile_rows,)

    flat = jnp.arange(npad, dtype=jnp.int32)
    px = (flat % width).reshape(rows, LANES)
    py = (jnp.minimum(flat // width + jnp.asarray(row0, jnp.int32), height - 1)
          .reshape(rows, LANES))

    cam = jnp.concatenate([
        jnp.asarray(inv_proj, jnp.float32).ravel(),
        jnp.asarray(inv_view, jnp.float32).ravel(),
        jnp.asarray(focal_length, jnp.float32).reshape(1),
        jnp.asarray(aperture_diameter, jnp.float32).reshape(1),
    ])
    counts_arr = jnp.stack([scene.num_spheres,
                            scene.num_cuboids]).astype(jnp.int32)
    frame0 = jnp.asarray(frame0, jnp.int32).reshape(1)
    nvalid_arr = jnp.asarray(n_valid, jnp.int32).reshape(1)
    sphere_geom, sphere_mat, cuboid_geom, cuboid_mat = _scene_smem_arrays(scene)

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    tile_spec = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    vec3_spec = pl.BlockSpec((3, tile_rows, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    slot_spec = pl.BlockSpec((n_slots, 3, tile_rows, LANES),
                             lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel_progressive, width=width, height=height, ray_depth=ray_depth,
        spp=spp, n_frames=n_frames, counts=counts, unroll=unroll,
        jitter=jitter, rr=rr)

    rad, missd, misst, rays, seed = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem(), smem(), smem(), smem(), smem(), smem(), smem(),
                  smem(), tile_spec, tile_spec],
        out_specs=(vec3_spec, slot_spec, slot_spec, tile_spec, tile_spec),
        out_shape=(
            jax.ShapeDtypeStruct((3, rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_slots, 3, rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_slots, 3, rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
        ),
        interpret=interpret,
    )(counts_arr, frame0, nvalid_arr, cam, sphere_geom, sphere_mat,
      cuboid_geom, cuboid_mat, px, py)

    from ..integrator import ProgressiveTraceResult

    def unflatten(a):
        lead = a.shape[:-2]
        a = a.reshape(lead + (npad,))[..., :npix]
        return a.reshape(lead + (n_rows, width))

    return ProgressiveTraceResult(
        rad_sum=unflatten(rad), miss_dir=unflatten(missd),
        miss_thr=unflatten(misst), ray_count=unflatten(rays),
        seed=unflatten(seed))
