"""Pallas backward kernel: in-kernel reverse-mode of the path trace.

``trace_diff`` is the differentiable production trace: the forward is the
Pallas trace kernel (tpt.kernels.trace), the backward is a second Pallas
kernel (``pallas_trace_grad``) that re-runs the tile's transport and
transposes it with a HAND-WRITTEN reverse sweep:

  * forward sweep: an unrolled walk re-runs the bounce chain at
    production-forward cost — the closest-hit fold runs ONCE per bounce
    and the winner attributes come from the production kernel's
    masked-select gather (the sweep only replays the primal, so the
    differentiable one-hot machinery buys nothing there) — and stores
    each bounce's INPUT carry (origin/direction/throughput/miss fields/
    seed/alive) plus the fold's 1-int hit record into VMEM scratch
    (~180 KB per bounce per (16, 128) tile at depth 13);
  * reverse sweep: a rolled ``fori_loop`` walks the bounces backwards;
    each step re-evaluates ONE bounce from its stored carry + hit record
    (tpt.integrator.onehot_hit_trace — NO re-fold: the 55-primitive scan
    prices in once per bounce total, like the production forward) under
    ``jax.vjp`` and transposes it, accumulating the attr-table cotangent
    and carrying the state cotangent — per-bounce rematerialization with
    none of jax's remat machinery (``jax.checkpoint`` lowers to
    closed_call, and reverse-mode over ``lax.scan`` emits residual-stacking
    scans — Mosaic can lower neither; both failure modes are why this sweep
    is hand-written);
  * camera/lens cotangents: the primary-ray generation
    (tpt.integrator.primary_ray — shared with trace_paths, so both paths
    linearize at the same primal) is vjp'd separately per sample, fed by
    the reverse sweep's origin/direction cotangents at bounce 0;
  * in the REVERSE sweep, winner attributes flow through an
    ATTRIBUTE-MAJOR MXU one-hot matmul (tpt.integrator._onehot_cols):
    every attribute channel is a leading-axis native-tile slice (the
    row-major r3 form lane-sliced a minor-dim-24 array — ~24 cross-lane
    relayouts per bounce, the dominant r3 cost), and the hand-phrased
    transpose is ONE [K, B] x [B, R] MXU contraction per bounce;
  * parameter cotangents accumulate across grid steps into a
    constant-index output block (d_table_t f32[24, 128] — native lane
    width) and SMEM scalars
    (d_cam, 20 camera/lens entries); the Pallas TPU grid is sequential, so
    read-modify-write accumulation is race-free;
  * RNG is recomputed bit-identically from (px, py, frame) — no stored
    randomness;
  * scene geometry scalars are read from SMEM ONCE at kernel entry into
    values (make_value_scan_fold): refs read inside transposed loops
    miscount JaxprInputEffects at partial-eval time.

Compile time is bounded: the program contains ~4 bounce bodies total (one
forward, one recomputed + its transpose in reverse, camera vjp) regardless
of ray_depth — the depth-unrolled alternative exploded Mosaic compile time
superlinearly.

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

from .. import rng
from ..config import MAX_SPHERES
from ..integrator import (ATTR_COLS, ATTR_ROWS, CameraParams, PathState,
                          TraceResult, bounce_step, build_attr_table,
                          onehot_hit_trace, primary_ray, sample_draws)
from ..ops.intersect import FLOAT_MAX, ray_cuboid, ray_sphere, smallest_positive
from .trace import DEFAULT_UNROLL, LANES, _scene_smem_arrays, _use_interpret

# Backward tile rows: 24 won the r5 sweep over {8, 16, 24, 32} at 1080p
# (125.4 / 133.0 / 140.4 / 145.8 ms wall for 24/16/8/32 — full stores;
# benchmarks/exp_bwd_stores.py, artifacts/bwd_stores_sweep.json).  The
# same sweep measured the half_stores (even-bounce-store + odd-carry
# recompute) policy net-negative at every tile size.
DEFAULT_GRAD_TILE_ROWS = 24

N_CAM = 20  # ip00,ip01,ip02,ip10,ip11,ip12, right, up, backward, eye, focal, aperture

# When True, every pallas_trace_grad call logs how many non-finite parameter
# cotangent entries its finite filter zeroed (see the filter's comment).
# Set BEFORE the first traced call (it is baked in at trace time).  NOTE:
# the log uses jax.debug.print, which the axon TPU tunnel does not support
# (no host callbacks) — use it on CPU/interpret runs.
NONFINITE_DEBUG = False


def make_value_scan_fold(sphere_vals, cuboid_vals):
    """Closest-hit fold over *pre-read* per-primitive scalar values, in the
    shader's scan order (compute.glsl:226-258) — the tpt.integrator.ScanFn
    contract, same semantics as trace.make_smem_scan_fold.

    The backward kernel cannot use the SMEM-ref fold: the fold runs inside
    transposed loops, and a ref read crossing a vjp boundary miscounts
    JaxprInputEffects at partial-eval time ("JaxprInputEffect Read<-2> does
    not have corresponding jaxpr input").  Reading the scene scalars ONCE at
    kernel entry and folding over the resulting values keeps the
    differentiated region effect-free.  Counts are static here (the
    backward requires them), so the fold is a Python unroll."""

    def scan(origin, direction):
        batch = origin.shape[1:]
        zero_lane = origin[0] * 0.0

        def splat(c):
            return jnp.broadcast_to(c, batch)

        best_t = zero_lane + FLOAT_MAX
        best_idx = jnp.zeros_like(zero_lane, jnp.int32) - 1
        inside = jnp.zeros_like(zero_lane, jnp.int32)

        def consider(carry, t1, t2, ok, idx):
            b_t, b_idx, b_in = carry
            cond = ok & (t2 > 0.0) & (t1 < b_t)
            t = smallest_positive(t1, t2)
            return (jnp.where(cond, t, b_t),
                    jnp.where(cond, idx, b_idx),
                    jnp.where(cond, (t == t2).astype(jnp.int32), b_in))

        carry = (best_t, best_idx, inside)
        for i, (cx, cy, cz, r) in enumerate(sphere_vals):
            center = jnp.stack([splat(cx), splat(cy), splat(cz)])
            t1, t2, ok = ray_sphere(origin, direction, center, r)
            carry = consider(carry, t1, t2, ok, i)
        for j, (mnx, mny, mnz, mxx, mxy, mxz) in enumerate(cuboid_vals):
            mn = jnp.stack([splat(mnx), splat(mny), splat(mnz)])
            mx = jnp.stack([splat(mxx), splat(mxy), splat(mxz)])
            t1, t2, ok = ray_cuboid(origin, direction, mn, mx)
            carry = consider(carry, t1, t2, ok, MAX_SPHERES + j)
        best_t, best_idx, inside = carry
        return best_t != FLOAT_MAX, best_idx, best_t, inside != 0

    return scan


def _grad_kernel(frame_ref, cam_ref, sphere_geom_ref, sphere_mat_ref,
                 cuboid_geom_ref, cuboid_mat_ref,
                 table_ref, px_ref, py_ref, grad_ref, gmissd_ref, gmisst_ref,
                 dtable_ref, dcam_ref,
                 s_orig, s_dir, s_thr, s_md, s_mt, s_seed, s_alive,
                 s_widx, s_ins, s_dtbl,
                 *, width: int, height: int, ray_depth: int, spp: int,
                 counts: Tuple[int, int], unroll: int, jitter: str,
                 rr: bool = True, ablate: str = "none",
                 half_stores: bool = False):
    num_spheres, num_cuboids = counts
    frame = frame_ref[0]
    del unroll  # the value fold is a static Python unroll

    # Hoist every SMEM scene read to kernel entry (see make_value_scan_fold).
    # These are ns*4 + nc*6 scalar loads per grid step — noise next to the
    # transport math.
    sphere_vals = tuple(tuple(sphere_geom_ref[i, k] for k in range(4))
                        for i in range(num_spheres))
    cuboid_vals = tuple(tuple(cuboid_geom_ref[j, k] for k in (0, 1, 2, 4, 5, 6))
                        for j in range(num_cuboids))
    MAT_LANES = 14
    sphere_mats = tuple(tuple(sphere_mat_ref[i, k] for k in range(MAT_LANES))
                        for i in range(num_spheres))
    cuboid_mats = tuple(tuple(cuboid_mat_ref[j, k] for k in range(MAT_LANES))
                        for j in range(num_cuboids))
    fold = make_value_scan_fold(sphere_vals, cuboid_vals)

    def select_winner(idx):
        """Winner attributes via masked broadcast-selects over the hoisted
        scalar values — the production forward kernel's pass-2 gather.  The
        forward SWEEP needs no table cotangent, so the one-hot MXU gather
        buys nothing there and costs ~40% of the whole backward (r4 bisect:
        fwd sweep 66.4 ms of 94.5 with the one-hot vs the production
        forward's ~25 ms); selects keep it at production speed.  Values are
        bit-identical to the one-hot gather (both read the same table)."""
        batch = idx.shape
        zero_lane = jnp.zeros(batch, jnp.float32)

        def splat(c):
            return jnp.broadcast_to(c, batch)

        def sel_vec(cond, scalars, carried):
            vec = jnp.stack([splat(c) for c in scalars])
            return jnp.where(cond[None], vec, carried)

        mat = jnp.zeros((MAT_LANES,) + batch, jnp.float32)
        s_center = jnp.zeros((3,) + batch, jnp.float32)
        s_radius = zero_lane
        c_min = jnp.zeros((3,) + batch, jnp.float32)
        c_max = jnp.zeros((3,) + batch, jnp.float32)
        for i, (geom, m) in enumerate(zip(sphere_vals, sphere_mats)):
            msk = idx == i
            mat = sel_vec(msk, m, mat)
            s_center = sel_vec(msk, geom[0:3], s_center)
            s_radius = jnp.where(msk, geom[3], s_radius)
        for j, (geom, m) in enumerate(zip(cuboid_vals, cuboid_mats)):
            msk = idx == MAX_SPHERES + j
            mat = sel_vec(msk, m, mat)
            c_min = sel_vec(msk, geom[0:3], c_min)
            c_max = sel_vec(msk, geom[3:6], c_max)
        from ..integrator import Winner
        return Winner(material=mat, sphere_center=s_center,
                      sphere_radius=s_radius, cuboid_min=c_min,
                      cuboid_max=c_max,
                      is_sphere=(idx >= 0) & (idx < MAX_SPHERES))

    def bounce_from_hit(tbl_t, st, idx, inside):
        """One bounce evaluated from a precomputed hit record: the fold
        (55 intersectors, detached) runs ONCE per bounce in the forward
        sweep; both the stored-carry replay and the reverse transpose
        consume the 1-int record instead of re-folding — the r4 fix for
        the r3 backward's ~70x-forward step time.  ``tbl_t`` is the
        attribute-major table (see integrator._onehot_cols)."""
        trace = lambda o, d: onehot_hit_trace(tbl_t, num_spheres, o, d,
                                              idx, inside)
        return bounce_step(st, trace, russian_roulette=rr)

    px = px_ref[:]
    py = py_ref[:]
    cam_vals = tuple(cam_ref[k] for k in range(N_CAM))
    table_t = table_ref[:]          # [ATTR_COLS, ATTR_ROWS] attribute-major
    g_rad = grad_ref[:]

    fpx = jnp.asarray(px, jnp.float32)
    fpy = jnp.asarray(py, jnp.float32)
    seed = rng.pixel_seed(px, py, frame)
    zero_lane = fpx * 0.0
    zero_v3 = jnp.stack([zero_lane, zero_lane, zero_lane])
    ray_count = jnp.asarray(px, jnp.int32) * 0

    def cam_params(cv):
        (ip00, ip01, ip02, ip10, ip11, ip12,
         rx, ry, rz, ux, uy, uz, bx, by, bz, ex, ey, ez,
         focal, aperture) = cv
        return CameraParams(ip00=ip00, ip01=ip01, ip02=ip02,
                            ip10=ip10, ip11=ip11, ip12=ip12,
                            right=(rx, ry, rz), up=(ux, uy, uz),
                            backward=(bx, by, bz), eye=(ex, ey, ez),
                            focal_length=focal, aperture_diameter=aperture)

    d_table_total = table_t * 0.0
    d_cam_total = tuple(cam_vals[k] * 0.0 for k in range(N_CAM))

    for s in range(spp):
        draws, seed = sample_draws(seed)

        def ray_fn(cv, draws=draws):
            return primary_ray(cam_params(cv), fpx, fpy, width, height,
                               draws, jitter)

        if ablate == "nocam":
            o0, d0 = ray_fn(cam_vals)
            ray_vjp = lambda ct: (tuple(c * 0.0 for c in cam_vals),)
        else:
            (o0, d0), ray_vjp = jax.vjp(ray_fn, cam_vals)

        state = PathState(
            origin=o0, direction=d0,
            throughput=zero_v3 + 1.0,
            radiance=zero_v3,
            seed=seed,
            alive=ray_count * 0 + 1,
            miss_dir=zero_v3,
            miss_thr=zero_v3,
            ray_count=ray_count,
        )

        # ---- forward sweep: run + store each bounce's input carry ----
        # Python-unrolled, NOT fori: Mosaic's layout unification rejects the
        # mixed-dtype PathState carry (concrete->replicated i32 relayout);
        # the production forward kernel unrolls its bounce loop for the same
        # reason, and compiles at depth 13 in tens of seconds.  The stores
        # are static-index scratch writes.  Once every lane in the tile is
        # dead, later bounces are skipped exactly like the forward kernel
        # (a dead bounce is the identity, so the stored carries stay valid
        # and the reverse sweep sees identity vjps for those js).
        # The closest-hit fold runs HERE ONLY — its winner index + inside
        # flag are stored per bounce (the i32 slab) and replayed by the
        # reverse sweep, so the 55-primitive scan prices in once per bounce
        # exactly like the production forward kernel.
        # (Stores measured ~13 ms/step of the backward via the
        # ablate='nostores' probe; packing them into two wide slabs was
        # tried and traded the store cost for pricier dynamic-j slab reads
        # in the reverse sweep — net negative, so the separate per-field
        # arrays stay.)
        # half_stores (r5 experiment): only bounces 0, 2, 4, ... store
        # their input carry; the reverse sweep recomputes an odd bounce j's
        # carry with ONE extra bounce_from_hit from the stored carry at j-1
        # and its stored hit record (bit-identical primal).  Halves scratch
        # + store traffic for ~half a bounce eval per reverse step —
        # MEASURED NET-NEGATIVE at 1080p (145.9 vs 126.6 ms/step: the
        # recompute + per-step parity cond cost more than the stores), so
        # the default stays full stores; kept selectable for the record
        # (benchmarks/exp_bwd_stores.py).
        for k in range(ray_depth):
            if ablate != "nostores" and (not half_stores or k % 2 == 0):
                kk = k // 2 if half_stores else k
                s_orig[kk] = state.origin
                s_dir[kk] = state.direction
                s_thr[kk] = state.throughput
                s_md[kk] = state.miss_dir
                s_mt[kk] = state.miss_thr
                s_seed[kk] = state.seed
                s_alive[kk] = state.alive

            def fwd_bounce(st, k=k):
                found, idx, best_t, inside = fold(st.origin, st.direction)
                if ablate != "nostores":
                    s_widx[k] = idx
                    s_ins[k] = inside.astype(jnp.int32)
                winner = select_winner(idx)
                trace = lambda o, d: (found, best_t, inside, winner)
                return bounce_step(st, trace, russian_roulette=rr)

            if k == 0:
                state = fwd_bounce(state)
            else:
                # the skipped branch leaves the i32 slab stale — safe:
                # the reverse sweep's all-dead cond (on the alive row of
                # the unconditionally-written f32 slab) never reads it
                state = jax.lax.cond(jnp.any(state.alive != 0),
                                     fwd_bounce, lambda st: st, state)
        seed = state.seed
        ray_count = state.ray_count

        # ---- reverse sweep: transpose one bounce per step ----
        # Rolled fori with an all-f32, uniform-shape carry (the five state
        # cotangents); the attr-table cotangent accumulates in VMEM scratch
        # so the carry stays layout-uniform.  One bounce + its transpose is
        # the whole loop body — compile time is depth-independent.
        g_md = gmissd_ref[s]
        g_mt = gmisst_ref[s]
        s_dtbl[:] = table_t * 0.0

        def load_carry(j):
            """Bounce j's input carry: with full stores, a direct slab
            read; with half_stores, read the even-store slab at j//2
            (which holds bounce 2*(j//2) — j itself when j is even, j-1
            when odd) and, for odd j, advance it one bounce from the
            stored hit record."""
            if not half_stores:
                return (s_orig[j], s_dir[j], s_thr[j], s_md[j], s_mt[j],
                        s_seed[j], s_alive[j])
            jh = j // 2
            base = (s_orig[jh], s_dir[jh], s_thr[jh], s_md[jh], s_mt[jh],
                    s_seed[jh], s_alive[jh])

            def advance(base):
                o_b, d_b, th_b, md_b, mt_b, seed_b, alive_b = base
                st = PathState(origin=o_b, direction=d_b, throughput=th_b,
                               radiance=o_b * 0.0, seed=seed_b,
                               alive=alive_b, miss_dir=md_b, miss_thr=mt_b,
                               ray_count=alive_b * 0)
                out = bounce_from_hit(table_t, st, s_widx[j - 1],
                                      s_ins[j - 1] != 0)
                return (out.origin, out.direction, out.throughput,
                        out.miss_dir, out.miss_thr, out.seed, out.alive)

            return jax.lax.cond(j % 2 == 1, advance, lambda b: b, base)

        def rev_body_primal(k, carry):
            # ablation: reverse walk re-running the bounce primal only
            j = ray_depth - 1 - k
            o_j, dir_j, th_j, md_j, mt_j, seed_j, alive_j = load_carry(j)
            st = PathState(origin=o_j, direction=dir_j,
                           throughput=th_j, radiance=o_j * 0.0,
                           seed=seed_j, alive=alive_j,
                           miss_dir=md_j, miss_thr=mt_j,
                           ray_count=alive_j * 0)
            out = jax.lax.cond(jnp.any(alive_j != 0),
                               lambda st: bounce_from_hit(table_t, st,
                                                          s_widx[j],
                                                          s_ins[j] != 0),
                               lambda st: st, st)
            d_o, d_d, d_th, d_md, d_mt = carry
            return (d_o + out.origin * 1e-30, d_d + out.direction * 1e-30,
                    d_th, d_md, d_mt)

        def rev_body(k, carry):
            j = ray_depth - 1 - k
            o_j, dir_j, th_j, md_j, mt_j, seed_j, alive_j = load_carry(j)
            idx_j, ins_j = s_widx[j], s_ins[j]

            def transpose_bounce(carry):
                d_o, d_d, d_th, d_md, d_mt = carry

                def b(tbl_t, o, dr, th, md, mt):
                    st = PathState(origin=o, direction=dr, throughput=th,
                                   radiance=o * 0.0, seed=seed_j,
                                   alive=alive_j, miss_dir=md, miss_thr=mt,
                                   ray_count=alive_j * 0)
                    out = bounce_from_hit(tbl_t, st, idx_j, ins_j != 0)
                    return (out.origin, out.direction, out.throughput,
                            out.radiance, out.miss_dir, out.miss_thr)

                _, vjp = jax.vjp(b, table_t, o_j, dir_j, th_j, md_j, mt_j)
                # radiance accumulates additively across bounces, so its
                # cotangent is the constant g_rad at every bounce
                dt, do, dd, dth, dmd, dmt = vjp((d_o, d_d, d_th, g_rad,
                                                 d_md, d_mt))
                if ablate != "nodtbl":
                    s_dtbl[:] += dt
                return (do, dd, dth, dmd, dmt)

            # a bounce whose input tile was all-dead is the identity: its
            # transpose passes the cotangents through and adds nothing to
            # the table — skip it, mirroring the forward kernel's skip
            return jax.lax.cond(jnp.any(alive_j != 0),
                                transpose_bounce, lambda c: c, carry)

        init = (zero_v3, zero_v3, zero_v3, g_md, g_mt)
        if ablate == "norev":
            d_o0, d_d0 = zero_v3, zero_v3
        else:
            body = rev_body_primal if ablate == "primalonly" else rev_body
            d_o0, d_d0, _d_th, _d_md, _d_mt = jax.lax.fori_loop(
                0, ray_depth, body, init)

        (d_cam_s,) = ray_vjp((d_o0, d_d0))
        d_table_total = d_table_total + s_dtbl[:]
        d_cam_total = tuple(a + b for a, b in zip(d_cam_total, d_cam_s))

    @pl.when(pl.program_id(0) == 0)
    def _():
        dtable_ref[:] = jnp.zeros_like(dtable_ref)
        for k in range(N_CAM):
            dcam_ref[k] = jnp.float32(0.0)

    dtable_ref[:] += d_table_total
    for k in range(N_CAM):
        dcam_ref[k] += d_cam_total[k]


@functools.partial(jax.jit, static_argnames=("width", "height", "ray_depth",
                                             "spp", "tile_rows", "interpret",
                                             "counts", "unroll", "n_rows",
                                             "jitter", "ablate", "rr",
                                             "half_stores"))
def pallas_trace_grad(scene, inv_proj, inv_view, frame, focal_length,
                      aperture_diameter, g_rad, g_missd, g_misst,
                      *, width: int, height: int, ray_depth: int, spp: int,
                      counts: Tuple[int, int],
                      tile_rows: int = DEFAULT_GRAD_TILE_ROWS,
                      interpret: bool | None = None,
                      unroll: int = DEFAULT_UNROLL,
                      n_rows: int | None = None, row0=0,
                      jitter: str = "corner", ablate: str = "none",
                      rr: bool = True, half_stores: bool = False):
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

    table, table_vjp = jax.vjp(
        lambda s: build_attr_table(s, counts), scene)
    table_t = table.T    # attribute-major for the kernel (_onehot_cols)

    sphere_geom, sphere_mat, cuboid_geom, cuboid_mat = _scene_smem_arrays(scene)
    frame_arr = jnp.asarray(frame, jnp.int32).reshape(1)

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    tile_spec = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    vec3_spec = pl.BlockSpec((3, tile_rows, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    miss_spec = pl.BlockSpec((spp, 3, tile_rows, LANES),
                             lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec((ATTR_COLS, ATTR_ROWS), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)

    # with half_stores the carry slabs cover bounces 0, 2, 4, ... only
    # (the reverse sweep recomputes odd carries — see _grad_kernel); the
    # 1-int hit records stay per-bounce either way
    depth_store = (ray_depth + 1) // 2 if half_stores else ray_depth
    v3_scr = pltpu.VMEM((depth_store, 3, tile_rows, LANES), jnp.float32)
    half_scr = lambda dt: pltpu.VMEM((depth_store, tile_rows, LANES), dt)
    lane_scr = lambda dt: pltpu.VMEM((ray_depth, tile_rows, LANES), dt)

    kernel = functools.partial(_grad_kernel, width=width, height=height,
                               ray_depth=ray_depth, spp=spp, counts=counts,
                               unroll=unroll, jitter=jitter, ablate=ablate,
                               rr=rr, half_stores=half_stores)
    d_table, d_cam = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem(), smem(), smem(), smem(), smem(), smem(), table_spec,
                  tile_spec, tile_spec, vec3_spec, miss_spec, miss_spec],
        out_specs=(table_spec, smem()),
        out_shape=(
            jax.ShapeDtypeStruct((ATTR_COLS, ATTR_ROWS), jnp.float32),
            jax.ShapeDtypeStruct((N_CAM,), jnp.float32),
        ),
        scratch_shapes=[v3_scr, v3_scr, v3_scr, v3_scr, v3_scr,
                        half_scr(jnp.uint32), half_scr(jnp.int32),
                        lane_scr(jnp.int32), lane_scr(jnp.int32),
                        pltpu.VMEM((ATTR_COLS, ATTR_ROWS), jnp.float32)],
        # the transposed bounce body's live set exceeds the 16M default
        # scoped-vmem cap; v5e has 128M physical VMEM per core (16-row
        # tiles measured 122M under the r3 layout — cap near the ceiling)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(frame_arr, cam20, sphere_geom, sphere_mat, cuboid_geom, cuboid_mat,
      table_t, px, py, g_rad, g_missd, g_misst)
    d_table = d_table.T  # back to the build_attr_table row-major layout

    # Finite filter: rare degenerate lane configurations (observed ~1 pixel
    # per few frames at 1080p) can emit a non-finite parameter cotangent,
    # and the one-hot transpose's column reduction then poisons an entire
    # table column.  Zero the offending entries — the standard
    # differentiable-rendering treatment of measure-zero gradient events
    # (the estimator is already biased at decision boundaries; dropping a
    # measure-zero set changes nothing in expectation).  The masked count
    # stays observable (a systematic NaN regression must not hide as
    # silently-zeroed gradients): set NONFINITE_DEBUG=True to log it per
    # call; a count above the measure-zero scale (> ~ATTR_COLS entries, one
    # poisoned table column) indicates a backward-kernel bug, not noise.
    n_bad = (jnp.sum(~jnp.isfinite(d_table)).astype(jnp.int32)
             + jnp.sum(~jnp.isfinite(d_cam)).astype(jnp.int32))
    if NONFINITE_DEBUG:
        jax.debug.print(
            "pallas_trace_grad: zeroed {n} non-finite cotangent entries",
            n=n_bad)
    d_table = jnp.where(jnp.isfinite(d_table), d_table, 0.0)
    d_cam = jnp.where(jnp.isfinite(d_cam), d_cam, 0.0)
    (d_scene,) = table_vjp(d_table)
    d_ip = jnp.zeros((4, 4), jnp.float32)
    d_ip = d_ip.at[0, 0].set(d_cam[0]).at[0, 1].set(d_cam[1]).at[0, 2].set(d_cam[2])
    d_ip = d_ip.at[1, 0].set(d_cam[3]).at[1, 1].set(d_cam[4]).at[1, 2].set(d_cam[5])
    d_iv = jnp.zeros((4, 4), jnp.float32)
    for j in range(4):
        for i in range(3):
            d_iv = d_iv.at[i, j].set(d_cam[6 + 3 * j + i])
    return d_scene, d_ip, d_iv, d_cam[18], d_cam[19]


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(7, 8, 9, 10, 11, 12, 13, 14))
def trace_diff(scene, inv_proj, inv_view, frame, focal_length,
               aperture_diameter, row0, width: int, height: int,
               ray_depth: int, spp: int, counts: Tuple[int, int],
               n_rows: int | None = None,
               jitter: str = "corner", rr: bool = True) -> TraceResult:
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
                        n_rows=n_rows, row0=row0, jitter=jitter, rr=rr)


def _trace_diff_fwd(scene, inv_proj, inv_view, frame, focal_length,
                    aperture_diameter, row0, width, height, ray_depth, spp,
                    counts, n_rows=None, jitter="corner", rr=True):
    out = trace_diff(scene, inv_proj, inv_view, frame, focal_length,
                     aperture_diameter, row0, width, height, ray_depth, spp,
                     counts, n_rows, jitter, rr)
    return out, (scene, inv_proj, inv_view, frame, focal_length,
                 aperture_diameter, row0)


def _trace_diff_bwd(width, height, ray_depth, spp, counts, n_rows, jitter,
                    rr, residuals, ct):
    scene, inv_proj, inv_view, frame, focal, aperture, row0 = residuals
    d_scene, d_ip, d_iv, d_focal, d_ap = pallas_trace_grad(
        scene, inv_proj, inv_view, frame, focal, aperture,
        ct.radiance, ct.miss_dir, ct.miss_thr,
        width=width, height=height, ray_depth=ray_depth, spp=spp,
        counts=counts, n_rows=n_rows, row0=row0, jitter=jitter, rr=rr)
    d_frame = np.zeros(np.shape(frame), jax.dtypes.float0)
    d_row0 = np.zeros(np.shape(row0), jax.dtypes.float0)
    return d_scene, d_ip, d_iv, d_frame, d_focal, d_ap, d_row0


trace_diff.defvjp(_trace_diff_fwd, _trace_diff_bwd)
