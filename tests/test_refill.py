"""Path-regeneration ("refill") progressive loop vs the per-frame loop.

tpt.integrator.trace_progressive must reproduce n_frames sequential
trace_paths calls path-for-path: integer outputs (ray counts, final
seeds — i.e. the RNG stream and every discrete decision) BIT-exactly,
float outputs to last-ulp tolerance (the restructured program hands XLA
different fusion contexts for the same arithmetic) — while executing far
fewer live iterations (the whole point: dead-lane work amortizes across
the frame block instead of recurring every frame).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpt import camera
from tpt.config import CameraConfig
from tpt.integrator import (camera_params, compose_trace_fn,
                            make_scene_scan_fn, make_xla_gather_fn,
                            trace_paths, trace_progressive)
from tpt.scene import cornell_scene, demo_scene

W, H = 24, 16
CAM = CameraConfig(position=(0.0, 0.5, 2.0), look_x=-90.0, look_y=-5.0,
                   focal_length=8.0, aperture_diameter=0.1)


def assert_ulp(a, b, msg=""):
    """Float equality up to XLA-fusion rounding: the same arithmetic
    compiled in a different context rounds differently at the last ulp,
    and near-cancelling ops (refract/normalize) amplify that by their
    condition number (observed: ~1e-4 relative on isolated direction
    components).  Path structure is checked exactly via the integer
    outputs (seeds, ray counts), so this is purely a rounding margin."""
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-3, atol=1e-4, err_msg=msg)


def _setup(builder, cam_cfg, counts):
    scene = builder.build()
    inv_p, inv_v, _ = camera.camera_matrices(cam_cfg, W, H)
    cam = camera_params(inv_p, inv_v, jnp.float32(cam_cfg.focal_length),
                        jnp.float32(cam_cfg.aperture_diameter))
    trace = compose_trace_fn(make_scene_scan_fn(scene, counts=counts),
                             make_xla_gather_fn(scene))
    py = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    px = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    return trace, cam, px, py


@pytest.mark.parametrize("spp,n_frames,depth,rr", [
    (1, 4, 5, True),
    (2, 3, 4, True),
    (1, 2, 3, False),
])
def test_refill_matches_per_frame_loop(spp, n_frames, depth, rr):
    trace, cam, px, py = _setup(cornell_scene(), CAM, (4, 0))
    frame0 = jnp.int32(7)

    got = jax.jit(lambda: trace_progressive(
        trace, cam, px, py, W, H, frame0, depth, spp, n_frames,
        russian_roulette=rr))()

    rad_sum = jnp.zeros((3, H, W), jnp.float32)
    rays = jnp.zeros((H, W), jnp.int32)
    for f in range(n_frames):
        res = jax.jit(lambda f=f: trace_paths(
            trace, cam, px, py, W, H, frame0 + f, depth, spp,
            russian_roulette=rr))()
        rad_sum = rad_sum + res.radiance
        rays = rays + res.ray_count
        for s in range(spp):
            k = f * spp + s
            assert_ulp(got.miss_dir[k], res.miss_dir[s],
                       f"miss_dir frame {f} sample {s}")
            assert_ulp(got.miss_thr[k], res.miss_thr[s],
                       f"miss_thr frame {f} sample {s}")
        if f == n_frames - 1:
            np.testing.assert_array_equal(np.asarray(got.seed),
                                          np.asarray(res.seed))
    assert_ulp(got.rad_sum, rad_sum, "rad_sum")
    np.testing.assert_array_equal(np.asarray(got.ray_count), np.asarray(rays))


def test_refill_n_valid_masks_tail_frames():
    trace, cam, px, py = _setup(cornell_scene(), CAM, (4, 0))
    full = jax.jit(lambda: trace_progressive(
        trace, cam, px, py, W, H, jnp.int32(0), 4, 1, 2))()
    masked = jax.jit(lambda: trace_progressive(
        trace, cam, px, py, W, H, jnp.int32(0), 4, 1, 4,
        n_valid=jnp.int32(2)))()
    np.testing.assert_array_equal(np.asarray(full.rad_sum),
                                  np.asarray(masked.rad_sum))
    np.testing.assert_array_equal(np.asarray(full.miss_dir),
                                  np.asarray(masked.miss_dir[:2]))
    assert not np.any(np.asarray(masked.miss_thr[2:]))
    np.testing.assert_array_equal(np.asarray(full.ray_count),
                                  np.asarray(masked.ray_count))


def test_kernel_refill_matches_per_frame_kernel():
    """The Pallas refill kernel vs n_frames separate pallas_trace launches
    (interpret mode on CPU): integers bit-exact, floats at ulp."""
    from tpt.kernels.trace import pallas_trace, pallas_trace_progressive
    scene = cornell_scene().build()
    inv_p, inv_v, _ = camera.camera_matrices(CAM, W, H)
    focal = jnp.float32(CAM.focal_length)
    ap = jnp.float32(CAM.aperture_diameter)
    n_frames, depth, spp = 3, 4, 1

    got = pallas_trace_progressive(
        scene, inv_p, inv_v, jnp.int32(2), focal, ap, width=W, height=H,
        ray_depth=depth, spp=spp, n_frames=n_frames)

    rad_sum = jnp.zeros((3, H, W), jnp.float32)
    rays = jnp.zeros((H, W), jnp.int32)
    for f in range(n_frames):
        res = pallas_trace(scene, inv_p, inv_v, jnp.int32(2 + f), focal, ap,
                           width=W, height=H, ray_depth=depth, spp=spp)
        rad_sum = rad_sum + res.radiance
        rays = rays + res.ray_count
        for s in range(spp):
            assert_ulp(got.miss_dir[f * spp + s], res.miss_dir[s])
            assert_ulp(got.miss_thr[f * spp + s], res.miss_thr[s])
        if f == n_frames - 1:
            np.testing.assert_array_equal(np.asarray(got.seed),
                                          np.asarray(res.seed))
    assert_ulp(got.rad_sum, rad_sum, "rad_sum")
    np.testing.assert_array_equal(np.asarray(got.ray_count),
                                  np.asarray(rays))


def test_kernel_refill_row_band_and_n_valid():
    """Row-band mode + n_valid masking on the refill kernel: a banded
    render equals the matching slice of a whole-frame render, and masked
    tail frames contribute nothing."""
    from tpt.kernels.trace import pallas_trace_progressive
    scene = cornell_scene().build()
    inv_p, inv_v, _ = camera.camera_matrices(CAM, W, H)
    focal = jnp.float32(CAM.focal_length)
    ap = jnp.float32(CAM.aperture_diameter)

    whole = pallas_trace_progressive(
        scene, inv_p, inv_v, jnp.int32(0), focal, ap, width=W, height=H,
        ray_depth=3, spp=1, n_frames=2)
    band = pallas_trace_progressive(
        scene, inv_p, inv_v, jnp.int32(0), focal, ap, width=W, height=H,
        ray_depth=3, spp=1, n_frames=4, n_valid=jnp.int32(2),
        n_rows=8, row0=4)
    assert_ulp(band.rad_sum, whole.rad_sum[:, 4:12])
    assert_ulp(band.miss_dir[:2], whole.miss_dir[:, :, 4:12])
    assert not np.any(np.asarray(band.miss_thr[2:]))


def test_refill_saves_iterations():
    """The economics: live iterations ~ n_frames * E[segments] + tail,
    far below the per-frame loop's n_frames * ray_depth."""
    trace, cam, px, py = _setup(demo_scene(), CameraConfig(), (48, 7))
    n_frames, depth = 6, 13
    live = []
    trace_progressive(trace, cam, px, py, W, H, jnp.int32(0), depth, 1,
                      n_frames,
                      iter_hook=lambda i, c: live.append(bool(c)))
    n_live = sum(live)
    assert len(live) == n_frames * depth
    # E[segments] ~ 2.7 on the demo scene; allow a generous straggler tail
    assert n_live < n_frames * depth * 0.75, n_live
