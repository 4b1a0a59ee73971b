"""Both sub-pixel jitter conventions of the reference.

The reference ships TWO path-tracing kernels behind `#if USE_COMPUTE`
(PathTracer.cs:1 defines _USE_COMPUTE — note the underscore — so the
FRAGMENT variant is the app's active default):

  * compute.glsl:113-114  — corner:  ndc = (p + rand01)/size * 2 - 1
  * fragCompute.glsl:115-116 — center: ndc = ((p+0.5)/size + (rand01-0.5)/size)*2 - 1

These are algebraically identical ((p + 0.5 + rand - 0.5) == (p + rand));
the RNG draw sites are also identical, so the two variants produce the same
Monte-Carlo estimator and differ only in floating-point rounding order.
These tests pin that analysis down numerically:

  1. the raw NDC values differ at ulp level only;
  2. full renders under the two modes agree to float-rounding tolerance
     frame-for-frame (not just in the mean);
  3. the Pallas kernel honors the mode switch and matches the oracle in
     both modes.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tpt import CameraConfig, cornell_scene
from tpt.camera import camera_matrices
from tpt.env import constant_environment
from tpt.reference import render_fields


W = H = 32
DEPTH, SPP = 3, 2
ENV = constant_environment((0.4, 0.5, 0.7))


def _render(jitter, frame=0):
    cam = CameraConfig(position=(0.0, 0.5, 2.0), look_x=-90.0, look_y=-5.0,
                       focal_length=8.0, aperture_diameter=0.05)
    scene = cornell_scene().build()
    inv_p, inv_v, pos = camera_matrices(cam, W, H)
    img, _ = render_fields(scene, ENV, inv_p, inv_v, pos, jnp.int32(frame),
                           jnp.float32(cam.focal_length),
                           jnp.float32(cam.aperture_diameter),
                           width=W, height=H, ray_depth=DEPTH, spp=SPP,
                           jitter=jitter)
    return np.asarray(img)


def test_ndc_delta_is_ulp_level():
    # reproduce both arithmetic orders on a dense jitter sweep and measure
    # the worst-case NDC delta: it must be ~1 ulp of NDC (|ndc| <= 1), far
    # below any pixel footprint (2/W per pixel)
    p = np.arange(0, 1024, dtype=np.float32)
    size = np.float32(832)
    for r in np.linspace(0, 0.999, 7).astype(np.float32):
        corner = (p + r) / size * np.float32(2.0) - np.float32(1.0)
        center = ((p + np.float32(0.5)) / size
                  + (r - np.float32(0.5)) / size) * np.float32(2.0) - np.float32(1.0)
        delta = np.abs(corner - center).max()
        assert delta <= 4 * np.finfo(np.float32).eps, delta


def test_modes_agree_frame_for_frame():
    a = _render("corner")
    b = _render("center")
    # same RNG draws, same estimator; only rounding differs.  A sub-ulp ray
    # direction change can flip a discrete decision (closest-hit, lobe
    # choice) on a measure-zero set of samples; none occur at this size.
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_kernel_honors_center_mode():
    from tpt.integrator import apply_environment
    from tpt.kernels.trace import pallas_trace

    cam = CameraConfig(position=(0.0, 0.5, 2.0), look_x=-90.0, look_y=-5.0,
                       focal_length=8.0, aperture_diameter=0.05)
    scene = cornell_scene().build()
    inv_p, inv_v, _ = camera_matrices(cam, W, H)
    res = pallas_trace(scene, inv_p, inv_v, jnp.int32(0),
                       jnp.float32(cam.focal_length),
                       jnp.float32(cam.aperture_diameter),
                       width=W, height=H, ray_depth=DEPTH, spp=SPP,
                       jitter="center")
    img = np.moveaxis(np.asarray(apply_environment(res, ENV, SPP)), 0, -1)
    want = _render("center")
    np.testing.assert_allclose(img, want, rtol=1e-5, atol=1e-5)
    # and the mode switch is not a no-op in the RNG-stream sense: bitwise
    # different from the kernel's corner mode somewhere (rounding order)
    res_c = pallas_trace(scene, inv_p, inv_v, jnp.int32(0),
                         jnp.float32(cam.focal_length),
                         jnp.float32(cam.aperture_diameter),
                         width=W, height=H, ray_depth=DEPTH, spp=SPP,
                         jitter="corner")
    img_c = np.moveaxis(np.asarray(apply_environment(res_c, ENV, SPP)), 0, -1)
    diff = np.abs(img - img_c).max()
    assert diff < 2e-4
    # ...and strictly nonzero: if the kernel silently ignored the jitter
    # flag, corner and center renders would be bitwise identical
    assert diff > 0.0
