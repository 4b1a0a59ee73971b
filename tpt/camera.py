"""Camera: perspective / look-at matrices, eye rays, thin-lens depth of field.

Matrix conventions: the reference uploads OpenTK row-vector matrices into
std140 mat4s, which GLSL then reads column-major — the net effect is ordinary
column-vector math ``M @ v`` with the standard OpenGL projection/look-at
matrices.  We build those directly.

Eye ray generation mirrors the shader exactly
(reference: res/shaders/PathTracing/compute.glsl:352-357):

    rayEye = InvProjection @ (ndc.x, ndc.y, -1, 0);  rayEye.zw = (-1, 0)
    dir    = normalize((InvView @ rayEye).xyz);      origin = ViewPos

Thin-lens DoF (compute.glsl:117-121): focal point at origin + dir*focalLength,
lens offset = aperture/2 * uniform-disk sample, placed in world space via
``InvView @ (offset, 0, 1)``, direction re-aimed at the focal point.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

from .config import CameraConfig, NEAR_PLANE, FAR_PLANE


def normalize(v, axis=-1, eps=0.0):
    return v / jnp.linalg.norm(v, axis=axis, keepdims=True)


def perspective(fov_degrees, aspect, near=NEAR_PLANE, far=FAR_PLANE):
    """Standard GL perspective projection (column-vector convention).

    Equivalent to OpenTK Matrix4.CreatePerspectiveFieldOfView
    (src/MainWindow.cs:278) modulo the row/column transpose that cancels in
    the UBO upload."""
    f = 1.0 / jnp.tan(jnp.deg2rad(jnp.asarray(fov_degrees, jnp.float32)) / 2.0)
    near = jnp.float32(near)
    far = jnp.float32(far)
    z = jnp.float32(0)
    return jnp.array([
        [f / aspect, z, z, z],
        [z, f, z, z],
        [z, z, (far + near) / (near - far), 2 * far * near / (near - far)],
        [z, z, jnp.float32(-1), z],
    ], jnp.float32)


def look_at(eye, target, up):
    """Standard GL lookAt view matrix (column-vector convention)."""
    eye = jnp.asarray(eye, jnp.float32)
    f = normalize(jnp.asarray(target, jnp.float32) - eye)
    s = normalize(jnp.cross(f, jnp.asarray(up, jnp.float32)))
    u = jnp.cross(s, f)
    rot = jnp.stack([s, u, -f])                      # rows
    trans = -rot @ eye
    m = jnp.concatenate([rot, trans[:, None]], axis=1)
    return jnp.concatenate([m, jnp.array([[0, 0, 0, 1]], jnp.float32)], axis=0)


def inverse_look_at(eye, target, up):
    """Closed-form inverse of :func:`look_at`: columns are (right, up', -fwd, eye)."""
    eye = jnp.asarray(eye, jnp.float32)
    f = normalize(jnp.asarray(target, jnp.float32) - eye)
    s = normalize(jnp.cross(f, jnp.asarray(up, jnp.float32)))
    u = jnp.cross(s, f)
    rot_t = jnp.stack([s, u, -f], axis=1)            # columns
    m = jnp.concatenate([rot_t, eye[:, None]], axis=1)
    return jnp.concatenate([m, jnp.array([[0, 0, 0, 1]], jnp.float32)], axis=0)


def inverse_perspective(fov_degrees, aspect, near=NEAR_PLANE, far=FAR_PLANE):
    """Closed-form inverse of :func:`perspective`."""
    f = 1.0 / jnp.tan(jnp.deg2rad(jnp.asarray(fov_degrees, jnp.float32)) / 2.0)
    near = jnp.float32(near)
    far = jnp.float32(far)
    z = jnp.float32(0)
    d = 2 * far * near / (near - far)
    c = (far + near) / (near - far)
    return jnp.array([
        [aspect / f, z, z, z],
        [z, 1 / f, z, z],
        [z, z, z, jnp.float32(-1)],
        [z, z, 1 / d, c / d],
    ], jnp.float32)


def view_direction(look_x_degrees, look_y_degrees):
    """Yaw/pitch to view direction (reference: src/Camera.cs:21-23,49-51)."""
    lx = jnp.deg2rad(jnp.asarray(look_x_degrees, jnp.float32))
    ly = jnp.deg2rad(jnp.asarray(look_y_degrees, jnp.float32))
    return jnp.stack([jnp.cos(lx) * jnp.cos(ly), jnp.sin(ly), jnp.sin(lx) * jnp.cos(ly)])


def camera_matrices(cam: CameraConfig, width: int, height: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(inv_projection, inv_view, view_pos) for a camera config — the
    BasicData UBO analogue (reference: src/MainWindow.cs:131-132,278-279)."""
    pos = jnp.asarray(cam.position, jnp.float32)
    vdir = view_direction(cam.look_x, cam.look_y)
    inv_view = inverse_look_at(pos, pos + vdir, cam.up)
    inv_proj = inverse_perspective(cam.fov_degrees, width / float(height))
    return inv_proj, inv_view, pos


def eye_ray(inv_proj, inv_view, view_pos, ndc):
    """World-space eye ray through NDC point(s).

    ``ndc``: [..., 2]. Returns (origin [..., 3], direction [..., 3])."""
    ndc = jnp.asarray(ndc, jnp.float32)
    x, y = ndc[..., 0], ndc[..., 1]
    # inv_proj @ (x, y, -1, 0), then force zw = (-1, 0):
    ex = inv_proj[0, 0] * x + inv_proj[0, 1] * y - inv_proj[0, 2]
    ey = inv_proj[1, 0] * x + inv_proj[1, 1] * y - inv_proj[1, 2]
    ez = jnp.full_like(ex, -1.0)
    # (inv_view @ (ex, ey, -1, 0)).xyz
    d = (inv_view[:3, 0] * ex[..., None]
         + inv_view[:3, 1] * ey[..., None]
         + inv_view[:3, 2] * ez[..., None])
    d = normalize(d)
    origin = jnp.broadcast_to(view_pos, d.shape)
    return origin, d


def thin_lens(origin, direction, inv_view, focal_length, aperture_diameter, r_angle, r_radius):
    """Apply thin-lens DoF to an eye ray (compute.glsl:117-121).

    ``r_angle``, ``r_radius``: uniform [0,1) draws (in shader call order:
    angle first, then radius — UniformSampleUnitCircle, compute.glsl:309-314).
    """
    focal_point = origin + direction * jnp.asarray(focal_length, jnp.float32)
    angle = r_angle * jnp.float32(2.0 * math.pi)
    r = jnp.sqrt(r_radius)
    off_x = jnp.cos(angle) * r * (aperture_diameter * 0.5)
    off_y = jnp.sin(angle) * r * (aperture_diameter * 0.5)
    # (inv_view @ (ox, oy, 0, 1)).xyz = eye + ox*right + oy*up
    new_origin = (inv_view[:3, 3]
                  + inv_view[:3, 0] * off_x[..., None]
                  + inv_view[:3, 1] * off_y[..., None])
    new_dir = normalize(focal_point - new_origin)
    return new_origin, new_dir


def pixel_ndc(x, y, width, height, jitter_x, jitter_y):
    """NDC of pixel (x, y) with sub-pixel jitter in [0,1)^2 added to the
    pixel's lower-left corner (compute.glsl:113-114).  y is bottom-up (GL)."""
    u = (jnp.asarray(x, jnp.float32) + jitter_x) / width * 2.0 - 1.0
    v = (jnp.asarray(y, jnp.float32) + jitter_y) / height * 2.0 - 1.0
    return jnp.stack([u, v], axis=-1)
