"""Precomputed atmospheric-scattering sky cubemap.

Re-derivation of the reference's compute pass
(res/shaders/AtmosphericScattering/compute.glsl, itself an adaptation of the
public glsl-atmosphere single-scattering model): for every texel of each
cubemap face, march ``i_steps`` segments along the view ray through the
atmosphere, with a nested ``j_steps`` march toward the sun for optical depth,
then combine Rayleigh + Mie scattering with their phase functions.

Exact physics constants from the shader (compute.glsl:41-53): ray origin
(0, 6376e3, 0), planet radius 6371e3, atmosphere radius 6471e3, Rayleigh
k = (5.5e-6, 13.0e-6, 22.4e-6), Mie k = 21e-6, scale heights 8e3 / 1.2e3,
Mie g = 0.758.  Face cameras reproduce AtmosphericScatterer's UBO: 90-deg
FOV projection (near 0.1, far 10) and six look-at inverse views
(src/Render/AtmosphericScatterer.cs:75-89); NDC is taken at the texel
*corner* (coord/size*2-1, compute.glsl:37), quirk preserved.

Everything is vectorized over all 6*S*S texels and jitted; the marches are
``lax.fori_loop``s.  The result is differentiable w.r.t. sun intensity and
(through the env lookup) usable in the gradient path.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .camera import inverse_look_at, inverse_perspective
from .config import AtmosphereConfig
from .vecmath import dot3, normalize3

PI = np.float32(math.pi)

RAY_ORIGIN = (0.0, 6376e3, 0.0)
PLANET_RADIUS = np.float32(6371e3)
ATMOSPHERE_RADIUS = np.float32(6471e3)
K_RAYLEIGH = (5.5e-6, 13.0e-6, 22.4e-6)
K_MIE = np.float32(21e-6)
SCALE_HEIGHT_RAYLEIGH = np.float32(8e3)
SCALE_HEIGHT_MIE = np.float32(1.2e3)
MIE_G = np.float32(0.758)
SUN_DISTANCE = np.float32(149600000e3)

# Cubemap face cameras (dir, up) in GL face order
# (src/Render/AtmosphericScatterer.cs:76-86).
_FACE_CAMERAS = (
    ((1.0, 0.0, 0.0), (0.0, -1.0, 0.0)),    # +X
    ((-1.0, 0.0, 0.0), (0.0, -1.0, 0.0)),   # -X
    ((0.0, 1.0, 0.0), (0.0, 0.0, 1.0)),     # +Y
    ((0.0, -1.0, 0.0), (0.0, 0.0, -1.0)),   # -Y
    ((0.0, 0.0, 1.0), (0.0, -1.0, 0.0)),    # +Z
    ((0.0, 0.0, -1.0), (0.0, -1.0, 0.0)),   # -Z
)


def sun_position(time) -> jnp.ndarray:
    """Sun position from the time-of-day parameter
    (src/Render/AtmosphericScatterer.cs:35-45)."""
    ang = jnp.deg2rad(jnp.asarray(time, jnp.float32) * 360.0)
    return jnp.stack([jnp.float32(0.0), jnp.sin(ang), jnp.cos(ang)]) * SUN_DISTANCE


def face_directions(size: int) -> jnp.ndarray:
    """View directions for every texel of all 6 faces: f32[3, 6, S, S].

    Rows index t (the cubemap v axis), columns s; the direction math mirrors
    the shader's GetWorldSpaceRay (AtmosphericScattering/compute.glsl:166-171).
    """
    inv_proj = inverse_perspective(90.0, 1.0, near=0.1, far=10.0)
    # texel-corner NDC (compute.glsl:37)
    coords = jnp.arange(size, dtype=jnp.float32) / size * 2.0 - 1.0
    v, u = jnp.meshgrid(coords, coords, indexing="ij")   # v = row (t), u = col (s)
    ex = inv_proj[0, 0] * u
    ey = inv_proj[1, 1] * v
    ez = jnp.full_like(ex, -1.0)
    dirs = []
    for cam_dir, cam_up in _FACE_CAMERAS:
        inv_view = inverse_look_at((0.0, 0.0, 0.0), cam_dir, cam_up)
        d = (inv_view[:3, 0][:, None, None] * ex
             + inv_view[:3, 1][:, None, None] * ey
             + inv_view[:3, 2][:, None, None] * ez)
        dirs.append(normalize3(d))
    return jnp.stack(dirs, axis=1)   # [3, 6, S, S]


def _rsi(r0, rd, sr):
    """Origin-centered ray/sphere intersection (compute.glsl:58-71).
    Returns (t_near, t_far); no intersection encoded as (1e5, -1e5)."""
    a = dot3(rd, rd)
    b = 2.0 * dot3(rd, r0)
    c = dot3(r0, r0) - sr * sr
    d = b * b - 4.0 * a * c
    miss = d < 0.0
    sq = jnp.sqrt(jnp.maximum(d, 0.0))
    t0 = (-b - sq) / (2.0 * a)
    t1 = (-b + sq) / (2.0 * a)
    return (jnp.where(miss, jnp.float32(1e5), t0),
            jnp.where(miss, jnp.float32(-1e5), t1))


def atmosphere_radiance(direction, sun_pos, light_intensity,
                        i_steps: int, j_steps: int) -> jnp.ndarray:
    """Single-scattering radiance along ``direction`` (f32[3, *batch]).

    Faithful to Atmosphere() (compute.glsl:73-159) including its quirk of
    marching from the ray origin (not the atmosphere entry point)."""
    batch = direction.shape[1:]
    nb = (1,) * len(batch)
    r = normalize3(direction)
    r0 = jnp.asarray(RAY_ORIGIN, jnp.float32).reshape((3,) + nb)
    r0 = jnp.broadcast_to(r0, (3,) + tuple(batch))
    p_sun = normalize3(jnp.asarray(sun_pos, jnp.float32)).reshape((3,) + nb)
    k_rlh = jnp.asarray(K_RAYLEIGH, jnp.float32).reshape((3,) + nb)

    px, py = _rsi(r0, r, ATMOSPHERE_RADIUS)
    valid = px <= py
    py = jnp.minimum(py, _rsi(r0, r, PLANET_RADIUS)[0])
    i_step_size = (py - px) / np.float32(i_steps)

    mu = dot3(r, jnp.broadcast_to(p_sun, r.shape))
    mumu = mu * mu
    gg = MIE_G * MIE_G
    p_rlh = 3.0 / (16.0 * PI) * (1.0 + mumu)
    p_mie = (3.0 / (8.0 * PI) * ((1.0 - gg) * (mumu + 1.0))
             / (jnp.power(1.0 + gg - 2.0 * mu * MIE_G, 1.5) * (2.0 + gg)))

    def primary_body(i, carry):
        total_rlh, total_mie, i_od_rlh, i_od_mie = carry
        i_time = i.astype(jnp.float32) * i_step_size
        i_pos = r0 + r * (i_time + i_step_size * 0.5)[None]
        i_height = jnp.sqrt(dot3(i_pos, i_pos)) - PLANET_RADIUS
        od_step_rlh = jnp.exp(-i_height / SCALE_HEIGHT_RAYLEIGH) * i_step_size
        od_step_mie = jnp.exp(-i_height / SCALE_HEIGHT_MIE) * i_step_size
        i_od_rlh = i_od_rlh + od_step_rlh
        i_od_mie = i_od_mie + od_step_mie

        j_step_size = _rsi(i_pos, jnp.broadcast_to(p_sun, i_pos.shape),
                           ATMOSPHERE_RADIUS)[1] / np.float32(j_steps)

        def secondary_body(j, jcarry):
            j_od_rlh, j_od_mie = jcarry
            j_time = j.astype(jnp.float32) * j_step_size
            j_pos = i_pos + p_sun * (j_time + j_step_size * 0.5)[None]
            j_height = jnp.sqrt(dot3(j_pos, j_pos)) - PLANET_RADIUS
            return (j_od_rlh + jnp.exp(-j_height / SCALE_HEIGHT_RAYLEIGH) * j_step_size,
                    j_od_mie + jnp.exp(-j_height / SCALE_HEIGHT_MIE) * j_step_size)

        j_od_rlh, j_od_mie = jax.lax.fori_loop(
            0, j_steps, secondary_body,
            (jnp.zeros_like(i_od_rlh), jnp.zeros_like(i_od_mie)))

        attn = jnp.exp(-(K_MIE * (i_od_mie + j_od_mie)[None]
                         + k_rlh * (i_od_rlh + j_od_rlh)[None]))
        return (total_rlh + od_step_rlh[None] * attn,
                total_mie + od_step_mie[None] * attn,
                i_od_rlh, i_od_mie)

    zeros_v = jnp.zeros((3,) + tuple(batch), jnp.float32)
    zeros_s = jnp.zeros(batch, jnp.float32)
    total_rlh, total_mie, _, _ = jax.lax.fori_loop(
        0, i_steps, primary_body, (zeros_v, zeros_v, zeros_s, zeros_s))

    color = jnp.asarray(light_intensity, jnp.float32) * (
        p_rlh[None] * k_rlh * total_rlh + (p_mie * K_MIE)[None] * total_mie)
    return jnp.where(valid[None], color, 0.0)


@partial(jax.jit, static_argnames=("size", "i_steps", "j_steps"))
def _compute_cubemap(sun_pos, light_intensity, size: int, i_steps: int,
                     j_steps: int) -> jnp.ndarray:
    dirs = face_directions(size)                       # [3, 6, S, S]
    color = atmosphere_radiance(dirs, sun_pos, light_intensity, i_steps, j_steps)
    return jnp.moveaxis(color, 0, -1)                  # [6, S, S, 3]


def compute_atmosphere(cfg: AtmosphereConfig) -> jnp.ndarray:
    """Precompute the sky cubemap, f32[6, S, S, 3] (the AtmosphericScatterer
    Render() analogue — not a hot path; call on parameter change)."""
    return _compute_cubemap(sun_position(cfg.time), jnp.float32(cfg.light_intensity),
                            cfg.size, cfg.i_steps, cfg.j_steps)
