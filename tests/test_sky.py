"""Atmospheric scattering tests: scalar ground truth + behavioral checks."""

import math

import numpy as np
import jax.numpy as jnp

from tpt import sky
from tpt.config import AtmosphereConfig
from tpt.env import sample_environment


def numpy_atmosphere(r, r0, p_sun, i_sun, i_steps, j_steps):
    """Straight scalar transcription of compute.glsl:73-159."""
    r = np.asarray(r, np.float64)
    r = r / np.linalg.norm(r)
    r0 = np.asarray(r0, np.float64)
    p_sun = np.asarray(p_sun, np.float64)
    p_sun = p_sun / np.linalg.norm(p_sun)
    r_planet, r_atmos = 6371e3, 6471e3
    k_rlh = np.array([5.5e-6, 13.0e-6, 22.4e-6])
    k_mie, sh_rlh, sh_mie, g = 21e-6, 8e3, 1.2e3, 0.758

    def rsi(o, d, sr):
        a = d @ d
        b = 2.0 * (d @ o)
        c = o @ o - sr * sr
        disc = b * b - 4 * a * c
        if disc < 0:
            return 1e5, -1e5
        sq = math.sqrt(disc)
        return (-b - sq) / (2 * a), (-b + sq) / (2 * a)

    px, py = rsi(r0, r, r_atmos)
    if px > py:
        return np.zeros(3)
    py = min(py, rsi(r0, r, r_planet)[0])
    i_step = (py - px) / i_steps
    i_time = 0.0
    total_rlh = np.zeros(3)
    total_mie = np.zeros(3)
    i_od_rlh = i_od_mie = 0.0
    mu = r @ p_sun
    mumu, gg = mu * mu, g * g
    p_rlh = 3.0 / (16.0 * math.pi) * (1.0 + mumu)
    p_mie = (3.0 / (8.0 * math.pi) * ((1.0 - gg) * (mumu + 1.0))
             / ((1.0 + gg - 2.0 * mu * g) ** 1.5 * (2.0 + gg)))
    for _ in range(i_steps):
        i_pos = r0 + r * (i_time + i_step * 0.5)
        i_h = np.linalg.norm(i_pos) - r_planet
        od_rlh = math.exp(-i_h / sh_rlh) * i_step
        od_mie = math.exp(-i_h / sh_mie) * i_step
        i_od_rlh += od_rlh
        i_od_mie += od_mie
        j_step = rsi(i_pos, p_sun, r_atmos)[1] / j_steps
        j_time = 0.0
        j_od_rlh = j_od_mie = 0.0
        for _ in range(j_steps):
            j_pos = i_pos + p_sun * (j_time + j_step * 0.5)
            j_h = np.linalg.norm(j_pos) - r_planet
            j_od_rlh += math.exp(-j_h / sh_rlh) * j_step
            j_od_mie += math.exp(-j_h / sh_mie) * j_step
            j_time += j_step
        attn = np.exp(-(k_mie * (i_od_mie + j_od_mie) + k_rlh * (i_od_rlh + j_od_rlh)))
        total_rlh += od_rlh * attn
        total_mie += od_mie * attn
        i_time += i_step
    return i_sun * (p_rlh * k_rlh * total_rlh + p_mie * k_mie * total_mie)


def test_scalar_parity():
    sun = np.asarray(sky.sun_position(0.4))
    dirs = np.array([
        [0.0, 1.0, 0.0],      # zenith
        [0.3, 0.2, -1.0],
        [1.0, 0.05, 0.0],     # near horizon
        [0.0, -0.3, 1.0],     # below horizon (hits planet)
    ], np.float32)
    got = np.asarray(sky.atmosphere_radiance(
        jnp.asarray(dirs.T), jnp.asarray(sun), jnp.float32(15.0), 16, 8)).T
    for i, d in enumerate(dirs):
        want = numpy_atmosphere(d, (0, 6376e3, 0), sun, 15.0, 16, 8)
        np.testing.assert_allclose(got[i], want, rtol=2e-3, atol=1e-5)


def test_sky_is_blue_at_noon():
    cfg = AtmosphereConfig(size=16, i_steps=12, j_steps=6, time=0.25)  # sun at +y
    faces = sky.compute_atmosphere(cfg)
    # zenith (+y face center): Rayleigh makes blue dominate red
    zenith = np.asarray(faces)[2, 8, 8]
    assert zenith[2] > zenith[0] > 0.0


def test_sun_direction_brighter_than_away():
    """Mie forward scattering tips the balance toward the sun (Rayleigh alone
    is symmetric in mu, so the margin is modest in this single-scatter model)."""
    t = 0.35
    cfg = AtmosphereConfig(size=32, i_steps=16, j_steps=8, time=t)
    faces = sky.compute_atmosphere(cfg)
    sun_dir = np.array(sky.sun_position(t))
    sun_dir = sun_dir / np.linalg.norm(sun_dir)
    toward = np.asarray(sample_environment(faces, jnp.asarray(sun_dir, jnp.float32)))
    away = np.asarray(sample_environment(faces, jnp.asarray(-sun_dir, jnp.float32)))
    assert toward.sum() > away.sum()


def test_radiance_scales_with_intensity_and_is_differentiable():
    import jax

    d = jnp.asarray(np.array([[0.2], [0.9], [-0.1]], np.float32))
    sun = sky.sun_position(0.3)

    def lum(intensity):
        return jnp.sum(sky.atmosphere_radiance(d, sun, intensity, 8, 4))

    l1 = float(lum(jnp.float32(15.0)))
    l2 = float(lum(jnp.float32(30.0)))
    np.testing.assert_allclose(l2, 2 * l1, rtol=1e-5)  # linear in sun intensity
    g = float(jax.grad(lum)(jnp.float32(15.0)))
    assert np.isfinite(g) and g > 0.0


def test_cubemap_lookup_roundtrip():
    """Sampling the cubemap in a face-texel direction returns ~that texel."""
    cfg = AtmosphereConfig(size=32, i_steps=8, j_steps=4, time=0.3)
    faces = sky.compute_atmosphere(cfg)
    dirs = sky.face_directions(32)   # texel-corner directions [3, 6, S, S]
    f, r, c = 4, 20, 11
    d = np.asarray(dirs[:, f, r, c])
    got = np.asarray(sample_environment(faces, jnp.asarray(d)))
    want = np.asarray(faces)[f, r, c]
    # corner-vs-center sampling offsets by half a texel: compare loosely
    neighborhood = np.asarray(faces)[f, max(r - 1, 0):r + 2, max(c - 1, 0):c + 2]
    lo, hi = neighborhood.min(axis=(0, 1)), neighborhood.max(axis=(0, 1))
    assert (got >= lo - 1e-5).all() and (got <= hi + 1e-5).all(), (got, want)
