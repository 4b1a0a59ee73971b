"""ACES + gamma tests against hand-computed shader values."""

import numpy as np
import jax.numpy as jnp

from tpt import postfx


def aces_scalar(x):
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return np.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def srgb_scalar(x):
    if x < 0.0031308:
        return x * 12.92
    return x ** (1 / 2.4) * 1.055 - 0.055


def test_aces_matches_scalar():
    xs = np.linspace(0, 10, 101, dtype=np.float32)
    got = np.asarray(postfx.aces_film(jnp.asarray(xs)))
    want = aces_scalar(xs)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_aces_anchors():
    # f(0) = 0; large input saturates at 1
    assert float(postfx.aces_film(jnp.float32(0.0))) == 0.0
    assert float(postfx.aces_film(jnp.float32(100.0))) == 1.0


def test_srgb_matches_scalar():
    xs = np.linspace(0, 1, 101, dtype=np.float32)
    got = np.asarray(postfx.linear_to_srgb(jnp.asarray(xs)))
    want = np.array([srgb_scalar(float(x)) for x in xs], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_srgb_linear_segment_continuity():
    lo = float(postfx.linear_to_srgb(jnp.float32(0.0031307)))
    hi = float(postfx.linear_to_srgb(jnp.float32(0.0031309)))
    assert abs(hi - lo) < 1e-4


def test_post_process_sums_layers():
    a = jnp.full((2, 2, 3), 0.25, jnp.float32)
    b = jnp.full((2, 2, 3), 0.25, jnp.float32)
    combined = np.asarray(postfx.post_process(a, b))
    single = np.asarray(postfx.post_process(jnp.full((2, 2, 3), 0.5, jnp.float32)))
    np.testing.assert_allclose(combined, single, rtol=1e-6)


def test_to_uint8():
    img = jnp.array([0.0, 0.5, 1.0, 2.0])
    out = np.asarray(postfx.to_uint8(img))
    np.testing.assert_array_equal(out, [0, 128, 255, 255])
