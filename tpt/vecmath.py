"""Vec3 helpers on leading-axis-3 arrays.

Vectors are ``f32[3, *batch]`` — the component axis leads so that each
component is a contiguous, TPU-tile-friendly array (the batch axes map onto
VPU lanes; the 3-axis becomes three vector registers).  Every function here
works for any batch shape, including scalars, and inside Pallas kernels.
"""

from __future__ import annotations

import jax.numpy as jnp


def vec3(x, y, z):
    x = jnp.asarray(x, jnp.float32)
    return jnp.stack([x, jnp.broadcast_to(jnp.asarray(y, jnp.float32), x.shape),
                      jnp.broadcast_to(jnp.asarray(z, jnp.float32), x.shape)])


def splat3(v, batch_shape):
    """Broadcast a length-3 constant to f32[3, *batch]."""
    v = jnp.asarray(v, jnp.float32).reshape((3,) + (1,) * len(batch_shape))
    return jnp.broadcast_to(v, (3,) + tuple(batch_shape))


def dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross3(a, b):
    return jnp.stack([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ])


def length3(a):
    return jnp.sqrt(dot3(a, a))


def normalize3(a, eps=None):
    """Unit vector. With ``eps`` set, guards the degenerate zero-vector case
    by flooring the squared length (documented deviation from GLSL's UB)."""
    d = dot3(a, a)
    if eps is not None:
        d = jnp.maximum(d, eps)
    return a / jnp.sqrt(d)


def where3(cond, a, b):
    return jnp.where(cond[None], a, b)


def max3(a):
    return jnp.maximum(a[0], jnp.maximum(a[1], a[2]))


def min3(a):
    return jnp.minimum(a[0], jnp.minimum(a[1], a[2]))


def mix3(a, b, t):
    """GLSL mix: a*(1-t) + b*t, computed exactly as a + (b-a)*t."""
    return a + (b - a) * t


def mix(a, b, t):
    return a + (b - a) * t
