"""Vec3 helpers on leading-axis-3 arrays.

Vectors are ``f32[3, *batch]`` — the component axis leads so that each
component is a contiguous, TPU-tile-friendly array (the batch axes map onto
VPU lanes; the 3-axis becomes three vector registers).  Every function here
works for any batch shape, including scalars, and inside Pallas kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_jvp
def sqrt_clamped_grad(x):
    """sqrt with a bit-identical primal but a derivative clamped near 0.

    sqrt'(0) is infinite; at measure-zero points (grazing intersections,
    the refract TIR boundary) the transpose multiplies that infinity by a
    zero cotangent and poisons whole gradient tables with NaN.  The clamp
    0.5/sqrt(max(x, 1e-12)) only changes the derivative where it was
    unusable anyway — the standard differentiable-renderer hygiene."""
    return jnp.sqrt(x)


@sqrt_clamped_grad.defjvp
def _sqrt_clamped_grad_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    primal = jnp.sqrt(x)
    return primal, t * (0.5 / jnp.sqrt(jnp.maximum(x, 1e-12)))


def vec3(x, y, z):
    x = jnp.asarray(x, jnp.float32)
    return jnp.stack([x, jnp.broadcast_to(jnp.asarray(y, jnp.float32), x.shape),
                      jnp.broadcast_to(jnp.asarray(z, jnp.float32), x.shape)])


def splat3(v, batch_shape):
    """Broadcast a length-3 constant to f32[3, *batch]."""
    v = jnp.asarray(v, jnp.float32).reshape((3,) + (1,) * len(batch_shape))
    return jnp.broadcast_to(v, (3,) + tuple(batch_shape))


def bcast3(s):
    """[*batch] -> f32[3, *batch] as an explicit stack.

    Bitwise-identical to ``s[None]`` broadcasting in arithmetic, but its AD
    transpose is three 2-D adds instead of an axis-0 ``multi_reduction``
    over a [3, sublane, lane] vector — which Mosaic cannot lower.  Use it
    for every vec3-times-scalar-field product on the differentiable path."""
    return jnp.stack([s, s, s])


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
    return a / bcast3(jnp.sqrt(d))


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
