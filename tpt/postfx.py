"""Post-processing: ACES filmic tonemap + linear-to-sRGB encode.

Exact constants from the reference post pass
(res/shaders/PostProcessing/fragment.glsl:28-44): Narkowicz ACES fit with
a=2.51 b=0.03 c=2.43 d=0.59 e=0.14, then gamma-2.4 sRGB encode with the
0.0031308 linear-segment split.
"""

from __future__ import annotations

import jax.numpy as jnp


def aces_film(x):
    x = jnp.asarray(x, jnp.float32)
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def linear_to_srgb(rgb, gamma: float = 2.4):
    rgb = jnp.asarray(rgb, jnp.float32)
    return jnp.where(rgb < 0.0031308,
                     rgb * 12.92,
                     jnp.power(rgb, 1.0 / gamma) * 1.055 - 0.055)


def post_process(*hdr_layers):
    """Sum input layers, tonemap, encode — the full post pass
    (fragment.glsl:17-26). Returns f32 in [0, 1]."""
    color = sum(jnp.asarray(l, jnp.float32) for l in hdr_layers)
    return linear_to_srgb(aces_film(color))


def to_uint8(srgb):
    """Quantize [0,1] sRGB to uint8 (the RGBA8 result texture analogue)."""
    return jnp.clip(jnp.round(jnp.asarray(srgb) * 255.0), 0, 255).astype(jnp.uint8)
