"""Device-side math ops shared by the jnp oracle and the Pallas kernels."""

from .intersect import (ray_sphere, ray_cuboid, sphere_normal, cuboid_normal,
                        smallest_positive)
from .sampling import cosine_sample_hemisphere, uniform_sample_unit_circle
from .bsdf_math import fresnel_schlick, reflect3, refract3

__all__ = [
    "ray_sphere", "ray_cuboid", "sphere_normal", "cuboid_normal",
    "smallest_positive", "cosine_sample_hemisphere",
    "uniform_sample_unit_circle", "fresnel_schlick", "reflect3", "refract3",
]
