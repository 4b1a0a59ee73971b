"""Frame renderer on the Pallas path: kernel transport + XLA environment fetch.

Same public contract as tpt.reference.render_frame, so callers (CLI,
progressive loop, benchmarks) switch backends freely.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..camera import camera_matrices
from ..config import CameraConfig, RenderConfig
from ..env import pack_block_table
from ..integrator import apply_environment, apply_environment_blocked
from ..progressive import AccumulatorState
from ..scene import Scene
from .trace import pallas_trace


@partial(jax.jit, static_argnames=("width", "height", "ray_depth", "spp",
                                   "counts", "jitter"))
def render_fields(scene: Scene, env_faces, inv_proj, inv_view, view_pos, frame,
                  focal_length, aperture_diameter,
                  *, width: int, height: int, ray_depth: int, spp: int,
                  counts: Tuple[int, int] | None = None,
                  jitter: str = "corner") -> Tuple[jax.Array, jax.Array]:
    """One frame's mean radiance via the Pallas kernel.
    Returns (image f32[H, W, 3], rays i32).

    ``counts``: optional static (n_spheres, n_cuboids) — specializes the
    compiled kernel to the scene's primitive counts (fully unrolled scan,
    ~1.5x faster)."""
    del view_pos  # the kernel derives it from inv_view's translation column
    res = pallas_trace(scene, inv_proj, inv_view, frame,
                       focal_length, aperture_diameter,
                       width=width, height=height, ray_depth=ray_depth,
                       spp=spp, counts=counts, jitter=jitter)
    mean = apply_environment(res, env_faces, spp)
    return jnp.moveaxis(mean, 0, -1), jnp.sum(res.ray_count)


def render_frame(scene: Scene, env_faces, camera: CameraConfig,
                 cfg: RenderConfig, frame: int) -> Tuple[jax.Array, jax.Array]:
    inv_proj, inv_view, pos = camera_matrices(camera, cfg.width, cfg.height)
    return render_fields(
        scene, env_faces, inv_proj, inv_view, pos, jnp.int32(frame),
        jnp.float32(camera.focal_length), jnp.float32(camera.aperture_diameter),
        width=cfg.width, height=cfg.height, ray_depth=cfg.ray_depth,
        spp=cfg.spp, counts=cfg.static_counts, jitter=cfg.jitter)


@partial(jax.jit, static_argnames=("width", "height", "ray_depth", "spp",
                                   "counts", "n_frames", "jitter"),
         donate_argnames=("accum",))
def progressive_frames(accum: AccumulatorState, scene: Scene, env_table,
                       inv_proj, inv_view, frame0, focal_length,
                       aperture_diameter,
                       *, width: int, height: int, ray_depth: int, spp: int,
                       counts: Tuple[int, int] | None = None,
                       n_frames: int = 1, n_valid=None,
                       jitter: str = "corner"
                       ) -> Tuple[AccumulatorState, jax.Array]:
    """Fold ``n_frames`` consecutive progressive frames into the accumulator
    in ONE device program: Pallas trace -> blocked env fetch (one row gather,
    tpt.env.pack_block_table) -> running-mean accumulate (compute.glsl:128),
    looped with lax.scan.  The accumulator is donated (in-place update — the
    functional analogue of the reference's mutable RGBA32F accumulation
    texture, src/Render/PathTracer.cs:97-99).

    ``env_table``: pack_block_table(faces) output.
    ``n_valid``: optional traced i32 — scan steps ``k >= n_valid`` are
    identity (no accumulation, no frame advance, no ray count).  Lets a
    caller render a partial tail chunk with the SAME compiled program
    instead of paying a second Mosaic compile for the remainder size.
    Returns (new accumulator, total traced path segments i32).
    """
    if n_valid is None:
        n_valid = jnp.int32(n_frames)

    def one_frame(acc: AccumulatorState, k):
        res = pallas_trace(scene, inv_proj, inv_view, frame0 + k,
                           focal_length, aperture_diameter,
                           width=width, height=height, ray_depth=ray_depth,
                           spp=spp, counts=counts, jitter=jitter)
        mean = jnp.moveaxis(apply_environment_blocked(res, env_table, spp),
                            0, -1)
        live = k < n_valid
        w = jnp.where(live,
                      1.0 / (acc.frame.astype(jnp.float32) + 1.0), 0.0)
        image = acc.image + (mean - acc.image) * w
        return (AccumulatorState(image=image,
                                 frame=acc.frame + live.astype(jnp.int32)),
                jnp.where(live, jnp.sum(res.ray_count), 0))

    accum, rays = jax.lax.scan(one_frame, accum,
                               jnp.arange(n_frames, dtype=jnp.int32))
    return accum, jnp.sum(rays)
