"""Progressive accumulation state.

The reference keeps an RGBA32F accumulation texture and blends each new
frame's mean radiance with ``mix(last, new, 1/(frame+1))``
(res/shaders/PathTracing/compute.glsl:126-129), resetting the frame counter
whenever camera/scene/params change (src/Render/PathTracer.cs:131-140).
Here the accumulator is an explicit pytree — trivially checkpointable and
donation-friendly.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AccumulatorState:
    image: jax.Array   # f32[H, W, 3] linear HDR running mean (GL row order: y up)
    frame: jax.Array   # i32 scalar: frames accumulated so far


def init_accumulator(height: int, width: int) -> AccumulatorState:
    return AccumulatorState(
        image=jnp.zeros((height, width, 3), jnp.float32),
        frame=jnp.int32(0),
    )


def reset(state: AccumulatorState) -> AccumulatorState:
    """PathTracer.ResetRenderer: zero the frame counter; the image is
    overwritten by the next frame's mix with weight 1/(0+1) = 1."""
    return AccumulatorState(image=state.image, frame=jnp.int32(0))


@functools.partial(jax.jit, donate_argnums=(0,))
def _accumulate(state: AccumulatorState, frame_mean) -> AccumulatorState:
    # The old accumulator is donated: XLA updates the image in place instead
    # of allocating a fresh H*W*3 buffer every frame — the functional
    # equivalent of the reference's mutable RGBA32F accumulation texture
    # (src/Render/PathTracer.cs:97-99).  On backends without donation
    # support (CPU) JAX silently falls back to a copy.
    w = 1.0 / (state.frame.astype(jnp.float32) + 1.0)
    image = state.image + (frame_mean - state.image) * w
    return AccumulatorState(image=image, frame=state.frame + 1)


def accumulate(state: AccumulatorState, frame_mean) -> AccumulatorState:
    """Fold one frame's per-pixel mean radiance into the running mean:
    ``mix(last, new, 1/(frame+1))`` (compute.glsl:128).

    The input ``state``'s buffers are donated — do not reuse it afterwards.
    """
    return _accumulate(state, frame_mean)


def samples_per_pixel(state: AccumulatorState, spp: int):
    """Total accumulated samples = frames * spp
    (reference: src/Render/PathTracer.cs:112)."""
    return state.frame * spp


def save_checkpoint(path: str, state: AccumulatorState, seed_frame_offset: int = 0):
    """Persist the render state (the reference discards it on reset/resize;
    we make renders resumable)."""
    np.savez(path, image=np.asarray(state.image), frame=int(state.frame),
             seed_frame_offset=seed_frame_offset)


def load_checkpoint(path: str) -> AccumulatorState:
    data = np.load(path)
    return AccumulatorState(image=jnp.asarray(data["image"]),
                            frame=jnp.int32(int(data["frame"])))
