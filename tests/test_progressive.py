"""Accumulation recurrence + reset semantics (src/Render/PathTracer.cs:131-140,
compute.glsl:126-129) and donation behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpt.progressive import (AccumulatorState, accumulate, init_accumulator,
                             load_checkpoint, reset, samples_per_pixel,
                             save_checkpoint)


def test_running_mean_recurrence():
    """mix(last, new, 1/(frame+1)) over N frames == arithmetic mean."""
    rng = np.random.default_rng(0)
    frames = [rng.random((4, 5, 3)).astype(np.float32) for _ in range(7)]
    acc = init_accumulator(4, 5)
    for f in frames:
        acc = accumulate(acc, jnp.asarray(f))
    np.testing.assert_allclose(np.asarray(acc.image),
                               np.mean(frames, axis=0), rtol=1e-5)
    assert int(acc.frame) == 7


def test_first_frame_overwrites():
    """Weight 1/(0+1)=1: frame 0 fully replaces whatever the image held."""
    acc = AccumulatorState(image=jnp.full((2, 2, 3), 123.0), frame=jnp.int32(0))
    new = jnp.full((2, 2, 3), 7.0)
    acc = accumulate(acc, new)
    np.testing.assert_allclose(np.asarray(acc.image), 7.0)


def test_reset_zeroes_counter_keeps_image():
    """ResetRenderer zeroes only the frame counter (PathTracer.cs:137-140);
    the stale image is then overwritten by the next accumulate."""
    acc = init_accumulator(2, 2)
    acc = accumulate(acc, jnp.ones((2, 2, 3)))
    acc = reset(acc)
    assert int(acc.frame) == 0
    acc = accumulate(acc, jnp.full((2, 2, 3), 5.0))
    np.testing.assert_allclose(np.asarray(acc.image), 5.0)
    assert int(acc.frame) == 1


def test_samples_per_pixel():
    acc = init_accumulator(1, 1)
    for _ in range(3):
        acc = accumulate(acc, jnp.zeros((1, 1, 3)))
    assert int(samples_per_pixel(acc, spp=4)) == 12


def test_accumulate_donates_input_buffer():
    """The old accumulator is donated to the update step: it must not be
    reused.  On donating backends the buffer is invalidated; everywhere the
    arrays_equal contract of the new state still holds."""
    acc = init_accumulator(8, 8)
    old_image = acc.image
    acc2 = accumulate(acc, jnp.ones((8, 8, 3)))
    np.testing.assert_allclose(np.asarray(acc2.image), 1.0)
    if jax.default_backend() != "cpu":
        assert old_image.is_deleted()


def test_progressive_frames_n_valid_masks_tail():
    """A partial tail chunk via n_valid must equal rendering exactly that
    many frames — same accumulator, same frame counter, same ray count —
    so the CLI reuses one compiled program for any --frames."""
    from tpt import CameraConfig, cornell_scene
    from tpt.camera import camera_matrices
    from tpt.env import constant_environment, pack_block_table
    from tpt.kernels.render import progressive_frames

    W = H = 16
    scene = cornell_scene().build()
    cam = CameraConfig(position=(0.0, 0.5, 2.0), look_x=-90.0, look_y=-5.0,
                       focal_length=8.0, aperture_diameter=0.1)
    inv_p, inv_v, _ = camera_matrices(cam, W, H)
    env_t = pack_block_table(constant_environment((0.4, 0.5, 0.6)))
    kw = dict(width=W, height=H, ray_depth=3, spp=1)

    a = init_accumulator(H, W)
    a, rays_a = progressive_frames(a, scene, env_t, inv_p, inv_v,
                                   jnp.int32(0), jnp.float32(8.0),
                                   jnp.float32(0.1), n_frames=3, **kw)
    b = init_accumulator(H, W)
    b, rays_b = progressive_frames(b, scene, env_t, inv_p, inv_v,
                                   jnp.int32(0), jnp.float32(8.0),
                                   jnp.float32(0.1), n_frames=5,
                                   n_valid=jnp.int32(3), **kw)
    np.testing.assert_allclose(np.asarray(b.image), np.asarray(a.image),
                               rtol=1e-6, atol=1e-6)
    assert int(b.frame) == int(a.frame) == 3
    assert int(rays_b) == int(rays_a)


def test_train_step_kernel_requires_counts():
    from tpt.config import RenderConfig
    from tpt.parallel import make_mesh, make_train_step
    mesh = make_mesh(dp=1, sp=1,
                     devices=np.asarray(jax.devices()[:1]))
    with pytest.raises(ValueError, match="requires explicit counts"):
        make_train_step(mesh, RenderConfig(width=16, height=8))


def test_checkpoint_roundtrip(tmp_path):
    acc = init_accumulator(3, 4)
    acc = accumulate(acc, jnp.arange(36, dtype=jnp.float32).reshape(3, 4, 3))
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(p, acc)
    back = load_checkpoint(p)
    np.testing.assert_array_equal(np.asarray(back.image), np.asarray(acc.image))
    assert int(back.frame) == int(acc.frame)
