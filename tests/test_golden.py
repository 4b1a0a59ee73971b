"""Golden-image regression gate (SURVEY.md §4 item 5).

Pins a fixed-seed 512x512 demo-scene frame against a committed artifact so
transport math, scene constants, camera, sky, and env lookup can't silently
drift between rounds.  The artifact is rendered by the XLA oracle (the
Pallas kernel is gated against the oracle at smaller sizes by
tests/test_kernel.py, and against NumPy ground truth by tests/test_oracle.py).

Regenerate after an *intentional* behavior change:
    python tests/golden/generate.py
"""

import os

import numpy as np
import jax.numpy as jnp

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "demo_512.npz")

WIDTH = HEIGHT = 512
RAY_DEPTH = 13
SPP = 1
FRAME = 0
SKY_SIZE = 32  # the GUI's smallest atmosphere resolution (Gui.cs:93-112)


def render_golden() -> np.ndarray:
    from tpt import CameraConfig, demo_scene
    from tpt.camera import camera_matrices
    from tpt.config import AtmosphereConfig
    from tpt.reference import render_fields
    from tpt.sky import compute_atmosphere

    cam = CameraConfig()
    scene = demo_scene().build()
    inv_p, inv_v, pos = camera_matrices(cam, WIDTH, HEIGHT)
    env = compute_atmosphere(AtmosphereConfig(size=SKY_SIZE))
    img, rays = render_fields(
        scene, env, inv_p, inv_v, pos, jnp.int32(FRAME),
        jnp.float32(cam.focal_length), jnp.float32(cam.aperture_diameter),
        width=WIDTH, height=HEIGHT, ray_depth=RAY_DEPTH, spp=SPP)
    assert int(rays) > 0
    return np.asarray(img)


def test_golden_artifact_is_tracked():
    # the gate is worthless if each clone regenerates its own golden
    # (.gitignore's '*.npz' once shadowed it — guard against regression)
    import subprocess
    out = subprocess.run(
        ["git", "ls-files", "--error-unmatch", GOLDEN_PATH],
        capture_output=True, cwd=os.path.dirname(GOLDEN_PATH))
    assert out.returncode == 0, "tests/golden/demo_512.npz is not in git"


def test_golden_demo_512():
    want = np.load(GOLDEN_PATH)["image"].astype(np.float32)
    got = render_golden()
    assert got.shape == want.shape
    # f16 storage quantization ~1e-3 relative; allow small cross-version
    # XLA drift on top.  Radiance values span [0, ~5].
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=2e-3)
