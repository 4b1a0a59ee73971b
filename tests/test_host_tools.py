"""Host-side tooling tests: camera controller physics, picking, CLI."""

import os
import subprocess
import sys

import numpy as np

from tpt.camera_controller import CameraState, process_inputs
from tpt.config import CameraConfig
from tpt.camera import camera_matrices
from tpt.pick import pick_pixel, pick_ray
from tpt.scene import demo_scene, SphereObject


def test_controller_yaw_pitch_clamp():
    s = CameraState.from_config(CameraConfig())
    s2, changed = process_inputs(s, 0.016, mouse_delta=(100.0, -30.0))
    assert changed
    assert s2.look_x == s.look_x + 100 * 0.1
    assert s2.look_y == s.look_y + 30 * 0.1
    # pitch clamp at +-90 (src/Camera.cs:46-47)
    s3 = s2
    for _ in range(200):
        s3, _ = process_inputs(s3, 0.016, mouse_delta=(0.0, -100.0))
    assert s3.look_y == 89.999


def test_controller_motion_and_damping():
    cam = CameraConfig(position=(0, 0, 0), look_x=-90.0, look_y=0.0)
    s = CameraState.from_config(cam)
    s1, changed = process_inputs(s, 0.1, keys=["w"])
    assert changed
    assert s1.position[2] < 0  # moved along -z (view dir)
    # released keys: velocity decays toward zero
    s2 = s1
    for _ in range(200):
        s2, _ = process_inputs(s2, 0.1)
    np.testing.assert_allclose(s2.velocity, 0.0, atol=1e-3)
    # idle controller reports no change once velocity is dead
    s3, changed = process_inputs(s2, 0.1)
    assert not changed


def test_controller_shift_faster():
    cam = CameraConfig(position=(0, 0, 0), look_x=-90.0, look_y=0.0)
    s = CameraState.from_config(cam)
    plain, _ = process_inputs(s, 0.1, keys=["w"])
    fast, _ = process_inputs(s, 0.1, keys=["w", "shift"])
    assert abs(fast.position[2]) > abs(plain.position[2]) * 3


def test_pick_center_of_demo_scene():
    builder = demo_scene()
    cam = CameraConfig()
    inv_p, inv_v, pos = camera_matrices(cam, 832, 832)
    obj, t1, t2 = pick_pixel(builder, inv_p, inv_v, pos, 416, 416, 832, 832)
    assert obj is not None
    assert t2 > 0 and t1 < t2


def test_pick_ray_nearest_semantics():
    builder = demo_scene()
    # ray straight down the sphere-grid axis from the camera start
    obj, t1, t2 = pick_ray(builder, (-17.14, 3.53, -8.62),
                           np.array([0.846, 0.014, -0.533], np.float32))
    assert obj is not None


def _run_cli(*args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run([sys.executable, "-m", "tpt.cli", *args],
                          capture_output=True, text=True, env=env,
                          cwd=os.path.dirname(os.path.dirname(__file__)))


def test_cli_pick():
    r = _run_cli("pick", "--x", "416", "--y", "416")
    assert r.returncode == 0, r.stderr
    assert "picked:" in r.stdout


def test_cli_render_smoke(tmp_path):
    out = str(tmp_path / "o.png")
    r = _run_cli("render", "--width", "24", "--height", "16", "--frames", "2",
                 "--env", "constant", "--scene", "cornell", "--ray-depth", "3",
                 "--backend", "oracle", "--platform", "cpu", "--out", out)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(out)
    data = open(out, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"


def test_cli_render_checkpoint_resume(tmp_path):
    out = str(tmp_path / "o.png")
    ckpt = str(tmp_path / "c.npz")
    r = _run_cli("render", "--width", "16", "--height", "16", "--frames", "2",
                 "--env", "constant", "--scene", "cornell", "--ray-depth", "2",
                 "--backend", "oracle", "--platform", "cpu", "--out", out,
                 "--checkpoint", ckpt)
    assert r.returncode == 0, r.stderr
    r2 = _run_cli("render", "--width", "16", "--height", "16", "--frames", "2",
                  "--env", "constant", "--scene", "cornell", "--ray-depth", "2",
                  "--backend", "oracle", "--platform", "cpu", "--out", out,
                  "--checkpoint", ckpt, "--resume", ckpt)
    assert r2.returncode == 0, r2.stderr
    assert "resumed" in r2.stdout
    import numpy as np
    assert int(np.load(ckpt)["frame"]) == 4


def test_cli_render_skybox_env(tmp_path):
    # --env skybox renders under the procedural default skybox
    # (tpt.env.default_skybox) — the no-asset analogue of the reference's
    # bundled 6-PNG environment map (src/MainWindow.cs:177-187)
    out = str(tmp_path / "sky.png")
    r = _run_cli("render", "--width", "24", "--height", "16", "--frames", "1",
                 "--env", "skybox", "--scene", "cornell", "--ray-depth", "2",
                 "--backend", "oracle", "--platform", "cpu", "--out", out)
    assert r.returncode == 0, r.stderr
    assert open(out, "rb").read()[:8] == b"\x89PNG\r\n\x1a\n"
