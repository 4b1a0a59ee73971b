"""Real-TPU Mosaic smoke of the in-kernel backward (GATE.md item 4).

The interpret-mode grad tests (tests/test_trace_grad.py) validate the
MATH of the reverse sweep but not its Mosaic LOWERING — round 2 shipped a
backward that passed every interpret-mode test and failed to trace/lower
on hardware.  This test compiles and runs the backward kernel on the real
TPU in a subprocess (the suite's conftest pins this process to a virtual
CPU mesh, so the smoke must escape it) and checks the gradient against the
same program run in interpret mode in-process.

Skipped when no TPU is reachable (subprocess backend probe).  With the
persistent compilation cache warm this takes seconds; the first run pays
the Mosaic compile.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SMOKE = r"""
import json, sys
sys.path.insert(0, {repo!r})
from tpt.utils import enable_persistent_cache
enable_persistent_cache()
import numpy as np, jax, jax.numpy as jnp
if jax.default_backend() != "tpu":
    print(json.dumps({{"skip": jax.default_backend()}})); raise SystemExit(0)
import dataclasses
from tpt import camera
from tpt.config import CameraConfig
from tpt.env import constant_environment, pack_block_table
from tpt.integrator import apply_environment_blocked
from tpt.kernels.trace_grad import trace_diff
from tpt.scene import cornell_scene

W, H, DEPTH, SPP = 32, 32, 3, 1
scene = cornell_scene().build()
cc = CameraConfig(position=(0.0, 0.5, 2.0), look_x=-90.0, look_y=-5.0,
                  focal_length=8.0, aperture_diameter=0.1)
inv_p, inv_v, _ = camera.camera_matrices(cc, W, H)
env_t = pack_block_table(constant_environment((0.3, 0.45, 0.6)))

def loss(sm):
    s = dataclasses.replace(scene, sphere_material=sm)
    res = trace_diff(s, inv_p, inv_v, jnp.int32(0), jnp.float32(8.0),
                     jnp.float32(0.1), jnp.int32(0), W, H, DEPTH, SPP, (4, 0))
    return jnp.sum(apply_environment_blocked(res, env_t, SPP) ** 2)

g = jax.jit(jax.grad(loss))(scene.sphere_material)
print(json.dumps({{"grad": np.asarray(g).tolist()}}))
"""


def _sub_env():
    return {k: v for k, v in os.environ.items()
            if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}


def _probe_backend(timeout=90):
    """Cheap liveness probe: a hung device tunnel must skip, not stall the
    suite for the full smoke timeout."""
    code = ("import jax, jax.numpy as jnp; x=(jnp.arange(4.0)*2).sum(); "
            "print(jax.default_backend())")
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=timeout, env=_sub_env(), cwd=REPO)
    except subprocess.TimeoutExpired:
        return None
    lines = out.stdout.strip().splitlines()
    return lines[-1] if lines else None


def _run_smoke(timeout=1200):
    return subprocess.run(
        [sys.executable, "-c", SMOKE.format(repo=REPO)],
        capture_output=True, text=True, timeout=timeout, env=_sub_env(),
        cwd=REPO)


@pytest.mark.skipif(os.environ.get("TPT_SKIP_TPU_SMOKE") == "1",
                    reason="TPT_SKIP_TPU_SMOKE=1")
def test_backward_kernel_compiles_and_matches_on_tpu():
    backend = _probe_backend()
    if backend != "tpu":
        pytest.skip(f"no live TPU (probe: {backend})")
    out = _run_smoke()
    last = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    try:
        payload = json.loads(last)
    except (json.JSONDecodeError, IndexError):
        pytest.fail(f"TPU smoke subprocess failed:\n"
                    f"stdout tail: {out.stdout[-2000:]}\n"
                    f"stderr tail: {out.stderr[-2000:]}")
    if "skip" in payload:
        pytest.skip(f"no TPU reachable (backend={payload['skip']})")
    got = np.asarray(payload["grad"], np.float32)
    assert np.isfinite(got).all()
    assert np.abs(got).max() > 0, "all-zero gradient on TPU"

    # compare against interpret mode in-process (conftest pins CPU)
    import dataclasses
    import jax
    import jax.numpy as jnp
    from tpt import camera
    from tpt.config import CameraConfig
    from tpt.env import constant_environment, pack_block_table
    from tpt.integrator import apply_environment_blocked
    from tpt.kernels.trace_grad import trace_diff
    from tpt.scene import cornell_scene

    W, H, DEPTH, SPP = 32, 32, 3, 1
    scene = cornell_scene().build()
    cc = CameraConfig(position=(0.0, 0.5, 2.0), look_x=-90.0, look_y=-5.0,
                      focal_length=8.0, aperture_diameter=0.1)
    inv_p, inv_v, _ = camera.camera_matrices(cc, W, H)
    env_t = pack_block_table(constant_environment((0.3, 0.45, 0.6)))

    def loss(sm):
        s = dataclasses.replace(scene, sphere_material=sm)
        res = trace_diff(s, inv_p, inv_v, jnp.int32(0), jnp.float32(8.0),
                         jnp.float32(0.1), jnp.int32(0), W, H, DEPTH, SPP,
                         (4, 0))
        return jnp.sum(apply_environment_blocked(res, env_t, SPP) ** 2)

    want = np.asarray(jax.jit(jax.grad(loss))(scene.sphere_material))
    scale = max(np.abs(want).max(), 1e-3)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3 * scale)
