"""Multi-host bootstrap: single-host degenerate case + fail-fast validation.

Runs on the simulated 8-device CPU mesh (tests/conftest.py)."""

import numpy as np
import jax
import pytest

from tpt.parallel.init import init_distributed, make_host_mesh
from tpt.parallel import make_mesh


def test_single_process_init_is_noop():
    assert init_distributed() == 1
    # idempotent
    assert init_distributed() == 1


def test_explicit_init_requires_full_triple():
    with pytest.raises(ValueError, match="together"):
        init_distributed("127.0.0.1:9999")


def test_host_mesh_matches_make_mesh_single_host():
    n = len(jax.devices())
    mesh = make_host_mesh(sp=1)
    assert mesh.shape == {"dp": n, "sp": 1}
    assert mesh.axis_names == ("dp", "sp")
    np.testing.assert_array_equal(
        np.asarray(mesh.devices).ravel(),
        np.asarray(make_mesh(dp=n, sp=1).devices).ravel())


def test_host_mesh_sp_axis():
    n = len(jax.devices())
    if n < 2:
        pytest.skip("needs simulated multi-device mesh")
    mesh = make_host_mesh(sp=2)
    assert mesh.shape == {"dp": n // 2, "sp": 2}


def test_host_mesh_rejects_nondivisible_sp():
    n = len(jax.devices())
    with pytest.raises(ValueError, match="divide"):
        make_host_mesh(sp=n + 7)

def test_host_mesh_explicit_device_list():
    # explicit lists must be honored verbatim (the r3 dead-branch bug:
    # per-host inference silently used process-count division)
    devs = jax.devices()
    subset = devs[:4]
    mesh = make_host_mesh(sp=2, devices=subset)
    assert mesh.shape == {"dp": 2, "sp": 2}
    np.testing.assert_array_equal(
        np.asarray(mesh.devices).ravel(),
        np.asarray(subset))
    # a 3-device explicit list with sp=1 is fine
    mesh = make_host_mesh(sp=1, devices=devs[:3])
    assert mesh.shape == {"dp": 3, "sp": 1}
    with pytest.raises(ValueError, match="divide"):
        make_host_mesh(sp=2, devices=devs[:3])


class _FakeDev:
    """Stand-in device with a process_index (all CPU sim devices report
    process 0, so host-imbalance needs fakes)."""
    def __init__(self, pid):
        self.process_index = pid

    def __repr__(self):
        return f"dev(p{self.process_index})"


def test_host_mesh_rejects_imbalanced_explicit_list():
    devs = [_FakeDev(0), _FakeDev(0), _FakeDev(0), _FakeDev(1)]
    with pytest.raises(ValueError, match="imbalanced"):
        make_host_mesh(sp=2, devices=devs)
