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
