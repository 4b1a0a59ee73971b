"""Test configuration: run on CPU with a simulated 8-device mesh.

Multi-device sharding tests exercise the same psum/shard_map code paths as
real ICI/DCN, per SURVEY.md §4 item 4.  (The env-var route is unreliable
under the axon platform plugin, so the jax.config API is used instead.)
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import matplotlib  # noqa: E402

matplotlib.use("Agg")  # headless widget tests (tests/test_interactive.py)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(1234)
