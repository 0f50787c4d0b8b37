"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
``xla_force_host_platform_device_count`` (SURVEY.md §4). Must run before
jax initializes, hence the env mutation at import time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The axon environment force-registers its TPU backend from
# sitecustomize.py (PYTHONPATH=/root/.axon_site) and sets
# jax_platforms="axon,cpu" *programmatically*, overriding the env var —
# so reset the config after import. A test suite must never contend with
# the bench for the single real chip.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ASSETS = "/root/reference/TEST_Dungeonrun"


@pytest.fixture(scope="session")
def rabbit_path():
    return os.path.join(REFERENCE_ASSETS, "rabbit_70k.ply")


@pytest.fixture(scope="session")
def walls_path():
    return os.path.join(REFERENCE_ASSETS, "3_walls.ply")


@pytest.fixture(scope="session")
def tester_path():
    return os.path.join(REFERENCE_ASSETS, "tester.ply")


@pytest.fixture(scope="session")
def simple_tris():
    """Two axis-aligned triangles forming a unit square at z=2 plus one
    behind it at z=5 — analytic fixture for intersection tests."""
    tris = np.array([
        # front square (two triangles), z = 2
        [[-1, -1, 2], [1, -1, 2], [-1, 1, 2]],
        [[1, 1, 2], [-1, 1, 2], [1, -1, 2]],
        # large far triangle, z = 5 (occluded in the middle, visible
        # around the square's edges)
        [[-6, -6, 5], [6, -6, 5], [0, 6, 5]],
    ], np.float32)
    return tris
