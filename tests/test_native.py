"""Native (C++) KD builder must be bit-identical to the numpy builder."""

import numpy as np
import pytest

from cpp_cuda_raytracer_dev_tpu.accel import native
from cpp_cuda_raytracer_dev_tpu.accel.kd_build import build_kd, validate_kd
from cpp_cuda_raytracer_dev_tpu.io import ply

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="no g++ toolchain")


@pytest.mark.parametrize("leaf", [1, 7, 32])
def test_native_matches_numpy(tester_path, leaf):
    mesh = ply.load_mesh(tester_path)
    a = build_kd(mesh.aabb_min, mesh.aabb_max, leaf)
    b = native.build_kd_native(mesh.aabb_min, mesh.aabb_max, leaf)
    assert a.num_nodes == b.num_nodes
    for f in ("bounds_min", "bounds_max", "cut_code", "s1", "s2", "left",
              "right", "parent", "leaf_start", "leaf_count", "perm"):
        np.testing.assert_array_equal(
            getattr(a, f), getattr(b, f), err_msg=f)


def test_native_validates_on_random(seed=3):
    rng = np.random.default_rng(seed)
    lo = rng.standard_normal((5000, 3)).astype(np.float32)
    hi = lo + rng.random((5000, 3)).astype(np.float32)
    tree = native.build_kd_native(lo, hi, 16)
    validate_kd(tree, lo, hi)
