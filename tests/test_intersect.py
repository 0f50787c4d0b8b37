import jax
import jax.numpy as jnp
import numpy as np

from cpp_cuda_raytracer_dev_tpu.models.scene import Triangles
from cpp_cuda_raytracer_dev_tpu.ops.intersect import (
    FixedOriginCache, mt_brute, mt_fixed_origin, mt_test)


def make_tris(simple_tris):
    return Triangles.from_vertices(simple_tris)


def test_mt_single_analytic(simple_tris):
    tris = make_tris(simple_tris)
    o = jnp.zeros(3)
    d = jnp.array([[0.0, 0.0, 1.0]])
    t, u, v, valid = mt_test(o, d, tris.p1[:1], tris.e1[:1], tris.e2[:1])
    assert bool(valid[0])
    np.testing.assert_allclose(t[0], 2.0, rtol=1e-6)


def test_brute_nearest_hit_and_occlusion(simple_tris):
    tris = make_tris(simple_tris)
    o = jnp.zeros(3)
    # straight ahead: hits front square (t=2), not the far tri (t=5)
    # off to the side at x=1.5: misses square, hits far triangle
    d = jnp.array([
        [0.0, 0.0, 1.0],
        [0.55, 0.0, 1.0],     # exits the unit square (x=1.1 at z=2), far
                              # tri at x=2.75, inside its y=0 span [-3, 3]
        [0.0, 1.0, 0.0],      # up: misses everything
    ])
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    hit = mt_brute(o, d, tris, chunk=2)
    assert hit.tri[0] in (0, 1)
    np.testing.assert_allclose(hit.t[0], 2.0, rtol=1e-5)
    assert int(hit.tri[1]) == 2
    assert int(hit.tri[2]) == -1
    assert float(hit.t[2]) == 400.0


def test_fixed_origin_matches_brute(simple_tris):
    tris = make_tris(simple_tris)
    o = jnp.array([0.3, -0.2, -1.0])
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (256, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    # point roughly forward so some hit
    d = d.at[:, 2].set(jnp.abs(d[:, 2]) + 0.5)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    brute = mt_brute(o, d, tris, chunk=2)
    cache = FixedOriginCache.build(o, tris)
    fixed = mt_fixed_origin(d, cache, chunk=2)

    np.testing.assert_array_equal(brute.tri, fixed.tri)
    np.testing.assert_allclose(brute.t, fixed.t, rtol=1e-4)
    assert int(jnp.sum(brute.tri >= 0)) > 50  # fixture sanity


def test_fixed_origin_matches_brute_on_mesh(rabbit_path):
    from cpp_cuda_raytracer_dev_tpu.io import ply
    mesh = ply.load_mesh(rabbit_path)
    tris = Triangles.from_vertices(mesh.tri_vertices[:4096])
    o = jnp.array([0.0, 0.10, -1.0])
    # small bundle of forward rays at the mesh
    gx, gy = jnp.meshgrid(jnp.linspace(-0.1, 0.1, 16),
                          jnp.linspace(0.0, 0.2, 16))
    d = jnp.stack([gx.ravel(), gy.ravel() - 0.1 + 0.10,
                   jnp.ones(256)], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    brute = mt_brute(o, d, tris, chunk=512)
    fixed = mt_fixed_origin(d, FixedOriginCache.build(o, tris), chunk=512)
    # same triangles except where two surfaces are within float tolerance
    agree = np.mean(np.asarray(brute.tri) == np.asarray(fixed.tri))
    assert agree > 0.995
    np.testing.assert_allclose(brute.t, fixed.t, rtol=1e-3, atol=1e-5)
