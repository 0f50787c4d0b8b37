"""Unit tests for the scatter-free gather VJP (ops/gather.py).

The reference has no equivalent (no autodiff); this is the TPU-native
machinery that replaces XLA's serialized scatter-add transpose of the
shade-path gathers (models/renderer.py shade_hits).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpp_cuda_raytracer_dev_tpu.ops.gather import (_bwd_cumsum,
                                                   _segment_sum_pallas,
                                                   gather_rows)


def _rand_case(rng, t_rows, r_rows, widths):
    idx = jnp.asarray(rng.integers(0, t_rows, r_rows).astype(np.int32))
    tabs = tuple(
        jnp.asarray(rng.standard_normal((t_rows, w)).astype(np.float32))
        for w in widths)
    return idx, tabs


def test_forward_matches_take():
    rng = np.random.default_rng(1)
    idx, tabs = _rand_case(rng, 257, 1000, (3, 3, 1))
    got = gather_rows(tabs, idx)
    want = tuple(jnp.take(t, idx, axis=0) for t in tabs)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("t_rows,r_rows", [(1000, 4096), (127, 63), (3, 1)])
def test_grad_matches_scatter_vjp(t_rows, r_rows):
    rng = np.random.default_rng(t_rows)
    idx, tabs = _rand_case(rng, t_rows, r_rows, (3, 3, 3, 1))
    w = tuple(jnp.asarray(rng.standard_normal(r_rows).astype(np.float32))
              for _ in tabs)

    def loss(tabs, gather):
        outs = gather(tabs, idx)
        return sum(jnp.sum(wi[:, None] * o) for wi, o in zip(w, outs))

    g = jax.grad(loss)(tabs, gather_rows)
    gr = jax.grad(loss)(
        tabs, lambda ts, i: tuple(jnp.take(t, i, axis=0) for t in ts))
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("t_rows,r_rows,f", [(1000, 4096, 7), (2048, 511, 4),
                                             (1024, 513, 1)])
def test_segment_sum_pallas_interpret(t_rows, r_rows, f):
    rng = np.random.default_rng(f)
    idx = np.sort(rng.integers(0, t_rows, r_rows)).astype(np.int32)
    block = jnp.asarray(rng.standard_normal((r_rows, f)).astype(np.float32))
    idx_s = jnp.asarray(idx)
    seg_p = _segment_sum_pallas(block, idx_s, t_rows, interpret=True)
    seg_c = _bwd_cumsum(block, idx_s, t_rows)
    np.testing.assert_allclose(np.asarray(seg_p), np.asarray(seg_c),
                               rtol=1e-4, atol=1e-4)


def test_segment_sum_pallas_all_one_row():
    # every hit lands on the same triangle — max-length single segment
    t_rows, r_rows, f = 1024, 2000, 3
    idx_s = jnp.zeros((r_rows,), jnp.int32) + 7
    block = jnp.ones((r_rows, f), jnp.float32)
    seg = _segment_sum_pallas(block, idx_s, t_rows, interpret=True)
    want = np.zeros((t_rows, f), np.float32)
    want[7] = r_rows
    np.testing.assert_allclose(np.asarray(seg), want, rtol=1e-6)
