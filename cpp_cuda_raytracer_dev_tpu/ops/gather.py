"""Row gather with a TPU-efficient transpose (sorted segment-sum VJP).

The differentiable shading path gathers per-hit triangle data
(``models/renderer.py shade_hits``): ~R rows out of T-row tables. XLA's
default VJP for that gather is an unsorted scatter-add into the (T, ...)
gradient — effectively serialized on TPU and the dominant cost of the
backward pass at dragon scale (measured ~120 ms of a 157 ms fwd+bwd step).

`gather_rows` keeps the forward a plain gather but rewrites the transpose:
argsort the hit indices once (shared across all gathered tables), permute
the cotangents, and accumulate with a single `segment_sum` over sorted
segment ids — which XLA lowers to a vectorizable sorted reduction instead
of random-order scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def gather_rows(tables, idx):
    """tables: tuple of (T, ...) arrays; idx: (R,) int32 in [0, T).
    Returns tuple of (R, ...) gathered rows. Differentiable w.r.t. tables.
    """
    return tuple(jnp.take(t, idx, axis=0) for t in tables)


def _fwd(tables, idx):
    shapes = tuple(t.shape[0] for t in tables)
    return gather_rows(tables, idx), (idx, shapes)


def _bwd(res, ct):
    idx, shapes = res
    order = jnp.argsort(idx)
    idx_sorted = jnp.take(idx, order)
    grads = []
    for t_rows, g in zip(shapes, ct):
        g_sorted = jnp.take(g, order, axis=0)
        grads.append(jax.ops.segment_sum(
            g_sorted, idx_sorted, num_segments=t_rows,
            indices_are_sorted=True))
    return tuple(grads), None


gather_rows.defvjp(_fwd, _bwd)
