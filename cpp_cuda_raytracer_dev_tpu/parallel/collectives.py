"""Cross-device combines for sharded rendering (used inside shard_map).

When triangles are range-sharded over the "prims" axis, every device finds
the nearest hit within its own range; the global nearest hit is a min-reduce
over shards keyed by distance, carrying the (tri, obj) payload. This is the
distributed generalization of `Hit.merge` (ops/intersect.py) and the
framework's analogue of the reference's per-thread nearest-hit select
(Trixel.cu:127-142) across the primitive axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.intersect import Hit


_I32_MAX = 2**31 - 1


def allreduce_nearest_hit(hit: Hit, axis_name: str) -> Hit:
    """Global nearest hit across an axis of primitive shards.

    Three staged pmins, all int32/f32 (an int64 pack would silently
    truncate under JAX's default x64-off config and overflow past 2^11
    triangles): min-reduce the distances, then among the achieving shards
    min-reduce the triangle index (ties across shards resolve to the
    smallest tri — matching the single-device chunk-scan order of
    `mt_fixed_origin`/`Hit.merge`), then the object index of that winner.
    """
    tmin = jax.lax.pmin(hit.t, axis_name)
    mine = (hit.t <= tmin) & (hit.tri >= 0)
    tri_win = jax.lax.pmin(
        jnp.where(mine, hit.tri, _I32_MAX), axis_name)
    winner = mine & (hit.tri == tri_win)
    obj_win = jax.lax.pmin(
        jnp.where(winner, hit.obj, _I32_MAX), axis_name)
    miss = tri_win == _I32_MAX
    return Hit(t=tmin,
               tri=jnp.where(miss, jnp.int32(-1), tri_win),
               obj=jnp.where(miss, jnp.int32(-1), obj_win))
