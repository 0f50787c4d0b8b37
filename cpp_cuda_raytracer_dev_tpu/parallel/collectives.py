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


def allreduce_nearest_hit(hit: Hit, axis_name: str) -> Hit:
    """Global nearest hit across an axis of primitive shards.

    Two cheap collectives: min-reduce the distances, then max-reduce the
    payload of whichever shard(s) achieved the minimum (ties resolve to the
    larger packed payload, which is deterministic).
    """
    tmin = jax.lax.pmin(hit.t, axis_name)
    mine = hit.t <= tmin
    payload = jnp.where(mine,
                        (hit.tri.astype(jnp.int64) << 20)
                        | (hit.obj.astype(jnp.int64) & 0xFFFFF),
                        jnp.int64(-1) << 40)
    payload = jax.lax.pmax(payload, axis_name)
    miss = payload < 0
    tri = jnp.where(miss, jnp.int64(-1), payload >> 20).astype(jnp.int32)
    obj = jnp.where(miss, jnp.int64(-1),
                    payload & 0xFFFFF).astype(jnp.int32)
    return Hit(t=tmin, tri=tri, obj=obj)
