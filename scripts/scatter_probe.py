#!/usr/bin/env python
"""Measure XLA TPU scatter/segment primitives at raster scale: the decisive
numbers for a scatter-min z-buffer rasterizer (project + expand + scatter-min
per pixel) vs the sort-based bin path. Also times jax.lax.sort at several
sizes to calibrate the bin prepass."""
import sys
import time

sys.path.insert(0, "/root/repo")


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(f, *a, iters=10):
    import jax
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.block_until_ready(jnp.ones((8,)))
    log("probe ok")
    npix = 960 * 544
    rng = np.random.default_rng(0)

    for e in (1 << 20, 1 << 21, 1 << 22):
        idx = jnp.asarray(rng.integers(0, npix, e), jnp.int32)
        val = jnp.asarray(rng.integers(0, 2**30, e), jnp.int32)

        def smin(i, v):
            return jnp.full((npix,), 2**31 - 1, jnp.int32).at[i].min(
                v, mode="drop", unique_indices=False)

        log(f"scatter-min i32 E={e}: {timed(jax.jit(smin), idx, val):.2f} ms")

        def sadd(i, v):
            return jnp.zeros((npix,), jnp.int32).at[i].add(
                v, mode="drop")

        log(f"scatter-add i32 E={e}: {timed(jax.jit(sadd), idx, val):.2f} ms")

    # sorted-index variant (entries pre-grouped by pixel would be cheating,
    # but measures whether XLA exploits sortedness)
    e = 1 << 21
    idx_s = jnp.sort(jnp.asarray(rng.integers(0, npix, e), jnp.int32))
    val = jnp.asarray(rng.integers(0, 2**30, e), jnp.int32)

    def smin2(i, v):
        return jnp.full((npix,), 2**31 - 1, jnp.int32).at[i].min(
            v, mode="drop")

    log(f"scatter-min sorted idx E={e}: "
        f"{timed(jax.jit(smin2), idx_s, val):.2f} ms")

    def segmin(i, v):
        return jax.ops.segment_min(v, i, num_segments=npix,
                                   indices_are_sorted=True)

    log(f"segment_min sorted E={e}: {timed(jax.jit(segmin), idx_s, val):.2f} ms")

    # sort calibration
    for n in (1 << 19, 1 << 20, 1 << 21):
        k = jnp.asarray(rng.integers(0, 2**31 - 1, n), jnp.int32)
        p = jnp.arange(n, dtype=jnp.int32)

        def s1(k):
            return jax.lax.sort((k,), num_keys=1)

        def s2(k, p):
            return jax.lax.sort((k, p), num_keys=1)

        log(f"sort key-only n={n}: {timed(jax.jit(s1), k):.2f} ms ; "
            f"key+payload: {timed(jax.jit(s2), k, p):.2f} ms")

    # gather calibration at raster scale
    t_n = 800_000
    tab = jnp.asarray(rng.standard_normal((t_n, 10)), jnp.float32)
    gi = jnp.asarray(rng.integers(0, t_n, 1 << 21), jnp.int32)
    log(f"gather (800k,10) at 2M: "
        f"{timed(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), tab, gi):.2f} ms")
    tab1 = jnp.asarray(rng.standard_normal((t_n,)), jnp.float32)
    log(f"gather (800k,) at 2M: "
        f"{timed(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), tab1, gi):.2f} ms")

    # cumsum at prepass scale
    x = jnp.ones((1 << 21,), jnp.int32)
    log(f"cumsum 2M i32: {timed(jax.jit(jnp.cumsum), x):.2f} ms")

    # permutation scatter (unique indices): out[pos[i]] = val[i]
    e = 1 << 20
    perm = jnp.asarray(rng.permutation(e), jnp.int32)
    val = jnp.asarray(rng.integers(0, 2**30, e), jnp.int32)

    def pscat(p, v):
        return jnp.zeros((e,), jnp.int32).at[p].set(
            v, mode="drop", unique_indices=True)

    log(f"perm scatter-set E={e}: {timed(jax.jit(pscat), perm, val):.2f} ms")

    # boundary indicator: scatter-add T=800k counts into E-sized array,
    # then cumsum — the searchsorted(cum, iota) replacement
    t_n2 = 800_000
    ecap = 1 << 20
    cum2 = jnp.sort(jnp.asarray(rng.integers(0, ecap, t_n2), jnp.int32))

    def indic(c):
        ind = jnp.zeros((ecap,), jnp.int32).at[c].add(1, mode="drop")
        return jnp.cumsum(ind)

    log(f"indicator scatter-add 800k->1M + cumsum: "
        f"{timed(jax.jit(indic), cum2):.2f} ms")

    # counts per tile: scatter-add E ones into 2048 tiles
    tile_ids = jnp.asarray(rng.integers(0, 2040, 1 << 20), jnp.int32)

    def tcounts(ti):
        return jnp.zeros((2048,), jnp.int32).at[ti].add(1, mode="drop")

    log(f"tile-count scatter-add 1M->2048: "
        f"{timed(jax.jit(tcounts), tile_ids):.2f} ms")


if __name__ == "__main__":
    main()
