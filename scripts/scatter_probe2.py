#!/usr/bin/env python
"""Re-measure sort/scatter with forced D2H sync (float(sum(out))) vs
block_until_ready, across pow2 and non-pow2 sizes — resolves whether the
suspiciously-fast probe numbers were real or an async-dispatch artifact."""
import sys
import time

sys.path.insert(0, "/root/repo")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.block_until_ready(jnp.ones((8,)))
    log("probe ok")
    rng = np.random.default_rng(0)

    def timed_sync(f, *a, iters=5):
        s = jnp.sum(f(*a)[0])
        _ = float(s)
        t0 = time.perf_counter()
        for _ in range(iters):
            v = float(jnp.sum(f(*a)[0]))
        return (time.perf_counter() - t0) / iters * 1e3

    def timed_block(f, *a, iters=5):
        jax.block_until_ready(f(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    # roundtrip baseline
    one = jnp.ones((8,))
    t0 = time.perf_counter()
    for _ in range(10):
        _ = float(jnp.sum(one))
    log(f"D2H roundtrip baseline: {(time.perf_counter()-t0)/10*1e3:.2f} ms")

    for n in (1 << 20, 1_300_000, 1 << 21, 2_408_448, 3_208_578):
        k = jnp.asarray(rng.integers(0, 2**31 - 1, n), jnp.int32)
        p = jnp.arange(n, dtype=jnp.int32)
        f2 = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1))
        ts = timed_sync(f2, k, p)
        tb = timed_block(f2, k, p)
        log(f"sort key+payload n={n}: sync={ts:.2f} ms  block={tb:.2f} ms")

    # gather with sync
    t_n = 800_130
    tab = jnp.asarray(rng.standard_normal((t_n, 10)), jnp.float32)
    gi = jnp.asarray(rng.integers(0, t_n, 1_300_000), jnp.int32)
    f = jax.jit(lambda t, i: (jnp.take(t, i, axis=0),))
    log(f"gather (800k,10) at 1.3M: sync={timed_sync(f, tab, gi):.2f} "
        f"block={timed_block(f, tab, gi):.2f} ms")

    # scatter-add indicator with sync
    ecap = 1_300_000
    cum2 = jnp.sort(jnp.asarray(rng.integers(0, ecap, t_n), jnp.int32))
    f = jax.jit(lambda c: (jnp.cumsum(
        jnp.zeros((ecap,), jnp.int32).at[c].add(1, mode="drop")),))
    log(f"indicator 800k->1.3M: sync={timed_sync(f, cum2):.2f} "
        f"block={timed_block(f, cum2):.2f} ms")

    # scatter-min at raster scale with sync
    npix = 960 * 544
    idx = jnp.asarray(rng.integers(0, npix, 3_200_000), jnp.int32)
    val = jnp.asarray(rng.integers(0, 2**30, 3_200_000), jnp.int32)
    f = jax.jit(lambda i, v: (jnp.full((npix,), 2**31 - 1, jnp.int32)
                              .at[i].min(v, mode="drop"),))
    log(f"scatter-min 3.2M->522k: sync={timed_sync(f, idx, val):.2f} "
        f"block={timed_block(f, idx, val):.2f} ms")


if __name__ == "__main__":
    main()
