#!/usr/bin/env python
"""Isolate the bin-prepass geometry-tail costs: row gather vs flat gather
vs the three transpose forms, at dragon-entry scale (E=1.3M, T=800k).
Decides the gen-5 geometry layout (r4)."""
import sys
import time

sys.path.insert(0, "/root/repo")


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(f, *a, iters=10):
    import jax
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    out = None
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
    rng = np.random.default_rng(0)
    t_n, e = 800_130, 1_288_192
    ftab = jnp.asarray(rng.standard_normal((t_n, 12)), jnp.float32)
    ftab6 = jnp.asarray(rng.standard_normal((t_n, 6)), jnp.float32)
    flat = jnp.asarray(rng.standard_normal((t_n,)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, t_n, e), jnp.int32)
    idx_sorted = jnp.sort(idx)
    rows = jnp.asarray(rng.standard_normal((e, 12)), jnp.float32)

    log(f"take (T,12) rows @1.3M : "
        f"{timed(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), ftab, idx):.2f} ms")
    log(f"take (T,12) SORTED idx : "
        f"{timed(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), ftab, idx_sorted):.2f} ms")
    log(f"take (T,6) rows @1.3M  : "
        f"{timed(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), ftab6, idx):.2f} ms")
    log(f"take (T,) flat @1.3M   : "
        f"{timed(jax.jit(lambda t, i: jnp.take(t, i)), flat, idx):.2f} ms")

    nb = e // 512
    log(f"(E,12)->(12,E) full T  : "
        f"{timed(jax.jit(lambda x: x.T + 0.0), rows):.2f} ms")
    log(f"(E,12)->(nb,12,512) blkT: "
        f"{timed(jax.jit(lambda x: x.reshape(nb, 512, 12).transpose(0, 2, 1) + 0.0), rows):.2f} ms")
    log(f"(E,12) identity +0     : "
        f"{timed(jax.jit(lambda x: x + 0.0), rows):.2f} ms")
    log(f"gather+blkT fused      : "
        f"{timed(jax.jit(lambda t, i: jnp.take(t, i, axis=0).reshape(nb, 512, 12).transpose(0, 2, 1) + 0.0), ftab, idx):.2f} ms")
    log(f"gather+fullT fused     : "
        f"{timed(jax.jit(lambda t, i: jnp.take(t, i, axis=0).T + 0.0), ftab, idx):.2f} ms")
    # gather from a PRE-TRANSPOSED (12, T) table along lanes
    ftab_t = jnp.asarray(np.asarray(ftab).T.copy())
    log(f"take (12,T) axis=1     : "
        f"{timed(jax.jit(lambda t, i: jnp.take(t, i, axis=1)), ftab_t, idx):.2f} ms")


if __name__ == "__main__":
    main()
