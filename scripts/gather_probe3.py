#!/usr/bin/env python
"""TPU microbench: candidate strategies for the per-entry geometry gather
(the bin prepass's 9 ms whale): E=1.33M random row indices into a
(T=800k, 10) f32 table.

 a) jnp.take rows of (T, 10)            [current]
 b) jnp.take rows of (T, 16) padded     (alignment effect)
 c) jnp.take rows of (T, 8)            (pow2 row)
 d) monotone take (pre-sort tri_j)      (sequential-ish indices)
 e) lax.sort carrying 10 f32 operands   (skip post-sort gather entirely)
 f) take + pad + blocked transpose      [current full tail]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(fn, *args, iters=10):
    import jax
    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.block_until_ready(jnp.ones((8,)))
    log("probe ok")

    T, E = 800_000, 1_331_200
    rng = np.random.default_rng(0)
    tab10 = jnp.asarray(rng.normal(size=(T, 10)).astype(np.float32))
    tab16 = jnp.pad(tab10, ((0, 0), (0, 6)))
    tab8 = tab10[:, :8]
    idx_r = jnp.asarray(rng.integers(0, T, size=E).astype(np.int32))
    idx_m = jnp.sort(idx_r)
    key = jnp.asarray(rng.integers(0, 2**31 - 1, size=E).astype(np.int32))

    log(f"a take (T,10) rand : "
        f"{timed(jax.jit(lambda i: jnp.take(tab10, i, axis=0)), idx_r)*1e3:7.2f} ms")
    log(f"b take (T,16) rand : "
        f"{timed(jax.jit(lambda i: jnp.take(tab16, i, axis=0)), idx_r)*1e3:7.2f} ms")
    log(f"c take (T,8)  rand : "
        f"{timed(jax.jit(lambda i: jnp.take(tab8, i, axis=0)), idx_r)*1e3:7.2f} ms")
    log(f"d take (T,10) mono : "
        f"{timed(jax.jit(lambda i: jnp.take(tab10, i, axis=0)), idx_m)*1e3:7.2f} ms")

    cols10 = tuple(jnp.take(tab10, idx_r, axis=0)[:, i] for i in range(10))
    jax.block_until_ready(cols10)

    def sort_carry(k, cols):
        out = jax.lax.sort((k,) + cols, num_keys=1)
        return out[1]

    log(f"e sort +10 f32 ops : "
        f"{timed(jax.jit(sort_carry), key, cols10)*1e3:7.2f} ms")
    log(f"e2 sort key+1 i32  : "
        f"{timed(jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1)[1]), key, idx_r)*1e3:7.2f} ms")

    chunk = 128

    def full_tail(i):
        rows = jnp.take(tab10, i, axis=0)
        rows = jnp.concatenate([rows, jnp.zeros((chunk, 10), jnp.float32)])
        return rows.reshape(-1, chunk, 10).transpose(0, 2, 1)

    log(f"f take+pad+transp  : {timed(jax.jit(full_tail), idx_r)*1e3:7.2f} ms")

    # g: one-hot MXU gather, blocked: entries sorted by index (monotone) in
    # blocks of B; each block spans a narrow table window of W rows.
    B, W = 1024, 4096

    def onehot_block(i):
        nb = E // B
        ib = i.reshape(nb, B)
        base = jnp.maximum(ib[:, 0], 0)
        base = jnp.minimum(base, T - W)

        def body(carry, args):
            ibk, bk = args
            win = jax.lax.dynamic_slice(tab10, (bk, 0), (W, 10))
            oh = (ibk[:, None] - bk == jnp.arange(W)[None, :])
            out = jax.lax.dot_general(
                oh.astype(jnp.bfloat16), win.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return carry, out

        _, outs = jax.lax.scan(body, 0, (ib, base))
        return outs

    try:
        dt = timed(jax.jit(onehot_block), idx_m)
        log(f"g onehot MXU mono  : {dt*1e3:7.2f} ms (bf16 -> inexact, "
            "structure probe only)")
    except Exception as e:
        log(f"g onehot MXU mono  : FAIL {type(e).__name__} {str(e)[:120]}")


if __name__ == "__main__":
    main()
