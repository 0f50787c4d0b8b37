#!/usr/bin/env python
"""Honest probes for the backward-pass attack (r4): cost of lax.sort at
R=518k with k payload operands (decides sort-carry vs argsort+permute in
ops/gather.py _bwd), the argsort+row-permute form itself, and the
segment-sum kernel."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    _ = float(jnp.sum(jnp.ones((8,))))
    log("probe ok")
    from cpp_cuda_raytracer_dev_tpu.utils.profiling import device_time

    rng = np.random.default_rng(0)
    r, t_rows = 518_400, 800_130
    idx = jnp.asarray(rng.integers(0, t_rows, r), jnp.int32)
    cols = [jnp.asarray(rng.standard_normal(r), jnp.float32)
            for _ in range(15)]
    block = jnp.stack(cols, axis=1)                        # (R, 15)

    for k in (1, 4, 8, 15):
        f = jax.jit(lambda i2, *pay: jax.lax.sort(
            (i2,) + pay, num_keys=1))

        def call(i, k=k, f=f):
            return f(idx + jnp.int32(i) * 0 + jnp.int32(i % 2), *cols[:k])

        log(f"sort R=518k + {k:2d} f32 payloads: "
            f"{device_time(call)*1e3:7.2f} ms")

    # argsort + (R,15) row permute (the current _bwd form)
    f2 = jax.jit(lambda i2, b: (
        jnp.take(b, jnp.argsort(i2), axis=0),
        jnp.sort(i2)))

    def call2(i):
        return f2(idx + jnp.int32(i % 2), block)

    log(f"argsort + (R,15) permute   : {device_time(call2)*1e3:7.2f} ms")

    # full custom-VJP backward path (sorted scatter)
    from cpp_cuda_raytracer_dev_tpu.ops.gather import (_bwd,
                                                       gather_rows)

    def vjp_call(i):
        tabs = (jnp.zeros((t_rows, 15), jnp.float32)
                + jnp.float32(i) * 1e-9,)
        _, vjp = jax.vjp(lambda t: gather_rows((t,), idx)[0], tabs[0])
        return vjp(block)[0]

    f3 = jax.jit(lambda i: vjp_call(i))
    log(f"gather_rows VJP end-to-end : "
        f"{device_time(lambda i: f3(jnp.int32(i)))*1e3:7.2f} ms")

    # forward shade-style packed gather
    tab = jnp.asarray(rng.standard_normal((t_rows, 15)), jnp.float32)
    f4 = jax.jit(lambda i2: jnp.take(tab, i2, axis=0))
    log(f"fwd (T,15) take at R       : "
        f"{device_time(lambda i: f4(idx + jnp.int32(i % 2)))*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
