#!/usr/bin/env python
"""Decisive on-chip numbers for the raster-v2 (span-bucketed scatter-min)
design: scatter-min at 5-50M entries -> 522k pixels, flat gather from a
small (VMEM-resident) table at the same scale, i64 packed scatter-min,
bucket-sort with wide payloads, and an end-to-end two-pass z-buffer mock
with the REAL dragon-class pair distribution (not uniform random)."""
import sys
import time

sys.path.insert(0, "/root/repo")


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed_sync(f, *a, iters=5):
    import jax
    import jax.numpy as jnp
    out = f(*a)
    _ = float(jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
        _ = float(jnp.sum(out[0]) if isinstance(out, tuple)
                  else jnp.sum(out))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.block_until_ready(jnp.ones((8,)))
    log(f"probe ok, devices={jax.devices()}")
    npix = 960 * 540
    rng = np.random.default_rng(0)

    # ---- scatter-min i32 at raster scales ----
    for e in (6_400_000, 12_800_000, 25_600_000, 51_200_000):
        idx = jnp.asarray(rng.integers(0, npix, e), jnp.int32)
        val = jnp.asarray(rng.integers(0, 2**30, e), jnp.int32)

        def smin(i, v):
            return jnp.full((npix,), 2**31 - 1, jnp.int32).at[i].min(
                v, mode="drop")

        log(f"scatter-min i32 E={e / 1e6:.1f}M -> 522k: "
            f"{timed_sync(jax.jit(smin), idx, val):.2f} ms")

    # ---- flat gather from a small table (the eq-pass take) ----
    tab = jnp.asarray(rng.integers(0, 2**30, npix), jnp.int32)
    for e in (6_400_000, 25_600_000, 51_200_000):
        gi = jnp.asarray(rng.integers(0, npix, e), jnp.int32)
        log(f"flat take (522k,) at E={e / 1e6:.1f}M: "
            f"{timed_sync(jax.jit(lambda t, i: jnp.take(t, i)), tab, gi):.2f}"
            " ms")

    # ---- two-pass winner select end-to-end at 25.6M ----
    e = 25_600_000
    idx = jnp.asarray(rng.integers(0, npix, e), jnp.int32)
    val = jnp.asarray(rng.integers(0, 2**30, e), jnp.int32)
    tid = jnp.asarray(rng.integers(0, 800_000, e), jnp.int32)

    def two_pass(i, v, t):
        zmin = jnp.full((npix,), 2**31 - 1, jnp.int32).at[i].min(
            v, mode="drop")
        eq = v == jnp.take(zmin, i)
        win = jnp.full((npix,), 2**31 - 1, jnp.int32).at[
            jnp.where(eq, i, npix - 1)].min(
                jnp.where(eq, t, 2**31 - 1), mode="drop")
        return zmin, win

    log(f"two-pass zbuf E=25.6M: "
        f"{timed_sync(jax.jit(two_pass), idx, val, tid):.2f} ms")

    # ---- i64 packed single-pass (needs x64) ----
    try:
        v64 = (val.astype(jnp.int64) << 20) | tid.astype(jnp.int64)

        def smin64(i, v):
            return jnp.full((npix,), 2**62, jnp.int64).at[i].min(
                v, mode="drop")

        log(f"scatter-min i64 E=25.6M: "
            f"{timed_sync(jax.jit(smin64), idx, v64):.2f} ms")
    except Exception as ex:  # noqa: BLE001
        log(f"i64 scatter unavailable: {type(ex).__name__}: {ex}")

    # ---- f32 two-scatter variant (min on float bits as float) ----
    valf = jnp.asarray(rng.random(e, np.float32) * 100 + 0.1)

    def sminf(i, v):
        return jnp.full((npix,), 3e38, jnp.float32).at[i].min(
            v, mode="drop")

    log(f"scatter-min f32 E=25.6M: "
        f"{timed_sync(jax.jit(sminf), idx, valf):.2f} ms")

    # ---- bucket sort: 800k keys + 16 f32 payloads ----
    t_n = 800_130
    keys = jnp.asarray(rng.integers(0, 8, t_n), jnp.int32)
    pay = [jnp.asarray(rng.standard_normal(t_n), jnp.float32)
           for _ in range(16)]

    def bsort(k, *p):
        return jax.lax.sort((k,) + p, num_keys=1)

    log(f"sort 800k keys + 16 payloads: "
        f"{timed_sync(jax.jit(bsort), keys, *pay):.2f} ms")

    # ---- realistic dragon-class pair distribution ----
    from cpp_cuda_raytracer_dev_tpu.models.camera import Camera
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh
    tv = dragon_class_mesh(800_000)
    cam = Camera.create(960, 540, pos=[0.0, 0.0, -3.0],
                        look_at=[0.0, 0.0, 0.0], up=[0.0, 1.0, 0.0],
                        film_h=0.024, focal=0.055)
    proj = cam.projection()
    o = np.asarray(proj.origin)
    nv, uv, vv = (np.asarray(proj.n), np.asarray(proj.u),
                  np.asarray(proj.v))
    sx, sy = float(proj.sx), float(proj.sy)
    axp, ayp = float(proj.adjust_x), float(proj.adjust_y)
    p = tv - o[None, None, :]
    a = p @ nv
    asafe = np.maximum(a, 1e-20)
    px = axp + sx * ((p @ uv) / asafe)
    py = ayp + sy * ((p @ vv) / asafe)
    front = np.all(a > 0, 1)
    x0 = np.ceil(np.clip(px.min(1) - .5, 0, 959)).astype(np.int64)
    x1 = np.floor(np.clip(px.max(1) + .5, 0, 959)).astype(np.int64)
    y0 = np.ceil(np.clip(py.min(1) - .5, 0, 539)).astype(np.int64)
    y1 = np.floor(np.clip(py.max(1) + .5, 0, 539)).astype(np.int64)
    ok = front & (x1 >= x0) & (y1 >= y0)
    nx, ny = (x1 - x0 + 1)[ok], (y1 - y0 + 1)[ok]
    # enumerate real bbox pairs (cap at span 32 both axes)
    cap = 32
    nx, ny = np.minimum(nx, cap), np.minimum(ny, cap)
    cnt = nx * ny
    off = np.concatenate([[0], np.cumsum(cnt)])
    tot = int(off[-1])
    log(f"real dragon pairs (span<=32): {tot / 1e6:.1f}M from {ok.sum()} tris")
    # vectorized expansion
    tri_of = np.repeat(np.arange(ok.sum()), cnt)
    within = np.arange(tot) - np.repeat(off[:-1], cnt)
    dx = within % np.repeat(nx, cnt)
    dy = within // np.repeat(nx, cnt)
    pix_np = ((np.repeat(y0[ok], cnt) + dy) * 960
              + np.repeat(x0[ok], cnt) + dx).astype(np.int32)
    bits_np = rng.integers(0, 2**30, tot).astype(np.int32)
    tid_np = tri_of.astype(np.int32)
    idx = jnp.asarray(pix_np)
    val = jnp.asarray(bits_np)
    tid = jnp.asarray(tid_np)
    log(f"two-pass zbuf REAL dragon dist E={tot / 1e6:.1f}M: "
        f"{timed_sync(jax.jit(two_pass), idx, val, tid):.2f} ms")

    def one_pass(i, v):
        return jnp.full((npix,), 2**31 - 1, jnp.int32).at[i].min(
            v, mode="drop")

    log(f"one-pass scatter-min REAL dist E={tot / 1e6:.1f}M: "
        f"{timed_sync(jax.jit(one_pass), idx, val):.2f} ms")


if __name__ == "__main__":
    main()
