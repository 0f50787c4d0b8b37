#!/usr/bin/env python
"""Round-3 tuning probes: (A) geometry-tail decomposition (take / +pad /
+transpose), (B) kernel chunk-size sweep (DMA-overhead hypothesis),
(C) projection layout probe ((T,3) inputs vs (3,T))."""

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
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.block_until_ready(jnp.ones((8,)))
    log("probe ok")

    from cpp_cuda_raytracer_dev_tpu import Camera, RenderConfig, Triangles
    from cpp_cuda_raytracer_dev_tpu.accel.binning import bin_triangles
    from cpp_cuda_raytracer_dev_tpu.accel.traverse import _tile_rays
    from cpp_cuda_raytracer_dev_tpu.models.renderer import trace_rays
    from cpp_cuda_raytracer_dev_tpu.ops.pallas.bin_kernel import (
        pallas_bin_intersect)
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh

    n_tris = 800_000
    w, h = 960, 540
    tv = dragon_class_mesh(n_tris)
    tris = Triangles.from_vertices(tv)
    from cpp_cuda_raytracer_dev_tpu import Scene, SceneObject
    scene = Scene.create([SceneObject.create(tris)])
    camera = Camera.create(w, h, pos=[0., 0., -3.], look_at=[0., 0., 0.],
                           up=[0., 1., 0.], film_h=0.024, focal=0.055)
    o = jnp.asarray(camera.pos)
    rmd = jnp.asarray(camera.ray_directions())
    proj = camera.projection()

    rng = np.random.default_rng(0)
    idx = rng.choice(w * h, 8192, replace=False)
    sub = jnp.asarray(np.asarray(rmd)[idx])
    hit_ref = trace_rays(scene, camera.pos, sub, RenderConfig(method="fixed"))
    tri_ref = np.asarray(hit_ref.tri)
    jax.block_until_ready(hit_ref.t)
    log("oracle ready")

    # ---- A: geometry-tail decomposition at realistic shapes ----
    E = 1_331_200
    chunk = 128
    T = tris.p1.shape[0]
    ftab = jnp.concatenate(
        [tris.p1, tris.e1, tris.e2,
         jnp.zeros((T, 1), jnp.float32)], axis=1)           # (T, 10)
    idx_e = jnp.asarray(rng.integers(0, T, size=E + chunk).astype(np.int32))

    def t_take(i):
        return jnp.take(ftab, i, axis=0)

    def t_blocked(i):
        return jnp.take(ftab, i, axis=0).reshape(-1, chunk, 10)

    def t_transposed(i):
        return (jnp.take(ftab, i, axis=0)
                .reshape(-1, chunk, 10).transpose(0, 2, 1))

    log(f"A take (E,10)        : {timed(jax.jit(t_take), idx_e)*1e3:7.2f} ms")
    log(f"A take+block         : {timed(jax.jit(t_blocked), idx_e)*1e3:7.2f} ms")
    log(f"A take+block+transp  : {timed(jax.jit(t_transposed), idx_e)*1e3:7.2f} ms")

    # ---- C: projection layout ----
    basis = jnp.stack([proj.n, proj.u, proj.v], axis=1)

    def proj_t3(p1, e1, e2):
        abc0 = (p1 - proj.origin[None, :]) @ basis
        dabc1 = e1 @ basis
        dabc2 = e2 @ basis
        a0 = abc0[:, 0]
        return (a0, a0 + dabc1[:, 0], a0 + dabc2[:, 0],
                abc0[:, 1] + dabc1[:, 1], abc0[:, 2] + dabc2[:, 2])

    def proj_3t(p1, e1, e2):
        bT = basis.T                                       # (3, 3)
        p = bT @ (p1 - proj.origin[None, :]).T             # (3, T)
        d1 = bT @ e1.T
        d2 = bT @ e2.T
        return (p[0], p[0] + d1[0], p[0] + d2[0],
                p[1] + d1[1], p[2] + d2[2])

    log(f"C proj (T,3) slices  : "
        f"{timed(jax.jit(proj_t3), tris.p1, tris.e1, tris.e2)*1e3:7.2f} ms")
    log(f"C proj (3,T) rows    : "
        f"{timed(jax.jit(proj_3t), tris.p1, tris.e1, tris.e2)*1e3:7.2f} ms")

    # ---- B: kernel chunk sweep (current layout) ----
    tiles, meta = _tile_rays(rmd, h, w, 16, 16, 0, 0)
    d_tiles = tiles.transpose(0, 2, 1)
    v = jnp.stack([tris.p1, tris.p1 + tris.e1, tris.p1 + tris.e2], axis=1)
    bmin = jnp.min(v.reshape(-1, 3), axis=0)
    bmax = jnp.max(v.reshape(-1, 3), axis=0)

    for ck in [128, 256, 512, 1024]:
        e_cap = int(n_tris * 1.6) + 8192
        e_cap = -(-e_cap // ck) * ck
        binned = jax.jit(functools.partial(
            bin_triangles, proj, tris.p1, tris.e1, tris.e2,
            h + meta[4], w + meta[5], 16, 16, e_cap=e_cap, chunk=ck))()
        jax.block_until_ready(binned)
        origin10 = jnp.concatenate([o, bmin, bmax, binned.qstep[None]])
        fk = jax.jit(lambda dt_, st_, o10_, g_, ck=ck: pallas_bin_intersect(
            dt_, st_, o10_, g_, chunk=ck, eps=1e-16,
            draw_distance=400.0, n_sub=1, mt_precision="highest"))
        try:
            out = jax.block_until_ready(
                fk(d_tiles, binned.starts, origin10, binned.geom))
        except Exception as e:
            log(f"B kernel c{ck}: FAIL {type(e).__name__} {str(e)[:150]}")
            continue
        dt = timed(fk, d_tiles, binned.starts, origin10, binned.geom)
        # decode agreement on the oracle sample
        t_tiles, enc_tiles, _ = out
        n_tiles = d_tiles.shape[0]
        entry = ((binned.starts[:n_tiles, None] // ck) * ck
                 + jnp.maximum(enc_tiles, 0))
        entry = jnp.minimum(entry, binned.entry_tri.shape[0] - 1)
        tri = jnp.where(enc_tiles >= 0,
                        jnp.take(binned.entry_tri, entry), -1)
        from cpp_cuda_raytracer_dev_tpu.accel.traverse import _untile
        tri_flat = np.asarray(_untile(tri, meta, h, w).reshape(-1))
        agree = float(np.mean(tri_flat[idx] == tri_ref))
        log(f"B kernel c{ck}: {dt*1e3:7.2f} ms  agree={agree:.4f}")


if __name__ == "__main__":
    main()
