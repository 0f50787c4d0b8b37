#!/usr/bin/env python
"""Precise stage breakdown of the current flagship forward path at dragon
scale: raygen+tile, cull, boxes prep, kernel, escalation delta, decode,
untile, shade, compose. Each stage timed as its own jit block."""

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

    jax.block_until_ready(jnp.ones((8,)))
    log("probe ok")

    from cpp_cuda_raytracer_dev_tpu import (Camera, RenderConfig, Scene,
                                            SceneObject, Triangles)
    from cpp_cuda_raytracer_dev_tpu.accel import traverse as tv
    from cpp_cuda_raytracer_dev_tpu.models.renderer import render_rays
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    w, h = 960, 540
    tv_pts = dragon_class_mesh(n_tris)
    tris = Triangles.from_vertices(tv_pts)
    scene = Scene.create([SceneObject.create(tris)])
    camera = Camera.create(w, h, pos=[0., 0., -3.], look_at=[0., 0., 0.],
                           up=[0., 1., 0.], film_h=0.024, focal=0.055)
    accel = tv.ClusterAccel.build(tris, leaf_size=128)
    jax.block_until_ready(accel.geom_t)
    log("accel ready")

    cfg = RenderConfig(method="pallas2", leaf_size=128, tile_h=32,
                       tile_w=32, max_candidates=48, max_groups=24,
                       sub_h=16, sub_w=32)
    o = jnp.asarray(camera.pos)
    th, tw, sh, sw = cfg.tile_h, cfg.tile_w, cfg.sub_h, cfg.sub_w
    k = min(cfg.max_candidates, accel.num_clusters)

    # stage 0: raygen
    f_raygen = jax.jit(lambda c: c.ray_directions())
    rmd = jax.block_until_ready(f_raygen(camera))
    t_raygen = timed(f_raygen, camera)
    log(f"raygen:       {t_raygen*1e3:7.2f} ms")

    # stage 1: tile
    f_tile = jax.jit(lambda d: tv._tile_rays(d, h, w, th, tw, sh, sw)[0])
    tiles = jax.block_until_ready(f_tile(rmd))
    _, meta = tv._tile_rays(rmd, h, w, th, tw, sh, sw)
    t_tile = timed(f_tile, rmd)
    log(f"tile:         {t_tile*1e3:7.2f} ms   ntiles={tiles.shape[0]}")

    # stage 2: cull (hier)
    f_cull = jax.jit(lambda o_, t_: tv.cull_tiles_hier(
        o_, t_, accel, th, tw, k, cfg.group_size, cfg.max_groups, sh, sw))
    cand, count, ovf = jax.block_until_ready(f_cull(o, tiles))
    t_cull = timed(f_cull, o, tiles)
    import numpy as np
    log(f"cull:         {t_cull*1e3:7.2f} ms   mean_count="
        f"{np.asarray(count).mean():.1f} ovf_tiles="
        f"{(np.asarray(ovf) > 0).sum()}")

    # stage 3: boxes prep
    f_boxes = jax.jit(lambda o_, c_, n_: tv._candidate_boxes(
        o_, accel, c_, n_))
    boxes = jax.block_until_ready(f_boxes(o, cand, count))
    t_boxes = timed(f_boxes, o, cand, count)
    log(f"boxes:        {t_boxes*1e3:7.2f} ms")

    # stage 4: kernel only
    from cpp_cuda_raytracer_dev_tpu.ops.pallas.intersect_kernel_v2 import (
        pallas_tile_intersect_v2)
    d_tiles = tiles.transpose(0, 2, 1)
    root = jnp.concatenate([o, jnp.min(accel.bounds_min, axis=0),
                            jnp.max(accel.bounds_max, axis=0)])
    lnp = accel.geom9_t.shape[2]
    n_sub = (th // sh) * (tw // sw)

    def f_kernel(dt, c_, n_, b_):
        return pallas_tile_intersect_v2(
            dt, c_, n_, b_, root, accel.geom9_t, leaf=lnp, eps=cfg.eps,
            draw_distance=cfg.draw_distance, n_sub=n_sub,
            mt_precision=cfg.mt_precision)[0]

    jf_kernel = jax.jit(f_kernel)
    jax.block_until_ready(jf_kernel(d_tiles, cand, count, boxes))
    t_kernel = timed(jf_kernel, d_tiles, cand, count, boxes)
    log(f"kernel:       {t_kernel*1e3:7.2f} ms")

    # stage 5: full intersect with escalation off vs on
    def f_int(esc):
        c2 = RenderConfig(**{**cfg.__dict__, "escalate_tiles": esc})
        return jax.jit(lambda o_, d_: tv.intersect_clustered_pallas_v2(
            o_, d_, accel, c2, h, w))

    ji0 = f_int(0)
    jax.block_until_ready(ji0(o, rmd).t)
    t_int0 = timed(ji0, o, rmd)
    log(f"intersect e0: {t_int0*1e3:7.2f} ms  (cull+kernel+decode+untile)")
    ji1 = f_int(64)
    jax.block_until_ready(ji1(o, rmd).t)
    t_int1 = timed(ji1, o, rmd)
    log(f"intersect e64:{t_int1*1e3:7.2f} ms  (escalation delta "
        f"{(t_int1-t_int0)*1e3:.2f})")

    # stage 6: full forward (render_rays)
    def fwd(scene_, o_, d_):
        out = render_rays(scene_, o_, d_, cfg, accel=(accel,),
                          band_h=h, band_w=w)
        return out["radiance"]

    jfwd = jax.jit(fwd)
    jax.block_until_ready(jfwd(scene, o, rmd))
    t_fwd = timed(jfwd, scene, o, rmd)
    log(f"full fwd:     {t_fwd*1e3:7.2f} ms  (shade delta "
        f"{(t_fwd-t_int1-t_raygen)*1e3:.2f})")


if __name__ == "__main__":
    main()
