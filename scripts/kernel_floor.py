#!/usr/bin/env python
"""Decompose the v2 kernel's per-step cost at dragon scale: time the kernel
alone (no cull/decode) across debug modes — 0 full, 3 branches+trivial MT,
2 no MT at all — plus an MT-always variant via n_sub granularity. Prints
us/step for each, the decisive number for choosing between fewer-steps
(cluster pairing) and cheaper-epilogue work."""

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

    from cpp_cuda_raytracer_dev_tpu import Camera, RenderConfig, Triangles
    from cpp_cuda_raytracer_dev_tpu.accel import traverse as tv
    from cpp_cuda_raytracer_dev_tpu.ops.pallas.intersect_kernel_v2 import (
        pallas_tile_intersect_v2)
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    w, h = 960, 540
    tris = Triangles.from_vertices(dragon_class_mesh(n_tris))
    camera = Camera.create(w, h, pos=[0., 0., -3.], look_at=[0., 0., 0.],
                           up=[0., 1., 0.], film_h=0.024, focal=0.055)
    accel = tv.ClusterAccel.build(tris, leaf_size=128)
    jax.block_until_ready(accel.geom_t)
    log("accel ready")

    cfg = RenderConfig(method="pallas2", leaf_size=128, tile_h=32,
                       tile_w=32, max_candidates=48, max_groups=24,
                       sub_h=16, sub_w=32)
    o = jnp.asarray(camera.pos)
    rmd = jnp.asarray(camera.ray_directions())
    th, tw, sh, sw = cfg.tile_h, cfg.tile_w, cfg.sub_h, cfg.sub_w
    k = min(cfg.max_candidates, accel.num_clusters)
    tiles, meta = tv._tile_rays(rmd, h, w, th, tw, sh, sw)
    cand, count, _ = tv.cull_tiles_hier(
        o, tiles, accel, th, tw, k, cfg.group_size, cfg.max_groups, sh, sw)
    boxes = tv._candidate_boxes(o, accel, cand, count)
    d_tiles = tiles.transpose(0, 2, 1)
    root = jnp.concatenate([o, jnp.min(accel.bounds_min, axis=0),
                            jnp.max(accel.bounds_max, axis=0)])
    lnp = accel.geom9_t.shape[2]
    jax.block_until_ready(boxes)

    def run(debug_mode, n_sub, label):
        f = jax.jit(lambda dt, c_, n_, b_: pallas_tile_intersect_v2(
            dt, c_, n_, b_, root, accel.geom9_t, leaf=lnp, eps=cfg.eps,
            draw_distance=cfg.draw_distance, n_sub=n_sub,
            debug_mode=debug_mode, mt_precision="highest"))
        out = jax.block_until_ready(f(d_tiles, cand, count, boxes))
        steps = int(np.asarray(out[2][:, 0]).sum())
        dt = timed(f, d_tiles, cand, count, boxes)
        log(f"{label:28s}: {dt*1e3:7.2f} ms  steps={steps}  "
            f"{dt/max(steps,1)*1e9:7.0f} ns/step")
        return dt, steps

    run(0, 2, "full sub=16x32")
    run(0, 1, "full sub=off")
    run(3, 2, "branches, trivial MT")
    run(2, 2, "no MT (loop+slab+DMA)")


if __name__ == "__main__":
    main()
