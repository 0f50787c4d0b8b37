#!/usr/bin/env python
"""Per-stage cost of the bin path at dragon scale, on chip.

Prepass stages (cumulative via bin_triangles(_stage=...), deltas are the
per-stage cost): project+bbox -> expand (indicator/cumsum + itab gather)
-> sort ((key, tri) pairs) -> starts (vectorized binary search) -> full
(geometry gather + chunk-block reshape + work items). Then the gen-4
kernel alone on a frozen binned scene, and intersect_binned end-to-end.

Usage: bin_stage_prof.py [n_tris] [chunk] [tile_h] [tile_w]
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
    import functools

    import jax
    import jax.numpy as jnp

    jax.block_until_ready(jnp.ones((8,)))
    log("probe ok")

    from cpp_cuda_raytracer_dev_tpu import Camera, RenderConfig, Triangles
    from cpp_cuda_raytracer_dev_tpu.accel.binning import bin_triangles
    from cpp_cuda_raytracer_dev_tpu.accel.traverse import intersect_binned
    from cpp_cuda_raytracer_dev_tpu.ops.pallas.bin_kernel2 import (
        pallas_bin_intersect2)
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    th = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    tw = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    w, h = 960, 540
    tv = dragon_class_mesh(n_tris)
    tris = Triangles.from_vertices(tv)
    camera = Camera.create(w, h, pos=[0., 0., -3.], look_at=[0., 0., 0.],
                           up=[0., 1., 0.], film_h=0.024, focal=0.055)
    o = jnp.asarray(camera.pos)
    rmd = jnp.asarray(camera.ray_directions())
    proj = camera.projection()

    cfg = RenderConfig(method="bin", tile_h=th, tile_w=tw, bin_chunk=chunk)
    e_cap = int(n_tris * cfg.bin_e_factor) + 8192
    e_cap = -(-e_cap // chunk) * chunk
    hp, wp = (-h) % th, (-w) % tw
    h2, w2 = h + hp, w + wp
    n_tx = w2 // tw
    n_tiles = (h2 // th) * n_tx
    log(f"T={n_tris} chunk={chunk} tiles {tw}x{th} e_cap={e_cap}")

    prev = 0.0
    for stage in ["bbox", "expand", "sort", "starts", None]:
        fn = jax.jit(functools.partial(
            bin_triangles, proj, o, tris.p1, tris.e1, tris.e2,
            h2, w2, th, tw, e_cap=e_cap, chunk=chunk, _stage=stage))
        dt = timed(fn)
        log(f"prepass..{stage or 'full':7s}: {dt*1e3:7.2f} ms "
            f"(+{(dt - prev)*1e3:6.2f})")
        prev = dt

    # kernel alone on a frozen binned scene (gen-4 inverted grid)
    binned = jax.jit(functools.partial(
        bin_triangles, proj, o, tris.p1, tris.e1, tris.e2,
        h2, w2, th, tw, e_cap=e_cap, chunk=chunk))()
    jax.block_until_ready(binned)
    v = jnp.stack([tris.p1, tris.p1 + tris.e1, tris.p1 + tris.e2], axis=1)
    bmin = jnp.min(v.reshape(-1, 3), axis=0)
    bmax = jnp.max(v.reshape(-1, 3), axis=0)
    um = proj.u / proj.sx
    vm = proj.v / proj.sy
    base = proj.n - um * proj.adjust_x - vm * proj.adjust_y
    params = jnp.concatenate([o, bmin, bmax, binned.qstep[None],
                              base, um, vm])

    fk = jax.jit(lambda it_, ib_, st_, pr_, g_: pallas_bin_intersect2(
        it_, ib_, st_, pr_, g_, n_tiles=n_tiles, p=th * tw, n_tx=n_tx,
        th=th, tw=tw, n_items=binned.item_tile.shape[0], chunk=chunk,
        eps=cfg.eps, draw_distance=cfg.draw_distance))
    dt = timed(fk, binned.item_tile, binned.item_block, binned.starts,
               params, binned.geom)
    log(f"kernel alone: {dt*1e3:7.2f} ms")
    import numpy as np
    _, _, steps = fk(binned.item_tile, binned.item_block, binned.starts,
                     params, binned.geom)
    s = np.asarray(steps)
    log(f"  mt_items mean={s[:, 0].mean():.2f} items mean={s[:, 1].mean():.2f}"
        f" entries={int(binned.num_entries)} "
        f"overflow={int(binned.overflow_entries)} "
        f"n_items={binned.item_tile.shape[0]}")

    fe = jax.jit(lambda o_, d_: intersect_binned(o_, d_, tris, proj, cfg,
                                                 h, w).t)
    dt = timed(fe, o, rmd)
    log(f"end-to-end intersect_binned: {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
