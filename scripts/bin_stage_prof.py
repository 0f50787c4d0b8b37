#!/usr/bin/env python
"""Per-stage TRUE device cost of the bin path at dragon scale, on chip.

Uses utils.profiling.device_time (batch-delta, host-forced): the old
block_until_ready loop measured dispatch, not compute, on the tunneled
axon runtime (r4 methodology fix — see bench.py `bench`).

Prepass stages (cumulative via bin_triangles(_stage=...), deltas are the
per-stage cost): project+bbox -> expand (indicator/cumsum + itab gather)
-> sort ((key, tri) pairs) -> starts (vectorized binary search) -> full
(geometry gather, 12-row table). Then the ray table, the gen-5 kernel
alone on a frozen binned scene, and intersect_binned end-to-end.

Usage: bin_stage_prof.py [n_tris] [chunk] [tile_h] [tile_w]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    _ = float(jnp.sum(jnp.ones((8,))))
    log("probe ok")

    from cpp_cuda_raytracer_dev_tpu import Camera, RenderConfig, Triangles
    from cpp_cuda_raytracer_dev_tpu.accel.binning import bin_triangles
    from cpp_cuda_raytracer_dev_tpu.accel.traverse import (_ray_table,
                                                           intersect_binned)
    from cpp_cuda_raytracer_dev_tpu.ops.pallas.bin_kernel2 import (
        pallas_bin_intersect2)
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh
    from cpp_cuda_raytracer_dev_tpu.utils.profiling import device_time

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

    def perturbed_o(i):
        return o + np.float32(i) * 1e-7

    prev = 0.0
    for stage in ["bbox", "expand", "sort", "starts", None]:
        f = jax.jit(lambda o_, stage=stage: bin_triangles(
            proj, o_, tris.p1, tris.e1, tris.e2, h2, w2, th, tw,
            e_cap=e_cap, chunk=chunk, _stage=stage))
        dt = device_time(lambda i, f=f: f(perturbed_o(i)))
        log(f"prepass..{stage or 'full':7s}: {dt*1e3:7.2f} ms "
            f"(+{(dt - prev)*1e3:6.2f})")
        prev = dt

    # frozen binned scene + ray table for the kernel-alone row
    binned = jax.jit(functools.partial(
        bin_triangles, proj, o, tris.p1, tris.e1, tris.e2,
        h2, w2, th, tw, e_cap=e_cap, chunk=chunk))()
    v = jnp.stack([tris.p1, tris.p1 + tris.e1, tris.p1 + tris.e2], axis=1)
    bmin = jnp.min(v.reshape(-1, 3), axis=0)
    bmax = jnp.max(v.reshape(-1, 3), axis=0)

    frt = jax.jit(lambda o_: _ray_table(proj, o_, bmin, bmax, n_tiles,
                                        n_tx, th, tw, cfg.draw_distance))
    dt = device_time(lambda i: frt(perturbed_o(i)))
    log(f"ray table: {dt*1e3:7.2f} ms")
    rays = frt(o)

    fk = jax.jit(lambda pr_: pallas_bin_intersect2(
        binned.item_tile, binned.item_block, pr_, rays, binned.geom,
        n_tiles=n_tiles, p=th * tw, n_items=binned.item_tile.shape[0],
        chunk=chunk, eps=cfg.eps, draw_distance=cfg.draw_distance))
    dt = device_time(lambda i: fk(binned.qstep[None] + np.float32(i) * 1e-20))
    log(f"kernel alone: {dt*1e3:7.2f} ms")
    _, _, steps = fk(binned.qstep[None])
    s = np.asarray(steps)
    log(f"  mt_items mean={s[:, 0].mean():.2f} items mean={s[:, 1].mean():.2f}"
        f" entries={int(binned.num_entries)} "
        f"overflow={int(binned.overflow_entries)} "
        f"n_items={binned.item_tile.shape[0]}")

    fe = jax.jit(lambda o_: intersect_binned(o_, rmd, tris, proj, cfg,
                                             h, w).t)
    dt = device_time(lambda i: fe(perturbed_o(i)))
    log(f"end-to-end intersect_binned: {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
