#!/usr/bin/env python
"""Per-stage cost of the bin path at dragon scale, on chip.

Prepass stages (cumulative via bin_triangles(_stage=...), deltas are the
per-stage cost): project+bbox -> expand (indicator/cumsum + itab gather)
-> sort (1.3M (key, tri) pairs) -> starts (counts scatter + cumsum) ->
full (geometry gather + chunk-block reshape). Then the kernel alone on a
frozen binned scene, and intersect_binned end-to-end.
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
    from cpp_cuda_raytracer_dev_tpu.accel.traverse import (_tile_rays,
                                                           intersect_binned)
    from cpp_cuda_raytracer_dev_tpu.ops.pallas.bin_kernel import (
        pallas_bin_intersect)
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    w, h = 960, 540
    tv = dragon_class_mesh(n_tris)
    tris = Triangles.from_vertices(tv)
    camera = Camera.create(w, h, pos=[0., 0., -3.], look_at=[0., 0., 0.],
                           up=[0., 1., 0.], film_h=0.024, focal=0.055)
    o = jnp.asarray(camera.pos)
    rmd = jnp.asarray(camera.ray_directions())
    proj = camera.projection()

    cfg = RenderConfig(method="bin", tile_h=16, tile_w=16, bin_chunk=128)
    th, tw, chunk = cfg.tile_h, cfg.tile_w, cfg.bin_chunk
    e_cap = int(n_tris * cfg.bin_e_factor) + 8192
    e_cap = -(-e_cap // chunk) * chunk
    hp, wp = (-h) % th, (-w) % tw

    prev = 0.0
    for stage in ["bbox", "expand", "sort", "starts", None]:
        fn = jax.jit(functools.partial(
            bin_triangles, proj, tris.p1, tris.e1, tris.e2,
            h + hp, w + wp, th, tw, e_cap=e_cap, chunk=chunk,
            _stage=stage))
        dt = timed(fn)
        log(f"prepass..{stage or 'full':7s}: {dt*1e3:7.2f} ms "
            f"(+{(dt - prev)*1e3:6.2f})")
        prev = dt

    # kernel alone on a frozen binned scene
    binned = jax.jit(functools.partial(
        bin_triangles, proj, tris.p1, tris.e1, tris.e2,
        h + hp, w + wp, th, tw, e_cap=e_cap, chunk=chunk))()
    jax.block_until_ready(binned)
    tiles, meta = _tile_rays(rmd, h, w, th, tw, 0, 0)
    d_tiles = tiles.transpose(0, 2, 1)
    v = jnp.stack([tris.p1, tris.p1 + tris.e1, tris.p1 + tris.e2], axis=1)
    bmin = jnp.min(v.reshape(-1, 3), axis=0)
    bmax = jnp.max(v.reshape(-1, 3), axis=0)
    origin10 = jnp.concatenate([o, bmin, bmax, binned.qstep[None]])

    for dbg in [0, 1]:
        fk = jax.jit(lambda dt_, st_, o10_, g_, dbg=dbg: pallas_bin_intersect(
            dt_, st_, o10_, g_, chunk=chunk, eps=cfg.eps,
            draw_distance=cfg.draw_distance, n_sub=1,
            mt_precision="highest", debug_mode=dbg))
        dt = timed(fk, d_tiles, binned.starts, origin10, binned.geom)
        log(f"kernel (debug={dbg}): {dt*1e3:7.2f} ms")
        if dbg == 0:
            import numpy as np
            _, _, steps = fk(d_tiles, binned.starts, origin10, binned.geom)
            s = np.asarray(steps)
            log(f"  steps mean={s[:, 0].mean():.1f} chunks "
                f"mean={s[:, 1].mean():.1f} max={s[:, 1].max()}")
            log(f"  entries={int(binned.num_entries)} "
                f"overflow={int(binned.overflow_entries)}")

    fe = jax.jit(lambda o_, d_: intersect_binned(o_, d_, tris, proj, cfg,
                                                 h, w))
    dt = timed(fe, o, rmd)
    log(f"end-to-end intersect_binned: {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
