#!/usr/bin/env python
"""r5 kernel A/B: gen-5 (3 outputs + steps) vs gen-6 (merged output),
f32 vs bf16 acceptance, whole-tile vs per-ray-slice early exit.

All timings device_time (honest batch-delta); agreement is exact match of
the winner-triangle map vs gen-5 f32 (the flagship-validated kernel).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from cpp_cuda_raytracer_dev_tpu import Camera, Triangles
    from cpp_cuda_raytracer_dev_tpu.accel.binning import bin_triangles
    from cpp_cuda_raytracer_dev_tpu.accel.traverse import _ray_table
    from cpp_cuda_raytracer_dev_tpu.ops.pallas.bin_kernel2 import (
        pallas_bin_intersect2)
    from cpp_cuda_raytracer_dev_tpu.ops.pallas.bin_kernel3 import (
        pallas_bin_intersect3)
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh
    from cpp_cuda_raytracer_dev_tpu.utils.profiling import device_time

    tv = dragon_class_mesh(800_000)
    tris = Triangles.from_vertices(tv)
    camera = Camera.create(960, 540, pos=[0., 0., -3.],
                           look_at=[0., 0., 0.], up=[0., 1., 0.],
                           film_h=0.024, focal=0.055)
    th, tw, chunk = 16, 32, 512
    e_cap = -(-(int(800_000 * 0.55) + 8192) // chunk) * chunk
    h2, w2 = 544, 960
    n_tx = w2 // tw
    n_tiles = (h2 // th) * n_tx
    proj = camera.projection()
    o = jnp.asarray(camera.pos)
    p1 = np.asarray(tris.p1)
    v2 = p1 + np.asarray(tris.e1)
    v3 = p1 + np.asarray(tris.e2)
    bmin = jnp.asarray(np.minimum(np.minimum(p1, v2), v3).min(0))
    bmax = jnp.asarray(np.maximum(np.maximum(p1, v2), v3).max(0))

    binned = jax.jit(lambda: bin_triangles(
        proj, o, tris.p1, tris.e1, tris.e2, h2, w2, th, tw,
        e_cap=e_cap, chunk=chunk, backface_cull=True))()
    rays = jax.jit(lambda: _ray_table(proj, o, bmin, bmax, n_tiles, n_tx,
                                      th, tw, 400.0))()
    jax.block_until_ready((binned, rays))
    n_items = binned.item_tile.shape[0]
    print(f"n_items={n_items} entries={int(binned.num_entries)}",
          file=sys.stderr, flush=True)

    res = {}
    ref_tri = None

    def run(tag, fn):
        nonlocal ref_tri
        jf = jax.jit(fn)

        def call(i):
            r2 = rays.at[0, 0, 3].add(np.float32(i % 509) * 1e-6)
            t, tri = jf(r2)
            return jnp.sum(t), jnp.sum(tri)

        t0 = time.perf_counter()
        jax.block_until_ready(call(0))
        dt = device_time(call)
        tri = np.asarray(jf(rays)[1])
        if ref_tri is None:
            ref_tri = tri
            agree = 1.0
        else:
            agree = float(np.mean(tri == ref_tri))
        res[tag] = {"ms": dt * 1e3, "agree": agree}
        print(f"{tag}: {dt * 1e3:.2f} ms agree={agree:.6f} "
              f"(compile {time.perf_counter() - t0:.1f}s)",
              file=sys.stderr, flush=True)

    def gen5(r):
        t, tri, _ = pallas_bin_intersect2(
            binned.item_tile, binned.item_block, binned.qstep[None], r,
            binned.geom, n_tiles=n_tiles, p=th * tw, n_items=n_items,
            chunk=chunk)
        return t, tri

    def gen6(r, n_sub=1, mt_dtype="float32"):
        return pallas_bin_intersect3(
            binned.item_tile, binned.item_block, r, binned.geom,
            n_tiles=n_tiles, p=th * tw, n_items=n_items, chunk=chunk,
            n_sub=n_sub, mt_dtype=mt_dtype)

    run("gen5_f32", gen5)
    run("gen6_f32", lambda r: gen6(r))
    run("gen6_f32_sub4", lambda r: gen6(r, n_sub=4))
    run("gen6_f32_sub8", lambda r: gen6(r, n_sub=8))
    run("gen6_bf16", lambda r: gen6(r, mt_dtype="bfloat16"))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
