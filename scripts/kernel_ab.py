#!/usr/bin/env python
"""A/B the gen-5 kernel options on chip at dragon scale with honest
timing: esub (entry sub-slice early exit) x use_mxu (MXU HIGHEST dots),
plus chunk size. Reports kernel-alone ms, end-to-end intersect ms, and
sampled oracle agreement for each variant."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import dataclasses
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
    from cpp_cuda_raytracer_dev_tpu.models.renderer import trace_rays
    from cpp_cuda_raytracer_dev_tpu.ops.pallas.bin_kernel2 import (
        pallas_bin_intersect2)
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh
    from cpp_cuda_raytracer_dev_tpu.utils.profiling import device_time

    n_tris = 800_000
    w, h = 960, 540
    tv = dragon_class_mesh(n_tris)
    tris = Triangles.from_vertices(tv)
    camera = Camera.create(w, h, pos=[0., 0., -3.], look_at=[0., 0., 0.],
                           up=[0., 1., 0.], film_h=0.024, focal=0.055)
    o = jnp.asarray(camera.pos)
    rmd = jnp.asarray(camera.ray_directions())
    proj = camera.projection()

    # oracle sample for agreement
    rng = np.random.default_rng(0)
    idx = rng.choice(w * h, 4096, replace=False)
    from cpp_cuda_raytracer_dev_tpu.utils.config import RenderConfig as RC
    from cpp_cuda_raytracer_dev_tpu.models.scene import (Scene,
                                                         SceneObject)
    scene = Scene.create([SceneObject.create(tris)])
    sub = jnp.asarray(np.asarray(rmd)[idx])
    tri_ref = np.asarray(trace_rays(
        scene, o, sub, RC(method="fixed", chunk=2048)).tri)

    for chunk in (512, 1024):
        th = tw = 16
        cfg0 = RenderConfig(method="bin", tile_h=th, tile_w=tw,
                            bin_chunk=chunk)
        e_cap = int(n_tris * cfg0.bin_e_factor) + 8192
        e_cap = -(-e_cap // chunk) * chunk
        hp, wp = (-h) % th, (-w) % tw
        h2, w2 = h + hp, w + wp
        n_tx = w2 // tw
        n_tiles = (h2 // th) * n_tx
        binned = jax.jit(functools.partial(
            bin_triangles, proj, o, tris.p1, tris.e1, tris.e2,
            h2, w2, th, tw, e_cap=e_cap, chunk=chunk))()
        v = jnp.stack([tris.p1, tris.p1 + tris.e1, tris.p1 + tris.e2],
                      axis=1)
        bmin = jnp.min(v.reshape(-1, 3), axis=0)
        bmax = jnp.max(v.reshape(-1, 3), axis=0)
        rays = jax.jit(lambda: _ray_table(
            proj, o, bmin, bmax, n_tiles, n_tx, th, tw, 400.0))()

        for esub in (1, 4) if chunk == 512 else (4, 8):
            for mxu in (False,):   # MXU K=3 dot: Mosaic compile FAIL (r4)
                fk = jax.jit(lambda pr_, esub=esub:
                             pallas_bin_intersect2(
                                 binned.item_tile, binned.item_block,
                                 pr_, rays, binned.geom,
                                 n_tiles=n_tiles, p=th * tw,
                                 n_items=binned.item_tile.shape[0],
                                 chunk=chunk, esub=esub))
                try:
                    dt = device_time(lambda i: fk(
                        binned.qstep[None] + np.float32(i) * 1e-20))
                except Exception as ex:  # noqa: BLE001
                    log(f"c{chunk} esub{esub} mxu{int(mxu)}: FAIL "
                        f"{type(ex).__name__} {str(ex)[:120]}")
                    continue
                _, _, steps = fk(binned.qstep[None])
                s = np.asarray(steps)
                cfg = dataclasses.replace(cfg0, bin_esub=esub)
                fe = jax.jit(lambda o_, cfg=cfg: intersect_binned(
                    o_, rmd, tris, proj, cfg, h, w))
                dte = device_time(
                    lambda i: fe(o + np.float32(i) * 1e-7).t)
                hit = fe(o)
                agree = float(np.mean(np.asarray(hit.tri)[idx] == tri_ref))
                log(f"c{chunk} esub{esub} mxu{int(mxu)}: "
                    f"kernel {dt*1e3:6.2f} ms  e2e {dte*1e3:6.2f} ms  "
                    f"agree {agree:.4f}  mt_sub_mean {s[:, 0].mean():.2f}")


if __name__ == "__main__":
    main()
