#!/usr/bin/env python
"""Dragon-scale timing of the binning path vs pallas2: end-to-end
intersect (bin+sort+kernel+decode) plus a stage split (bin prepass alone)
and oracle agreement, across tile/chunk configs."""

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

    from cpp_cuda_raytracer_dev_tpu import (Camera, RenderConfig, Scene,
                                            SceneObject, Triangles)
    from cpp_cuda_raytracer_dev_tpu.accel.binning import bin_triangles
    from cpp_cuda_raytracer_dev_tpu.accel.traverse import intersect_binned
    from cpp_cuda_raytracer_dev_tpu.models.renderer import trace_rays
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    w, h = 960, 540
    tv = dragon_class_mesh(n_tris)
    tris = Triangles.from_vertices(tv)
    scene = Scene.create([SceneObject.create(tris)])
    camera = Camera.create(w, h, pos=[0., 0., -3.], look_at=[0., 0., 0.],
                           up=[0., 1., 0.], film_h=0.024, focal=0.055)
    o = jnp.asarray(camera.pos)
    rmd = jnp.asarray(camera.ray_directions())
    proj = camera.projection()

    # oracle sample (disk-cached: the fixed-path compile costs minutes)
    rng = np.random.default_rng(0)
    idx = rng.choice(w * h, 8192, replace=False)
    cache = f"/tmp/bin_oracle_{n_tris}_{w}x{h}.npz"
    import os
    if os.path.exists(cache):
        tri_ref = np.load(cache)["tri"]
    else:
        sub = jnp.asarray(np.asarray(rmd)[idx])
        hit_ref = trace_rays(scene, camera.pos, sub,
                             RenderConfig(method="fixed"))
        tri_ref = np.asarray(hit_ref.tri)
        np.savez(cache, tri=tri_ref)
    log("oracle ready")

    for th, tw, chunk, sh, sw in [
        (16, 16, 512, 0, 0),
        (8, 16, 512, 0, 0),
        (8, 16, 256, 0, 0),
        (16, 16, 1024, 0, 0),
        (8, 32, 512, 0, 0),
    ]:
        cfg = RenderConfig(method="bin", tile_h=th, tile_w=tw,
                           bin_chunk=chunk, sub_h=sh, sub_w=sw)
        fn = jax.jit(lambda o_, d_, c=cfg: intersect_binned(
            o_, d_, tris, proj, c, h, w))
        try:
            hit = jax.block_until_ready(fn(o, rmd))
        except Exception as e:
            log(f"{th}x{tw} c{chunk} sub{sh}x{sw}: FAIL {type(e).__name__} "
                f"{str(e)[:200]}")
            continue
        dt = timed(fn, o, rmd)
        agree = float(np.mean(np.asarray(hit.tri)[idx] == tri_ref))
        # prepass alone
        e_cap = int(n_tris * cfg.bin_e_factor) + 8192
        fb = jax.jit(lambda c=cfg: bin_triangles(
            proj, o, tris.p1, tris.e1, tris.e2, h + (-h) % th,
            w + (-w) % tw, th, tw, e_cap=e_cap, chunk=chunk).starts)
        dtb = timed(fb)
        log(f"{th}x{tw} c{chunk} sub{sh}x{sw}: total {dt*1e3:7.2f} ms "
            f"(bin prepass {dtb*1e3:6.2f}) agree={agree:.4f}")


if __name__ == "__main__":
    main()
