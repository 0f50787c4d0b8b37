#!/usr/bin/env python
"""Time the frame's stages separately on the dragon-class scene:
ray gen, frustum cull (XLA), pallas2 kernel, shading/compose."""

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

    from cpp_cuda_raytracer_dev_tpu import (Camera, RenderConfig, Scene,
                                            SceneObject, Triangles)
    from cpp_cuda_raytracer_dev_tpu.accel import traverse
    from cpp_cuda_raytracer_dev_tpu.models.renderer import render, render_rays
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh

    jax.block_until_ready(jnp.ones((8,)))
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    w, h = 960, 540
    th, tw, K = 32, 32, 48
    tv = dragon_class_mesh(n_tris)
    tris = Triangles.from_vertices(tv)
    scene = Scene.create([SceneObject.create(tris)])
    camera = Camera.create(w, h, pos=[0., 0., -3.], look_at=[0., 0., 0.],
                           up=[0., 1., 0.], film_h=0.024, focal=0.055)
    t0 = time.perf_counter()
    accel = traverse.ClusterAccel.build(tris, leaf_size=128)
    jax.block_until_ready(accel.geom_t)
    log(f"accel: {accel.num_clusters} clusters {time.perf_counter()-t0:.1f}s")
    cfg = RenderConfig(method="pallas2", leaf_size=128, tile_h=th,
                       tile_w=tw, max_candidates=K, max_groups=24)

    rmd = jnp.asarray(camera.ray_directions())
    o = jnp.asarray(camera.pos)

    # stage: ray gen
    raygen = jax.jit(lambda c: c.ray_directions())
    log(f"raygen:      {timed(raygen, camera)*1e3:7.2f} ms")

    # stage: tile + cull
    def cull(o_, d_):
        tiles, meta = traverse._tile_rays(d_, h, w, th, tw)
        return traverse.cull_tiles_hier(o_, tiles, accel, th, tw, K,
                                        cfg.group_size, cfg.max_groups)
    cullj = jax.jit(cull)
    log(f"cull:        {timed(cullj, o, rmd)*1e3:7.2f} ms")

    # stage: full intersect (cull + kernel + untile)
    def intersect(o_, d_):
        return traverse.intersect_clustered_pallas_v2(o_, d_, accel, cfg,
                                                      h, w).t
    intj = jax.jit(intersect)
    log(f"cull+kernel: {timed(intj, o, rmd)*1e3:7.2f} ms")

    # stage: whole forward
    fwd = jax.jit(lambda s, c: render(s, c, cfg, (accel,)).hit_tri)
    log(f"full fwd:    {timed(fwd, scene, camera)*1e3:7.2f} ms")

    # stage: fwd+bwd on radiance loss
    def loss(s, c):
        return jnp.mean(render(s, c, cfg, (accel,)).radiance)
    fb = jax.jit(jax.grad(loss, argnums=0))
    log(f"fwd+bwd:     {timed(fb, scene, camera)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
