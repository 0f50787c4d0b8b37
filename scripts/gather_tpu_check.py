#!/usr/bin/env python
"""Validate + time the Pallas one-hot segment-sum gather VJP on the real
chip at dragon shapes (R=518k hits, T=800k tris, F=15 packed features),
against the cumsum fallback, plus end-to-end fwd+bwd step."""

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

    from cpp_cuda_raytracer_dev_tpu.ops.gather import (_bwd_cumsum,
                                                       _segment_sum_pallas)

    rng = np.random.default_rng(0)
    R, T, F = 518_000, 800_130, 15
    idx = np.sort(rng.integers(0, T, R)).astype(np.int32)
    block = rng.standard_normal((R, F)).astype(np.float32)
    idx_d = jnp.asarray(idx)
    block_d = jnp.asarray(block)

    f_pallas = jax.jit(lambda b, i: _segment_sum_pallas(b, i, T))
    f_cumsum = jax.jit(lambda b, i: _bwd_cumsum(b, i, T))

    seg_p = jax.block_until_ready(f_pallas(block_d, idx_d))
    log("pallas compiled + ran")
    seg_c = jax.block_until_ready(f_cumsum(block_d, idx_d))
    err = float(jnp.max(jnp.abs(seg_p - seg_c)))
    rel = err / float(jnp.max(jnp.abs(seg_c)))
    log(f"max abs err pallas vs cumsum: {err:.3e} (rel {rel:.3e})")

    tp = timed(f_pallas, block_d, idx_d)
    tc = timed(f_cumsum, block_d, idx_d)
    log(f"segment-sum: pallas {tp*1e3:.2f} ms   cumsum {tc*1e3:.2f} ms")

    # end-to-end fwd+bwd at dragon scale
    from cpp_cuda_raytracer_dev_tpu import (Camera, RenderConfig, Scene,
                                            SceneObject, Triangles)
    from cpp_cuda_raytracer_dev_tpu.accel.traverse import ClusterAccel
    from cpp_cuda_raytracer_dev_tpu.models.renderer import render_rays
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh

    n_tris = 800_000
    w, h = 960, 540
    tv = dragon_class_mesh(n_tris)
    tris = Triangles.from_vertices(tv)
    scene = Scene.create([SceneObject.create(tris)])
    camera = Camera.create(w, h, pos=[0., 0., -3.], look_at=[0., 0., 0.],
                           up=[0., 1., 0.], film_h=0.024, focal=0.055)
    accel = ClusterAccel.build(tris, leaf_size=128)
    jax.block_until_ready(accel.geom_t)
    log("accel ready")

    cfg = RenderConfig(method="pallas2", leaf_size=128, tile_h=32, tile_w=32,
                       max_candidates=48, max_groups=24, sub_h=16, sub_w=32)
    o = jnp.asarray(camera.pos)
    rmd = jnp.asarray(camera.ray_directions())

    def fwd(scene_, o_, d_):
        out = render_rays(scene_, o_, d_, cfg, accel=(accel,),
                          band_h=h, band_w=w)
        return jnp.sum(out["radiance"]), out

    def step(scene_, o_, d_):
        (loss, out), g = jax.value_and_grad(fwd, has_aux=True)(scene_, o_, d_)
        return loss, g

    jfwd = jax.jit(lambda s, o_, d_: fwd(s, o_, d_)[0])
    jstep = jax.jit(step)

    t_f = timed(jfwd, scene, o, rmd, iters=10)
    log(f"fwd: {t_f*1e3:.2f} ms = {1/t_f:.1f} FPS = {w*h/t_f:.3e} rays/s")
    t_s = timed(jstep, scene, o, rmd, iters=10)
    log(f"fwd+bwd: {t_s*1e3:.2f} ms = {1/t_s:.1f} FPS = {w*h/t_s:.3e} rays/s")


if __name__ == "__main__":
    main()
