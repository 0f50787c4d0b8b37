#!/usr/bin/env python
"""Incremental forward pipeline split at the tuned 16x16/c512 config:
trace -> +shade -> +compose -> full render, plus bwd increments and an
e_factor variant. Deltas between consecutive rows = stage cost."""

from __future__ import annotations

import dataclasses
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
    from cpp_cuda_raytracer_dev_tpu.models.renderer import (render,
                                                            shade_hits,
                                                            trace_rays)
    from cpp_cuda_raytracer_dev_tpu.ops.shade import compose_framebuffer
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh

    n_tris = 800_000
    w, h = 960, 540
    tris = Triangles.from_vertices(dragon_class_mesh(n_tris))
    scene = Scene.create([SceneObject.create(tris)])
    camera = Camera.create(w, h, pos=[0., 0., -3.], look_at=[0., 0., 0.],
                           up=[0., 1., 0.], film_h=0.024, focal=0.055)
    cfg = RenderConfig(method="bin")    # 16x16 / c512 defaults
    o = jnp.asarray(camera.pos)
    rmd = jnp.asarray(camera.ray_directions())
    proj = camera.projection()
    sg = jax.lax.stop_gradient

    def f_trace(s_, o_, d_):
        return trace_rays(s_, o_, d_, cfg, None, h, w, proj=proj).t

    def f_shade(s_, o_, d_):
        hit = trace_rays(sg(s_), sg(o_), sg(d_), cfg, None, h, w,
                         proj=sg(proj))
        rad, nrm, pnt, m = shade_hits(s_, o_, d_, hit, cfg)
        return rad

    def f_compose(s_, o_, d_):
        hit = trace_rays(sg(s_), sg(o_), sg(d_), cfg, None, h, w,
                         proj=sg(proj))
        rad, nrm, pnt, m = shade_hits(s_, o_, d_, hit, cfg)
        img = compose_framebuffer(rad, m, cfg.background_rgb)
        return jnp.where(m[..., None], rad, 0.0), img

    prev = 0.0
    for name, fn in [("trace", f_trace), ("trace+shade", f_shade),
                     ("  +compose", f_compose)]:
        dt = timed(jax.jit(fn), scene, o, rmd)
        log(f"{name:14s}: {dt*1e3:7.2f} ms (+{(dt-prev)*1e3:6.2f})")
        prev = dt

    t_full = timed(jax.jit(lambda s_, c_: render(s_, c_, cfg).radiance),
                   scene, camera)
    log(f"{'render full':14s}: {t_full*1e3:7.2f} ms "
        f"(+{(t_full-prev)*1e3:6.2f})")

    wgt = jnp.linspace(0.3, 1.7, w * h * 3).reshape(h, w, 3)

    def loss(s_, c_):
        return jnp.mean(render(s_, c_, cfg).radiance * wgt)

    t_fb = timed(jax.jit(jax.grad(loss, argnums=(0, 1))), scene, camera)
    log(f"{'fwd+bwd':14s}: {t_fb*1e3:7.2f} ms (bwd inc "
        f"{(t_fb-t_full)*1e3:.2f})")

    # tighter entry cap: sort+gather scale with the static table size
    cfg2 = dataclasses.replace(cfg, bin_e_factor=1.35)

    def f_trace2(s_, o_, d_):
        return trace_rays(s_, o_, d_, cfg2, None, h, w, proj=proj).t

    dt = timed(jax.jit(f_trace2), scene, o, rmd)
    log(f"{'trace ef1.35':14s}: {dt*1e3:7.2f} ms")

    # grads w.r.t. scene only (camera grads ride the same shade path)
    t_fbs = timed(jax.jit(jax.grad(loss, argnums=0)), scene, camera)
    log(f"{'fwd+bwd scene':14s}: {t_fbs*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
