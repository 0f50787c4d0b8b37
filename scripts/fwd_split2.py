#!/usr/bin/env python
"""TRUE incremental forward pipeline split at the tuned 16x16/c512 config:
trace -> +shade -> +compose -> full render, plus bwd increments. Deltas
between consecutive rows = stage cost. Uses the r4 batch-delta timing
(utils.profiling.device_time) — the old block_until_ready loop measured
dispatch, not compute, on the tunneled runtime."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    _ = float(jnp.sum(jnp.ones((8,))))
    log("probe ok")

    from cpp_cuda_raytracer_dev_tpu import (Camera, RenderConfig, Scene,
                                            SceneObject, Triangles)
    from cpp_cuda_raytracer_dev_tpu.models.renderer import (render,
                                                            shade_hits,
                                                            trace_rays)
    from cpp_cuda_raytracer_dev_tpu.ops.shade import compose_framebuffer
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh
    from cpp_cuda_raytracer_dev_tpu.utils.profiling import device_time

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

    def po(i):
        return o + np.float32(i) * 1e-7

    def f_trace(o_):
        return trace_rays(scene, o_, rmd, cfg, None, h, w, proj=proj).t

    def f_shade(o_):
        hit = trace_rays(scene, sg(o_), rmd, cfg, None, h, w,
                         proj=sg(proj))
        rad, nrm, pnt, m = shade_hits(scene, o_, rmd, hit, cfg)
        return rad

    def f_compose(o_):
        hit = trace_rays(scene, sg(o_), rmd, cfg, None, h, w,
                         proj=sg(proj))
        rad, nrm, pnt, m = shade_hits(scene, o_, rmd, hit, cfg)
        img = compose_framebuffer(rad, m, cfg.background_rgb)
        return jnp.where(m[..., None], rad, 0.0), img

    prev = 0.0
    for name, fn in [("trace", f_trace), ("trace+shade", f_shade),
                     ("  +compose", f_compose)]:
        f = jax.jit(fn)
        dt = device_time(lambda i, f=f: f(po(i)))
        log(f"{name:14s}: {dt*1e3:7.2f} ms (+{(dt-prev)*1e3:6.2f})")
        prev = dt

    fr = jax.jit(lambda c_: render(scene, c_, cfg).radiance)

    def pc(i):
        return camera.replace(pos=camera.pos + np.float32(i) * 1e-7)

    t_full = device_time(lambda i: fr(pc(i)))
    log(f"{'render full':14s}: {t_full*1e3:7.2f} ms "
        f"(+{(t_full-prev)*1e3:6.2f})")

    wgt = jnp.linspace(0.3, 1.7, w * h * 3).reshape(h, w, 3)

    def loss(s_, c_):
        return jnp.mean(render(s_, c_, cfg).radiance * wgt)

    g_all = jax.jit(jax.grad(loss, argnums=(0, 1)))
    t_fb = device_time(lambda i: g_all(scene, pc(i)))
    log(f"{'fwd+bwd':14s}: {t_fb*1e3:7.2f} ms (bwd inc "
        f"{(t_fb-t_full)*1e3:.2f})")

    # grads w.r.t. scene only (camera grads ride the same shade path)
    g_s = jax.jit(jax.grad(loss, argnums=0))
    t_fbs = device_time(lambda i: g_s(scene, pc(i)))
    log(f"{'fwd+bwd scene':14s}: {t_fbs*1e3:7.2f} ms")

    # gather-VJP A/B: default scatter path vs the sorted/segment-sum path
    import dataclasses
    cfg2 = dataclasses.replace(cfg, sorted_scatter=False)

    def loss2(s_, c_):
        return jnp.mean(render(s_, c_, cfg2).radiance * wgt)

    g2 = jax.jit(jax.grad(loss2, argnums=0))
    t2 = device_time(lambda i: g2(scene, pc(i)))
    log(f"{'fwd+bwd xla-scatter':14s}: {t2*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
