#!/usr/bin/env python
"""Forward-frame stage split at dragon scale on chip: where do the
~19 ms outside intersect_binned go? (raygen / shade / compose / untile).
Also splits fwd+bwd to isolate the backward increment."""

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

    jax.block_until_ready(jnp.ones((8,)))
    log("probe ok")

    from cpp_cuda_raytracer_dev_tpu import (Camera, RenderConfig, Scene,
                                            SceneObject, Triangles)
    from cpp_cuda_raytracer_dev_tpu.accel.traverse import intersect_binned
    from cpp_cuda_raytracer_dev_tpu.models.renderer import (render,
                                                            shade_hits,
                                                            trace_rays)
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh

    n_tris = 800_000
    w, h = 960, 540
    tv = dragon_class_mesh(n_tris)
    tris = Triangles.from_vertices(tv)
    scene = Scene.create([SceneObject.create(tris)])
    camera = Camera.create(w, h, pos=[0., 0., -3.], look_at=[0., 0., 0.],
                           up=[0., 1., 0.], film_h=0.024, focal=0.055)
    cfg = RenderConfig(method="bin")
    o = jnp.asarray(camera.pos)
    proj = camera.projection()

    t_rg = timed(jax.jit(lambda c: c.ray_directions()), camera)
    log(f"raygen                : {t_rg*1e3:7.2f} ms")

    rmd = jnp.asarray(camera.ray_directions())
    t_int = timed(jax.jit(lambda o_, d_: intersect_binned(
        o_, d_, tris, proj, cfg, h, w)), o, rmd)
    log(f"intersect_binned      : {t_int*1e3:7.2f} ms")

    hit = jax.jit(lambda o_, d_: intersect_binned(
        o_, d_, tris, proj, cfg, h, w))(o, rmd)
    jax.block_until_ready(hit)

    t_sh = timed(jax.jit(lambda s_, o_, d_, h_: shade_hits(
        s_, o_, d_, h_, cfg)), scene, o, rmd, hit)
    log(f"shade_hits            : {t_sh*1e3:7.2f} ms")

    t_full = timed(jax.jit(lambda s_, c_: render(
        s_, c_, cfg).radiance), scene, camera)
    log(f"render (fwd total)    : {t_full*1e3:7.2f} ms "
        f"(unaccounted {(t_full - t_rg - t_int - t_sh)*1e3:.2f})")

    num_rays = w * h
    wgt = jnp.linspace(0.3, 1.7, num_rays * 3).reshape(h, w, 3)

    def loss(s_, c_):
        return jnp.mean(render(s_, c_, cfg).radiance * wgt)

    t_fb = timed(jax.jit(jax.grad(loss, argnums=(0, 1))), scene, camera)
    log(f"fwd+bwd total         : {t_fb*1e3:7.2f} ms "
        f"(bwd increment {(t_fb - t_full)*1e3:.2f})")

    # shade-only bwd increment (intersect is stop-gradient)
    def loss_sh(s_, o_, d_, h_):
        rad, _, _, m = shade_hits(s_, o_, d_, h_, cfg)
        return jnp.mean(rad * wgt.reshape(-1, 3))

    t_shb = timed(jax.jit(jax.grad(loss_sh)), scene, o, rmd, hit)
    log(f"shade fwd+bwd         : {t_shb*1e3:7.2f} ms "
        f"(increment {(t_shb - t_sh)*1e3:.2f})")


if __name__ == "__main__":
    main()
