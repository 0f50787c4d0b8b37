#!/usr/bin/env python
"""Honest end-to-end sweep of bin-path tile shape x entry-cap factor at
dragon scale: intersect_binned device_time + sampled oracle agreement +
entry telemetry. Decides the r4 default config."""

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

    from cpp_cuda_raytracer_dev_tpu import Camera, RenderConfig, Triangles
    from cpp_cuda_raytracer_dev_tpu.accel.traverse import intersect_binned
    from cpp_cuda_raytracer_dev_tpu.models.renderer import trace_rays
    from cpp_cuda_raytracer_dev_tpu.models.scene import Scene, SceneObject
    from cpp_cuda_raytracer_dev_tpu.utils.config import RenderConfig as RC
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh
    from cpp_cuda_raytracer_dev_tpu.utils.profiling import device_time

    n_tris = 800_000
    w, h = 960, 540
    tris = Triangles.from_vertices(dragon_class_mesh(n_tris))
    scene = Scene.create([SceneObject.create(tris)])
    camera = Camera.create(w, h, pos=[0., 0., -3.], look_at=[0., 0., 0.],
                           up=[0., 1., 0.], film_h=0.024, focal=0.055)
    o = jnp.asarray(camera.pos)
    rmd = jnp.asarray(camera.ray_directions())
    proj = camera.projection()

    rng = np.random.default_rng(0)
    idx = rng.choice(w * h, 4096, replace=False)
    sub = jnp.asarray(np.asarray(rmd)[idx])
    tri_ref = np.asarray(trace_rays(
        scene, o, sub, RC(method="fixed", chunk=2048)).tri)

    import dataclasses
    for th, tw, chunk, ef in [(16, 16, 512, 1.6), (16, 16, 512, 1.35),
                              (16, 32, 512, 1.2), (8, 32, 512, 1.6),
                              (16, 16, 1024, 1.6), (32, 32, 1024, 1.1)]:
        cfg = RenderConfig(method="bin", tile_h=th, tile_w=tw,
                           bin_chunk=chunk, bin_e_factor=ef)
        try:
            fe = jax.jit(lambda o_, cfg=cfg: intersect_binned(
                o_, rmd, tris, proj, cfg, h, w).t)
            dte = device_time(lambda i: fe(o + np.float32(i) * 1e-7))
            scfg = dataclasses.replace(cfg, with_stats=True,
                                       bin_escalate=False)
            hit, stats = jax.jit(lambda o_, cfg=scfg: intersect_binned(
                o_, rmd, tris, proj, cfg, h, w))(o)
            agree = float(np.mean(np.asarray(hit.tri)[idx] == tri_ref))
            log(f"{th:2d}x{tw:2d} c{chunk} ef{ef}: e2e {dte*1e3:6.2f} ms  "
                f"agree {agree:.4f}  entries {int(stats['entries'])}  "
                f"ovf {int(stats['overflow'])}")
        except Exception as ex:  # noqa: BLE001
            log(f"{th:2d}x{tw:2d} c{chunk} ef{ef}: FAIL "
                f"{type(ex).__name__} {str(ex)[:120]}")


if __name__ == "__main__":
    main()
