#!/usr/bin/env python
"""Sweep mt_precision (and optionally tile/sub shapes) for the v2 kernel on
the dragon-class scene: time + oracle agreement per config. The kernel's MT
contraction only *orders* hits (exact t re-derived in shade), but acceptance
(hit/miss) also rides the contraction, so precision drops must be validated
against the brute oracle, not just eyeballed."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.block_until_ready(jnp.ones((8,)))
    log("probe ok")

    from cpp_cuda_raytracer_dev_tpu import (Camera, RenderConfig, Scene,
                                            SceneObject, Triangles)
    from cpp_cuda_raytracer_dev_tpu.accel.traverse import (
        ClusterAccel, intersect_clustered_pallas_v2)
    from cpp_cuda_raytracer_dev_tpu.models.renderer import trace_rays
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    w, h = 960, 540
    tv = dragon_class_mesh(n_tris)
    tris = Triangles.from_vertices(tv)
    scene = Scene.create([SceneObject.create(tris)])
    camera = Camera.create(w, h, pos=[0., 0., -3.], look_at=[0., 0., 0.],
                           up=[0., 1., 0.], film_h=0.024, focal=0.055)
    accel = ClusterAccel.build(tris, leaf_size=128)
    jax.block_until_ready(accel.geom_t)
    accel64 = ClusterAccel.build(tris, leaf_size=64)
    jax.block_until_ready(accel64.geom_t)
    log("accel ready")

    o = jnp.asarray(camera.pos)
    rmd = jnp.asarray(camera.ray_directions())

    # oracle on a sample of rays
    rng = np.random.default_rng(0)
    idx = rng.choice(w * h, 8192, replace=False)
    sub = jnp.asarray(np.asarray(rmd)[idx])
    ref_cfg = RenderConfig(method="fixed")
    hit_ref = trace_rays(scene, camera.pos, sub, ref_cfg)
    tri_ref = np.asarray(hit_ref.tri)
    jax.block_until_ready(hit_ref.t)
    log("oracle ready")

    # (leaf, th, tw, K, max_groups, sub_h, sub_w, precision)
    configs = [
        (128, 32, 32, 48, 24, 16, 32, "highest"),   # r1 baseline
        (128, 32, 32, 48, 24, 16, 16, "highest"),
        (128, 32, 32, 48, 24, 8, 32, "highest"),
        (128, 32, 32, 48, 24, 8, 16, "highest"),
        (128, 32, 32, 48, 24, 0, 0, "highest"),
        (128, 16, 32, 32, 24, 8, 16, "highest"),
        (128, 16, 16, 32, 24, 8, 16, "highest"),
        (64, 32, 32, 96, 48, 16, 32, "highest"),
        (64, 32, 32, 96, 48, 8, 16, "highest"),
        (64, 16, 32, 64, 48, 8, 16, "highest"),
    ]

    for leaf, th, tw, kk, mg, sh2, sw2, prec in configs:
        acc = accel if leaf == 128 else accel64
        cfg = RenderConfig(method="pallas2", leaf_size=leaf, tile_h=th,
                           tile_w=tw, max_candidates=kk, max_groups=mg,
                           sub_h=sh2, sub_w=sw2, mt_precision=prec,
                           escalate_tiles=0)
        fn = jax.jit(lambda o_, d_, c=cfg, a=acc: (
            intersect_clustered_pallas_v2(o_, d_, a, c, h, w)))
        try:
            hit = jax.block_until_ready(fn(o, rmd))
        except Exception as e:
            log(f"{th}x{tw} K={kk} sub={sh2}x{sw2} {prec}: FAIL {e}")
            continue
        for _ in range(2):
            jax.block_until_ready(fn(o, rmd))
        t0 = time.perf_counter()
        out = None
        for _ in range(10):
            out = fn(o, rmd)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 10
        agree = float(np.mean(np.asarray(hit.tri)[idx] == tri_ref))
        log(f"{th}x{tw} K={kk} sub={sh2}x{sw2} prec={prec}: "
            f"{dt*1e3:7.2f} ms  agree={agree:.4f}")


if __name__ == "__main__":
    main()
