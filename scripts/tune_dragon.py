#!/usr/bin/env python
"""Sweep intersect configs on the dragon-class scene (one process, one
transfer of the triangle data per leaf size). Prints one line per config to
stderr as it goes, so partial results survive a hang."""

from __future__ import annotations

import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from cpp_cuda_raytracer_dev_tpu import (Camera, RenderConfig, Scene,
                                            SceneObject, Triangles)
    from cpp_cuda_raytracer_dev_tpu.accel.traverse import ClusterAccel
    from cpp_cuda_raytracer_dev_tpu.models.renderer import render
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    w, h = 960, 540
    tv = dragon_class_mesh(n_tris)
    tris = Triangles.from_vertices(tv)
    scene = Scene.create([SceneObject.create(tris)])
    camera = Camera.create(w, h, pos=[0.0, 0.0, -3.0],
                           look_at=[0.0, 0.0, 0.0], up=[0.0, 1.0, 0.0],
                           film_h=0.024, focal=0.055)
    num_rays = w * h
    t0 = time.perf_counter()
    jax.block_until_ready(scene.objects[0].tris.p1)
    log(f"scene transfer+prep: {time.perf_counter() - t0:.1f}s")

    accels = {}
    for leaf in (128, 64):
        t0 = time.perf_counter()
        a = ClusterAccel.build(tris, leaf_size=leaf)
        jax.block_until_ready(a.geom_t)
        accels[leaf] = a
        log(f"accel leaf={leaf}: {a.num_clusters} clusters, "
            f"{time.perf_counter() - t0:.1f}s")

    configs = [
        ("pallas",  128, 8, 128, 48),
        ("pallas",  128, 16, 64, 48),
        ("pallas2", 128, 8, 128, 48),
        ("pallas2", 128, 16, 64, 48),
        ("pallas2", 128, 16, 64, 64),
        ("pallas2", 64, 16, 64, 64),
        ("pallas2", 64, 8, 128, 64),
        ("pallas2", 64, 16, 64, 96),
    ]
    results = []
    for method, leaf, th, tw, k in configs:
        tag = f"{method} L={leaf} tile={th}x{tw} K={k}"
        try:
            cfg = RenderConfig(method=method, leaf_size=leaf, tile_h=th,
                               tile_w=tw, max_candidates=k)
            accel = (accels[leaf],)
            fwd = jax.jit(lambda s, c, cfg=cfg, accel=accel:
                          render(s, c, cfg, accel).hit_tri)
            t0 = time.perf_counter()
            out = jax.block_until_ready(fwd(scene, camera))
            compile_s = time.perf_counter() - t0
            for _ in range(2):
                jax.block_until_ready(fwd(scene, camera))
            t0 = time.perf_counter()
            iters = 10
            for _ in range(iters):
                out = fwd(scene, camera)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / iters
            hit = float(jnp.mean((out >= 0).astype(jnp.float32)))
            log(f"{tag}: {dt * 1e3:.2f} ms = {1 / dt:.1f} FPS = "
                f"{num_rays / dt:.3e} rays/s  hit={hit:.3f} "
                f"(compile {compile_s:.0f}s)")
            results.append((tag, dt))
        except Exception as e:
            log(f"{tag}: FAILED {str(e)[:200]}")
    best = min(results, key=lambda r: r[1]) if results else None
    if best:
        log(f"BEST: {best[0]} {best[1] * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
