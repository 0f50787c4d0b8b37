#!/usr/bin/env python
"""Per-tile dynamic-work telemetry for the pallas2 kernel at dragon scale:
distribution of candidates actually scanned (k_end) vs culled count, split
by tile kind (fully covered / silhouette / background)."""

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
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    th = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    tw = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    kk = int(sys.argv[4]) if len(sys.argv) > 4 else 48
    w, h = 960, 540
    tv = dragon_class_mesh(n_tris)
    tris = Triangles.from_vertices(tv)
    scene = Scene.create([SceneObject.create(tris)])
    camera = Camera.create(w, h, pos=[0., 0., -3.], look_at=[0., 0., 0.],
                           up=[0., 1., 0.], film_h=0.024, focal=0.055)
    accel = ClusterAccel.build(tris, leaf_size=128)
    jax.block_until_ready(accel.geom_t)
    sh2 = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    sw2 = int(sys.argv[6]) if len(sys.argv) > 6 else 0
    cfg = RenderConfig(method="pallas2", leaf_size=128, tile_h=th, tile_w=tw,
                       max_candidates=kk, max_groups=24, with_stats=True,
                       sub_h=sh2, sub_w=sw2, debug_mode=1)

    o = jnp.asarray(camera.pos)
    rmd = jnp.asarray(camera.ray_directions())
    fn = jax.jit(lambda o_, d_: intersect_clustered_pallas_v2(
        o_, d_, accel, cfg, h, w))
    t0 = time.perf_counter()
    hit, stats = jax.block_until_ready(fn(o, rmd))
    log(f"compile+run {time.perf_counter()-t0:.0f}s")
    for _ in range(2):
        jax.block_until_ready(fn(o, rmd))
    t0 = time.perf_counter()
    out = None
    for _ in range(10):
        out = fn(o, rmd)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10
    log(f"intersect: {dt*1e3:.2f} ms")

    steps = np.asarray(stats["steps"])
    mt_subs = np.asarray(stats["mt_subs"])
    count = np.asarray(stats["count"])
    n_sub = max((th // sh2) * (tw // sw2) if (sh2 and sw2) else 1, 1)
    log(f"mt_subs: sum={int(mt_subs.sum())} of steps*n_sub="
    f"{int(steps.sum())*n_sub} (active frac "
    f"{mt_subs.sum()/max(steps.sum()*n_sub,1):.2f})")

    # loop/slab/DMA floor: same config with the MT block compiled out
    cfg2 = RenderConfig(method="pallas2", leaf_size=128, tile_h=th,
                        tile_w=tw, max_candidates=kk, max_groups=24,
                        sub_h=sh2, sub_w=sw2, debug_mode=2)
    fn2 = jax.jit(lambda o_, d_: intersect_clustered_pallas_v2(
        o_, d_, accel, cfg2, h, w).t)
    jax.block_until_ready(fn2(o, rmd))
    jax.block_until_ready(fn2(o, rmd))
    t0 = time.perf_counter()
    for _ in range(10):
        out2 = fn2(o, rmd)
    jax.block_until_ready(out2)
    log(f"no-MT floor (scans all count): {(time.perf_counter()-t0)/10*1e3:.2f} ms "
        f"(count-sum {int(count.sum())})")
    tri = np.asarray(hit.tri).reshape(h, w)
    n_tiles = steps.shape[0]
    log(f"tiles={n_tiles} K={kk} tile={th}x{tw}")
    log(f"steps: mean={steps.mean():.1f} p50={np.percentile(steps,50):.0f} "
        f"p90={np.percentile(steps,90):.0f} max={steps.max()}")
    log(f"count: mean={count.mean():.1f} p50={np.percentile(count,50):.0f} "
        f"p90={np.percentile(count,90):.0f} "
        f"satK={float((count==kk).mean()):.2f}")
    # tile coverage classes
    hp, wp = (-h) % th, (-w) % tw
    cov = (tri >= 0).astype(np.float32)
    cov = np.pad(cov, ((0, hp), (0, wp)), mode="edge")
    cov_t = cov.reshape((h + hp)//th, th, (w + wp)//tw, tw).transpose(
        0, 2, 1, 3).reshape(-1, th*tw).mean(1)
    for name, m in [("covered(>=99%)", cov_t >= 0.99),
                    ("silhouette", (cov_t > 0.01) & (cov_t < 0.99)),
                    ("background", cov_t <= 0.01)]:
        if m.sum():
            log(f"{name:15s}: n={int(m.sum()):4d} steps mean="
                f"{steps[m].mean():5.1f} p90={np.percentile(steps[m],90):4.0f}"
                f" max={steps[m].max()}")
    log(f"total step-sum={int(steps.sum())} "
        f"(epilogue-equiv {steps.sum()*128*th*tw/1e9:.2f} G ray-tri pairs)")


if __name__ == "__main__":
    main()
