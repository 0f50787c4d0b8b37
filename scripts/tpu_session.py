#!/usr/bin/env python
"""One consolidated TPU measurement session (run when the tunnel is
healthy; attach once, measure everything, exit cleanly).

Stages: device probe -> scene/accel build + transfer -> config sweep
(pallas2 tile/K/hier-cull variants, all AOT-verified shapes) -> oracle
validation on sampled rays -> fwd and fwd+bwd timing of the best config.
Logs each result line immediately (stderr, flushed) so a mid-session hang
still leaves data. SIGTERM triggers sys.exit so the JAX client detaches
cleanly (a SIGKILLed attached client wedges the remote chip for ~45 min).
"""

from __future__ import annotations

import json
import signal
import sys
import threading
import time

sys.path.insert(0, "/root/repo")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    signal.signal(signal.SIGTERM, lambda *_: sys.exit(143))

    import jax
    import jax.numpy as jnp

    probe_ok = threading.Event()
    threading.Thread(
        target=lambda: (jax.block_until_ready(jnp.ones((8,))),
                        probe_ok.set()),
        daemon=True).start()
    if not probe_ok.wait(timeout=120.0):
        log("PROBE FAILED: chip wedged; aborting before attach deepens")
        import os
        os._exit(3)
    log("probe ok")

    from cpp_cuda_raytracer_dev_tpu import (Camera, RenderConfig, Scene,
                                            SceneObject, Triangles)
    from cpp_cuda_raytracer_dev_tpu.accel.traverse import ClusterAccel
    from cpp_cuda_raytracer_dev_tpu.models.renderer import render, trace_rays
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    w, h = 960, 540
    num_rays = w * h
    tv = dragon_class_mesh(n_tris)
    tris = Triangles.from_vertices(tv)
    scene = Scene.create([SceneObject.create(tris)])
    camera = Camera.create(w, h, pos=[0., 0., -3.], look_at=[0., 0., 0.],
                           up=[0., 1., 0.], film_h=0.024, focal=0.055)
    t0 = time.perf_counter()
    accel = (ClusterAccel.build(tris, leaf_size=128),)
    jax.block_until_ready(accel[0].geom_t)
    log(f"accel: {accel[0].num_clusters} clusters, "
        f"transfer+build {time.perf_counter() - t0:.1f}s")

    def bench_cfg(cfg, tag, iters=10):
        fwd = jax.jit(lambda s, c: render(s, c, cfg, accel).hit_tri)
        t0 = time.perf_counter()
        out = jax.block_until_ready(fwd(scene, camera))
        cs = time.perf_counter() - t0
        for _ in range(2):
            jax.block_until_ready(fwd(scene, camera))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(scene, camera)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        hit = float(jnp.mean((out >= 0).astype(jnp.float32)))
        log(f"{tag}: {dt*1e3:.2f} ms = {1/dt:.1f} FPS = "
            f"{num_rays/dt:.3e} rays/s hit={hit:.3f} (compile {cs:.0f}s)")
        return dt

    sweep = [
        ("16x64 K48 flat", dict(tile_h=16, tile_w=64, max_candidates=48)),
        ("16x64 K48 hier", dict(tile_h=16, tile_w=64, max_candidates=48,
                                max_groups=24)),
        ("16x64 K64 hier", dict(tile_h=16, tile_w=64, max_candidates=64,
                                max_groups=24)),
        ("32x32 K48 hier", dict(tile_h=32, tile_w=32, max_candidates=48,
                                max_groups=24)),
        ("8x64 K48 hier", dict(tile_h=8, tile_w=64, max_candidates=48,
                               max_groups=24)),
        ("16x128 K48 hier", dict(tile_h=16, tile_w=128, max_candidates=48,
                                 max_groups=24)),
    ]
    results = {}
    for tag, kw in sweep:
        try:
            cfg = RenderConfig(method="pallas2", leaf_size=128, **kw)
            results[tag] = (bench_cfg(cfg, tag), cfg)
        except Exception as e:
            log(f"{tag}: FAILED {str(e)[:200]}")

    if not results:
        log("no config succeeded")
        return
    best_tag = min(results, key=lambda k: results[k][0])
    best_cfg = results[best_tag][1]
    log(f"BEST: {best_tag}")

    # oracle agreement on sampled rays
    rmd = camera.ray_directions()
    hit_g = trace_rays(scene, jnp.asarray(camera.pos), jnp.asarray(rmd),
                       best_cfg, accel, h, w)
    import numpy as np
    idx = np.random.default_rng(0).choice(num_rays, 2048, replace=False)
    ref_cfg = RenderConfig(method="fixed", chunk=2048)
    hit_f = trace_rays(scene, jnp.asarray(camera.pos),
                       jnp.asarray(rmd)[idx], ref_cfg)
    agree = float(np.mean(np.asarray(hit_g.tri)[idx]
                          == np.asarray(hit_f.tri)))
    log(f"oracle agreement: {agree:.4f}")

    # fwd+bwd
    wgt = jnp.linspace(0.3, 1.7, num_rays * 3).reshape(h, w, 3)

    def loss(s, c):
        return jnp.mean(render(s, c, best_cfg, accel).radiance * wgt)

    fb = jax.jit(jax.grad(loss, argnums=(0, 1)))
    t0 = time.perf_counter()
    jax.block_until_ready(fb(scene, camera))
    log(f"fwd+bwd compile {time.perf_counter()-t0:.0f}s")
    for _ in range(2):
        jax.block_until_ready(fb(scene, camera))
    t0 = time.perf_counter()
    out = None
    for _ in range(10):
        out = fb(scene, camera)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10
    log(f"fwd+bwd: {dt*1e3:.2f} ms = {1/dt:.1f} FPS = "
        f"{num_rays/dt:.3e} rays/s "
        f"(vs baseline {num_rays/dt/5.184e7:.2f}x)")
    print(json.dumps({"best": best_tag, "fwd_bwd_ms": dt * 1e3,
                      "agree": agree}))


if __name__ == "__main__":
    main()
