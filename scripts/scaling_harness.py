#!/usr/bin/env python
"""Virtual-mesh scaling harness: rays/s for the sharded render + train step
at 1/2/4/8 devices, written to SCALING_r02.json.

Caveat (recorded in the artifact): virtual CPU devices share the host's
cores, so absolute rays/s does NOT scale here — what this measures is that
the sharded program (shard_map + collectives) runs correctly at every mesh
size and what overhead the sharding machinery adds vs a single device
running the same total work. Real ICI scaling efficiency needs a pod.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(fn, *args, iters=3):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import optax

    from cpp_cuda_raytracer_dev_tpu import (Camera, RenderConfig, Scene,
                                            SceneObject, Triangles)
    from cpp_cuda_raytracer_dev_tpu.parallel.mesh import make_mesh
    from cpp_cuda_raytracer_dev_tpu.parallel.render_pjit import (
        make_train_step, render_sharded)
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    res_h, res_w = 128, 256
    tris = Triangles.from_vertices(dragon_class_mesh(n_tris))
    scene = Scene.create([SceneObject.create(tris)])
    camera = Camera.create(res_w, res_h, pos=[0., 0., -3.],
                           look_at=[0., 0., 0.], up=[0., 1., 0.],
                           film_h=0.024, focal=0.03)
    config = RenderConfig(method="fixed", chunk=2048)
    rays = res_h * res_w

    results = []
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n)
        fwd = jax.jit(lambda s, c: render_sharded(s, c, config,
                                                  mesh).radiance)
        t_f = timed(fwd, scene, camera)

        opt = optax.sgd(1e-3)
        params = {"scene": scene, "camera": camera}
        st = opt.init(params)
        target = jnp.zeros((res_h, res_w, 3), jnp.float32)
        step = jax.jit(make_train_step(opt, config, mesh))
        jax.block_until_ready(step(params, st, target))
        t0 = time.perf_counter()
        out = step(params, st, target)
        jax.block_until_ready(out)
        t_s = time.perf_counter() - t0

        row = dict(devices=n, fwd_ms=t_f * 1e3, step_ms=t_s * 1e3,
                   rays_per_s=rays / t_f,
                   rays_per_s_per_device=rays / t_f / n)
        log(f"n={n}: fwd {t_f*1e3:8.2f} ms  step {t_s*1e3:8.2f} ms  "
            f"{rays/t_f:.3e} rays/s")
        results.append(row)

    base = results[0]["fwd_ms"]
    artifact = {
        "note": ("virtual CPU mesh: devices share 2 host cores, so "
                 "rays/s cannot scale with n; this validates the sharded "
                 "program + measures sharding overhead (fwd_ms vs 1-dev "
                 "fwd_ms at equal total work). Real ICI efficiency needs "
                 "a pod."),
        "scene_tris": n_tris, "res": [res_h, res_w],
        "method": config.method,
        "results": results,
        "overhead_vs_1dev": [r["fwd_ms"] / base for r in results],
    }
    with open("/root/repo/SCALING_r02.json", "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact["results"]))


if __name__ == "__main__":
    main()
