#!/usr/bin/env python
"""Virtual-mesh scaling harness, strong + weak variants, written to
SCALING_r05.json.

Strong: equal TOTAL work at 1/2/4/8 devices (r02 form — on shared host
cores "2 devices" can even come out faster than 1, which is XLA
partitioning noise, not sharding overhead; VERDICT r2 weak #3).
Weak: constant work PER DEVICE (fixed band height, total image grows with
n) — on shared cores the ideal is time ∝ n (total work grows n-fold while
core count stays fixed), so normalized step time step_ms/(n * 1-dev
step_ms) isolates the collective/partitioning overhead from core
contention: values near 1.0 mean the sharding machinery adds ~nothing.

Caveat (recorded in the artifact): virtual CPU devices share the host's
cores; real ICI scaling efficiency needs a pod.
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
    tris = Triangles.from_vertices(dragon_class_mesh(n_tris))
    scene = Scene.create([SceneObject.create(tris)])
    config = RenderConfig(method="fixed", chunk=2048)

    def run(res_h, res_w, n):
        camera = Camera.create(res_w, res_h, pos=[0., 0., -3.],
                               look_at=[0., 0., 0.], up=[0., 1., 0.],
                               film_h=0.024, focal=0.03)
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
        t_s = timed(step, params, st, target)
        return t_f, t_s

    res_w, band = 256, 32
    strong, weak = [], []
    for n in (1, 2, 4, 8):
        # strong: equal total work (res_h = 8 bands always)
        t_f, t_s = run(band * 8, res_w, n)
        rays = band * 8 * res_w
        strong.append(dict(devices=n, fwd_ms=t_f * 1e3, step_ms=t_s * 1e3,
                           rays_per_s=rays / t_f))
        # weak: constant per-device work (one band per device)
        t_fw, t_sw = run(band * n, res_w, n)
        weak.append(dict(devices=n, fwd_ms=t_fw * 1e3, step_ms=t_sw * 1e3,
                         rays_total=band * n * res_w))
        log(f"n={n}: strong fwd {t_f*1e3:8.2f} step {t_s*1e3:8.2f} | "
            f"weak fwd {t_fw*1e3:8.2f} step {t_sw*1e3:8.2f} ms")

    sbase, wbase = strong[0]["step_ms"], weak[0]["step_ms"]
    artifact = {
        "efficiency_measurable": False,
        "note": ("virtual CPU mesh: devices share 2 host cores; real ICI "
                 "efficiency needs a pod. weak_norm = step_ms / (n * "
                 "1-dev step_ms) with constant per-device work — near "
                 "1.0 means the sharding machinery (shard_map + psum) "
                 "adds ~no overhead beyond the n-fold total work."),
        "parsed": ("NO number in this file is an ICI scaling-efficiency "
                   "measurement (the >=85% BASELINE bar remains "
                   "unmeasured: single-chip environment). strong/weak "
                   "rows show only that sharded programs compile and "
                   "run; their ratios are 2-core host-scheduler noise."),
        "scene_tris": n_tris, "res_w": res_w, "band_h": band,
        "method": config.method,
        "strong": strong,
        "weak": weak,
        "strong_overhead_vs_1dev": [r["step_ms"] / sbase for r in strong],
        "weak_norm": [r["step_ms"] / (r["devices"] * wbase) for r in weak],
    }
    with open("/root/repo/SCALING_r05.json", "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"strong_overhead": artifact["strong_overhead_vs_1dev"],
                      "weak_norm": artifact["weak_norm"]}))


if __name__ == "__main__":
    main()
