#!/usr/bin/env python
"""Op-level profile of the fwd+bwd step at dragon scale: capture an XLA
trace of the grad step and print the top ops by self time."""

from __future__ import annotations

import collections
import glob
import sys
import time

sys.path.insert(0, "/root/repo")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.block_until_ready(jnp.ones((8,)))
    log("probe ok")

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
    camera = Camera.create(w, h, pos=[0., 0., -3.], look_at=[0., 0., 0.],
                           up=[0., 1., 0.], film_h=0.024, focal=0.055)
    accel = (ClusterAccel.build(tris, leaf_size=128),)
    jax.block_until_ready(accel[0].geom_t)
    cfg = RenderConfig(method="pallas2", leaf_size=128, tile_h=32, tile_w=32,
                       max_candidates=48, max_groups=24)

    def loss(s, c):
        return jnp.mean(render(s, c, cfg, accel).radiance)

    fb = jax.jit(jax.grad(loss, argnums=(0, 1)))
    jax.block_until_ready(fb(scene, camera))
    jax.block_until_ready(fb(scene, camera))
    log("compiled; tracing")

    tdir = "/tmp/xtrace"
    with jax.profiler.trace(tdir):
        for _ in range(3):
            out = fb(scene, camera)
        jax.block_until_ready(out)

    paths = glob.glob(tdir + "/**/*.xplane.pb", recursive=True)
    log(f"planes: {paths}")
    from jax.profiler import ProfileData
    data = ProfileData.from_file(paths[-1])
    tot = collections.Counter()
    cnt = collections.Counter()
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        log(f"plane: {plane.name}")
        for line in plane.lines:
            for ev in line.events:
                name = ev.name
                dur = ev.duration_ns
                tot[name] += dur
                cnt[name] += 1
    log("---- top ops by total time (3 steps) ----")
    for name, ns in tot.most_common(45):
        log(f"{ns/3e6:9.3f} ms  x{cnt[name]//3:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
