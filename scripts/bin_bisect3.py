#!/usr/bin/env python
"""Third bisect: run the bin kernel with early-exit/gates disabled
(debug_mode 1 then 2) at dragon scale and check oracle agreement, to
isolate certificate-exit vs chunk-gate vs MT failures."""
import dataclasses
import sys

sys.path.insert(0, "/root/repo")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.block_until_ready(jnp.ones((8,)))
    from cpp_cuda_raytracer_dev_tpu import (Camera, RenderConfig, Scene,
                                            SceneObject, Triangles)
    from cpp_cuda_raytracer_dev_tpu.accel.traverse import intersect_binned
    from cpp_cuda_raytracer_dev_tpu.models.renderer import trace_rays
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    w, h = 960, 540
    tv = dragon_class_mesh(n_tris)
    tris = Triangles.from_vertices(tv)
    scene = Scene.create([SceneObject.create(tris)])
    camera = Camera.create(w, h, pos=[0., 0., -3.], look_at=[0., 0., 0.],
                           up=[0., 1., 0.], film_h=0.024, focal=0.055)
    o = jnp.asarray(camera.pos)
    rmd = jnp.asarray(camera.ray_directions())
    proj = camera.projection()

    rng = np.random.default_rng(0)
    idx = rng.choice(w * h, 8192, replace=False)
    sub = jnp.asarray(np.asarray(rmd)[idx])
    hit_ref = trace_rays(scene, camera.pos, sub, RenderConfig(method="fixed"))
    tri_r = np.asarray(hit_ref.tri)
    log("oracle ready")

    for dm in (2, 1, 0):
        cfg = RenderConfig(method="bin", tile_h=16, tile_w=16,
                           bin_chunk=128, debug_mode=dm)
        hit = jax.jit(lambda o_, d_, c=cfg: intersect_binned(
            o_, d_, tris, proj, c, h, w))(o, rmd)
        tri_b = np.asarray(hit.tri)
        agree = float(np.mean(tri_b[idx] == tri_r))
        lost = int(((tri_b[idx] < 0) & (tri_r >= 0)).sum())
        log(f"debug_mode={dm}: agree={agree:.4f} lost={lost}")


if __name__ == "__main__":
    main()
