#!/usr/bin/env python
"""Certify the COMPILED (Mosaic) bin kernel under shard_map on the real
TPU chip (VERDICT r4 missing #3: all prior sharding evidence ran the
Pallas kernels in interpret mode on a CPU mesh).

A 1-device Mesh exercises the full shard_map machinery — axis context,
band windowing, collectives (degenerate), PartitionSpecs — with the
kernel compiled for the hardware. Asserts the sharded frames match the
un-sharded frame exactly and writes MULTICHIP_r05_chip.json.
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from cpp_cuda_raytracer_dev_tpu import (Camera, RenderConfig, Scene,
                                            SceneObject, Triangles)
    from cpp_cuda_raytracer_dev_tpu.models.renderer import render
    from cpp_cuda_raytracer_dev_tpu.parallel.mesh import make_mesh
    from cpp_cuda_raytracer_dev_tpu.parallel.render_pjit import (
        render_sharded, render_sharded_2d_bin)
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh

    assert jax.default_backend() == "tpu", jax.devices()
    tv = dragon_class_mesh(100_000)
    tris = Triangles.from_vertices(tv)
    scene = Scene.create([SceneObject.create(tris)])
    camera = Camera.create(512, 256, pos=[0.0, 0.0, -3.0],
                           look_at=[0.0, 0.0, 0.0], up=[0.0, 1.0, 0.0],
                           film_h=0.024, focal=0.055)
    config = RenderConfig(method="bin", backface_cull=True,
                          bin_e_factor=0.7)

    base = jax.jit(lambda s, c: render(s, c, config, None))(scene, camera)
    base_tri = np.asarray(base.hit_tri)
    base_img = np.asarray(base.image)

    results = {"backend": str(jax.devices()),
               "kernel": "bin gen-6 compiled (interpret=False on tpu)",
               "scene": "dragon-class 100k @ 512x256"}

    mesh1 = make_mesh(1)
    out1 = jax.jit(lambda s, c: render_sharded(s, c, config, mesh1))(
        scene, camera)
    results["render_sharded_mesh1"] = {
        "tri_match": float(np.mean(np.asarray(out1.hit_tri) == base_tri)),
        "image_match": float(np.mean(np.asarray(out1.image) == base_img)),
    }

    from jax.sharding import Mesh
    mesh11 = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                  ("rays", "prims"))
    out2 = jax.jit(lambda s, c: render_sharded_2d_bin(
        s, c, config, mesh11))(scene, camera)
    results["render_sharded_2d_bin_mesh1x1"] = {
        "tri_match": float(np.mean(np.asarray(out2.hit_tri) == base_tri)),
        "image_match": float(np.mean(np.asarray(out2.image) == base_img)),
    }

    ok = all(v["tri_match"] == 1.0 and v["image_match"] == 1.0
             for k, v in results.items() if isinstance(v, dict))
    results["ok"] = ok
    with open("/root/repo/MULTICHIP_r05_chip.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
