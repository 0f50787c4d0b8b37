#!/usr/bin/env python
"""On-chip compiled-vs-interpret parity for the flagship Pallas kernel
(SURVEY §5 sanitizer analogue; VERDICT r2 missing #5).

Runs the bin path twice on the SAME device inputs — once through the
Mosaic-compiled kernel, once through the Pallas interpreter — and
demands bit-identical hit ids and near-identical t (the compiled kernel
uses pl.reciprocal+Newton, interpret uses true division). Writes
PARITY_r04.json."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.block_until_ready(jnp.ones((8,)))
    log("probe ok")

    from cpp_cuda_raytracer_dev_tpu import (Camera, RenderConfig,
                                            Triangles)
    from cpp_cuda_raytracer_dev_tpu.accel.traverse import intersect_binned
    from cpp_cuda_raytracer_dev_tpu.io import ply
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh

    rows = []
    for name, tv, res, pos in [
        ("tester", ply.load_mesh(
            "/root/reference/TEST_Dungeonrun/tester.ply").tri_vertices,
         (128, 64), None),
        ("dragon50k", dragon_class_mesh(50_000), (256, 144),
         [0.0, 0.0, -3.0]),
    ]:
        tris = Triangles.from_vertices(tv)
        v = tv.reshape(-1, 3)
        lo, hi = v.min(0), v.max(0)
        center = (lo + hi) / 2
        size = float(np.linalg.norm(hi - lo))
        if pos is None:
            pos = center + np.array([0, 0, -1.3 * size], np.float32)
        w, h = res
        cam = Camera.create(w, h, pos=pos, look_at=center, up=[0, 1, 0],
                            film_h=0.024, focal=0.055)
        cfg = RenderConfig(method="bin", bin_chunk=128,
                           draw_distance=max(400.0, 10 * size))
        o = jnp.asarray(cam.pos)
        rmd = jnp.asarray(cam.ray_directions())
        proj = cam.projection()

        hit_c = jax.jit(lambda o_, d_: intersect_binned(
            o_, d_, tris, proj, cfg, h, w, interpret=False))(o, rmd)
        hit_i = jax.jit(lambda o_, d_: intersect_binned(
            o_, d_, tris, proj, cfg, h, w, interpret=True))(o, rmd)
        tri_eq = float(np.mean(np.asarray(hit_c.tri) == np.asarray(hit_i.tri)))
        m = np.asarray(hit_c.tri) == np.asarray(hit_i.tri)
        dt = float(np.max(np.abs(np.asarray(hit_c.t)[m]
                                 - np.asarray(hit_i.t)[m])))
        hr = float(np.mean(np.asarray(hit_c.tri) >= 0))
        log(f"{name}: tri_eq={tri_eq:.6f} max|dt|={dt:.2e} hit={hr:.3f}")
        rows.append(dict(scene=name, res=list(res), tri_agreement=tri_eq,
                         max_dt_on_agreeing=dt, hit_rate=hr))

    ok = all(r["tri_agreement"] >= 0.9995 and r["max_dt_on_agreeing"] < 1e-4
             for r in rows)
    out = {"kernel": "ops/pallas/bin_kernel2.py",
           "check": "compiled (Mosaic, real chip) vs Pallas interpret",
           "rows": rows, "pass": ok}
    with open("/root/repo/PARITY_r04.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
