#!/usr/bin/env python
"""Debug the bin path on the real chip: (1) compare prepass outputs
TPU-compiled vs CPU, (2) compare kernel outputs vs oracle at tester scale,
(3) time the prepass stages at dragon scale."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(fn, *args, iters=5):
    import jax
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.block_until_ready(jnp.ones((8,)))
    log("probe ok")
    cpu = jax.devices("cpu")[0]

    from cpp_cuda_raytracer_dev_tpu import (Camera, RenderConfig, Scene,
                                            SceneObject, Triangles)
    from cpp_cuda_raytracer_dev_tpu.accel.binning import bin_triangles
    from cpp_cuda_raytracer_dev_tpu.accel.traverse import intersect_binned
    from cpp_cuda_raytracer_dev_tpu.io import ply
    from cpp_cuda_raytracer_dev_tpu.models.renderer import trace_rays

    mesh = ply.load_mesh("/root/reference/TEST_Dungeonrun/tester.ply")
    tris = Triangles.from_vertices(mesh.tri_vertices)
    scene = Scene.create([SceneObject.create(tris)])
    v = mesh.tri_vertices.reshape(-1, 3)
    lo, hi = v.min(0), v.max(0)
    center, size = (lo + hi) / 2, float(np.linalg.norm(hi - lo))
    res_w, res_h, th, tw, chunk = 128, 64, 16, 16, 128
    cam = Camera.create(res_w, res_h, pos=center + np.array([0, 0, -1.3 * size]),
                        look_at=center, up=[0, 1, 0], film_h=0.024,
                        focal=0.055)
    dd = max(400.0, 10 * size)
    proj = cam.projection()
    o = jnp.asarray(cam.pos)
    e_cap = -(-(tris.num_triangles * 3 + 8192) // chunk) * chunk

    def prepass():
        return bin_triangles(proj, o, tris.p1, tris.e1, tris.e2, res_h, res_w,
                             th, tw, e_cap=e_cap, chunk=chunk)

    b_tpu = jax.jit(prepass)()
    with jax.default_device(cpu):
        b_cpu = jax.jit(prepass)()
    for f in ("starts", "entry_tri"):
        a1 = np.asarray(getattr(b_tpu, f))
        a2 = np.asarray(getattr(b_cpu, f))
        log(f"prepass {f}: equal={np.array_equal(a1, a2)}")
    g1 = np.asarray(b_tpu.geom)
    g2 = np.asarray(b_cpu.geom)
    log(f"prepass geom: maxdiff={np.abs(g1-g2).max():.2e}")

    # kernel vs oracle at tester scale
    cfg = RenderConfig(method="bin", tile_h=th, tile_w=tw, bin_chunk=chunk,
                       draw_distance=dd)
    rmd = jnp.asarray(cam.ray_directions())
    hit = jax.block_until_ready(jax.jit(
        lambda o_, d_: intersect_binned(o_, d_, tris, proj, cfg, res_h,
                                        res_w))(o, rmd))
    ref = trace_rays(scene, cam.pos, rmd, RenderConfig(method="fixed",
                                                       chunk=512,
                                                       draw_distance=dd))
    rt = np.asarray(ref.tri)
    bt = np.asarray(hit.tri)
    agree = float((rt == bt).mean())
    log(f"tester TPU kernel: hit={float((rt>=0).mean()):.3f} agree={agree:.4f}")
    if agree < 0.999:
        bad = np.nonzero(rt != bt)[0][:10]
        for i in bad:
            log(f"  ray {i}: ref tri {rt[i]} t={float(ref.t[i]):.4f} "
                f"got {bt[i]} t={float(hit.t[i]):.4f}")

    # dragon-scale prepass stage timing
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh
    dtris = Triangles.from_vertices(dragon_class_mesh(800_000))
    cam2 = Camera.create(960, 540, pos=[0., 0., -3.], look_at=[0., 0., 0.],
                         up=[0., 1., 0.], film_h=0.024, focal=0.055)
    proj2 = cam2.projection()
    o2 = jnp.asarray(cam2.pos)
    e_cap2 = -(-(800_000 * 3 + 8192) // 128) * 128

    def full():
        return bin_triangles(proj2, o2, dtris.p1, dtris.e1, dtris.e2, 544, 960,
                             16, 16, e_cap=e_cap2, chunk=128).starts

    t_full = timed(jax.jit(full))
    log(f"dragon prepass full: {t_full*1e3:.2f} ms")

    # stage splits
    import functools

    def stage_proj():
        verts = jnp.stack([dtris.p1, dtris.p1 + dtris.e1,
                           dtris.p1 + dtris.e2], axis=1)
        rel = verts - proj2.origin[None, None, :]
        a = jnp.einsum("tvc,c->tv", rel, proj2.n)
        b = jnp.einsum("tvc,c->tv", rel, proj2.u)
        c = jnp.einsum("tvc,c->tv", rel, proj2.v)
        return a + b + c

    log(f"  proj: {timed(jax.jit(stage_proj))*1e3:.2f} ms")

    t_n = 800_000
    cum = jnp.cumsum(jnp.ones((t_n,), jnp.int32))
    jj = jnp.arange(e_cap2, dtype=jnp.int32)
    f_ss = jax.jit(lambda cu, j: jnp.searchsorted(cu, j, side="right",
                                                  method="sort"))
    jax.block_until_ready(f_ss(cum, jj))
    log(f"  expand searchsorted: {timed(f_ss, cum, jj)*1e3:.2f} ms")

    key = jnp.arange(e_cap2, dtype=jnp.int32)[::-1]
    f_sort = jax.jit(lambda k: jax.lax.sort((k, k), num_keys=1)[0])
    log(f"  sort {e_cap2}: {timed(f_sort, key)*1e3:.2f} ms")

    idx = jnp.arange(e_cap2, dtype=jnp.int32) % t_n
    tbl = jnp.zeros((t_n, 10), jnp.float32)
    f_g = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    log(f"  gather (E,10): {timed(f_g, tbl, idx)*1e3:.2f} ms")

    big = jnp.zeros((e_cap2, 10), jnp.float32)
    f_tr = jax.jit(lambda x: x.reshape(e_cap2 // 128, 128, 10
                                       ).transpose(0, 2, 1))
    log(f"  block transpose: {timed(f_tr, big)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
