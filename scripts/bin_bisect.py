#!/usr/bin/env python
"""Bisect the bin path's lost hits: for each ray where the oracle hits but
method='bin' misses, check whether the oracle's winning triangle is present
in the ray's tile segment (binning bug) or present but not reported
(kernel bug). Then finish the prepass stage timings bin_diag started."""
import sys
import time

sys.path.insert(0, "/root/repo")


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(f, *a, iters=5):
    import jax
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.block_until_ready(jnp.ones((8,)))
    from cpp_cuda_raytracer_dev_tpu import (Camera, RenderConfig, Scene,
                                            SceneObject, Triangles)
    from cpp_cuda_raytracer_dev_tpu.accel.binning import bin_triangles
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

    cfg = RenderConfig(method="bin", tile_h=16, tile_w=16, bin_chunk=128)
    th, tw = cfg.tile_h, cfg.tile_w
    e_cap = int(n_tris * cfg.bin_e_factor) + 8192
    e_cap = -(-e_cap // cfg.bin_chunk) * cfg.bin_chunk
    res_h, res_w = h + (-h) % th, w + (-w) % tw
    bs = jax.jit(lambda: bin_triangles(
        proj, o, tris.p1, tris.e1, tris.e2, res_h, res_w,
        th, tw, e_cap=e_cap, chunk=cfg.bin_chunk))()
    entry_tri = np.asarray(bs.entry_tri)
    starts = np.asarray(bs.starts)
    log(f"entries={int(bs.num_entries)} overflow={int(bs.overflow_entries)}")

    hit = jax.jit(lambda o_, d_: intersect_binned(
        o_, d_, tris, proj, cfg, h, w))(o, rmd)
    tri_b = np.asarray(hit.tri)
    rng = np.random.default_rng(0)
    idx = rng.choice(w * h, 8192, replace=False)
    sub = jnp.asarray(np.asarray(rmd)[idx])
    hit_ref = trace_rays(scene, camera.pos, sub, RenderConfig(method="fixed"))
    tri_r = np.asarray(hit_ref.tri)

    bad = (tri_b[idx] != tri_r) & (tri_r >= 0) & (tri_b[idx] < 0)
    bidx = idx[bad]
    btri = tri_r[bad]
    log(f"lost hits: {bad.sum()}")
    n_tx = res_w // tw
    in_seg = np.zeros(bidx.shape[0], bool)
    for i, (px, tr) in enumerate(zip(bidx, btri)):
        iy, ix = px // w, px % w
        t = (iy // th) * n_tx + (ix // tw)
        seg = entry_tri[starts[t]:starts[t + 1]]
        in_seg[i] = (seg == tr).any()
    log(f"oracle tri IN tile segment: {in_seg.sum()} / {bidx.shape[0]} "
        f"(in => kernel bug, out => binning bug)")
    # where out: check the projected bbox of those tris vs the pixel
    out = ~in_seg
    if out.sum():
        ti = btri[out][:10]
        px = bidx[out][:10]
        p1 = np.asarray(tris.p1)[ti]
        e1 = np.asarray(tris.e1)[ti]
        e2 = np.asarray(tris.e2)[ti]
        og = np.asarray(proj.origin)
        for k in range(min(10, out.sum())):
            verts = np.stack([p1[k], p1[k] + e1[k], p1[k] + e2[k]])
            rel = verts - og
            a = rel @ np.asarray(proj.n)
            b = rel @ np.asarray(proj.u)
            c = np.asarray(rel @ np.asarray(proj.v))
            sx_ = float(proj.sx)
            sy_ = float(proj.sy)
            pxs = float(proj.adjust_x) + sx_ * b / a
            pys = float(proj.adjust_y) + sy_ * c / a
            iy, ix = px[k] // w, px[k] % w
            log(f"  tri {ti[k]} pixel=({iy},{ix}) a={a.min():.3f}.."
                f"{a.max():.3f} px=[{pxs.min():.2f},{pxs.max():.2f}] "
                f"py=[{pys.min():.2f},{pys.max():.2f}]")

    # ---- prepass stage timings (resume where bin_diag died) ----
    f32 = jnp.float32
    cum = jnp.cumsum(jnp.ones((n_tris,), jnp.int32) * 2)
    jj = jnp.arange(e_cap, dtype=jnp.int32)
    log(f"searchsorted E/T: "
        f"{timed(jax.jit(lambda c: jnp.searchsorted(c, jj, side='right', method='sort')), cum):.2f} ms")
    key = jax.random.randint(jax.random.PRNGKey(0), (e_cap,), 0, 2**31 - 1,
                             dtype=jnp.int32)
    log(f"sort E i32 pairs: "
        f"{timed(jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1)), key, jj):.2f} ms")
    ftab = jnp.concatenate([tris.p1, tris.e1, tris.e2,
                            jnp.ones((n_tris, 1), f32)], axis=1)
    sidx = jnp.asarray(np.random.default_rng(1).integers(0, n_tris, e_cap),
                       jnp.int32)
    log(f"gather (T,10)f32 at E: "
        f"{timed(jax.jit(lambda t, s: jnp.take(t, s, axis=0)), ftab, sidx):.2f} ms")
    itab = jnp.stack([cum] * 6, axis=1)
    log(f"gather (T,6)i32 at E: "
        f"{timed(jax.jit(lambda t, s: jnp.take(t, s, axis=0)), itab, sidx):.2f} ms")
    log(f"cumsum T: "
        f"{timed(jax.jit(lambda x: jnp.cumsum(x)), jnp.ones((n_tris,), jnp.int32)):.2f} ms")


if __name__ == "__main__":
    main()
