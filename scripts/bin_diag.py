#!/usr/bin/env python
"""Diagnose bin-path disagreement + prepass cost at dragon scale."""
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
    bs = jax.jit(lambda: bin_triangles(
        proj, o, tris.p1, tris.e1, tris.e2, h + (-h) % th, w + (-w) % tw,
        th, tw, e_cap=e_cap, chunk=cfg.bin_chunk))()
    jax.block_until_ready(bs.starts)
    log(f"num_entries={int(bs.num_entries)} overflow={int(bs.overflow_entries)}"
        f" cross={int(bs.cross_tris)} e_cap={e_cap}")
    seg = np.diff(np.asarray(bs.starts))
    log(f"tile seg sizes: mean={seg.mean():.0f} max={seg.max()}"
        f" p99={np.percentile(seg, 99):.0f}")

    # full-frame agreement vs oracle on a sample
    hit = jax.jit(lambda o_, d_: intersect_binned(
        o_, d_, tris, proj, cfg, h, w))(o, rmd)
    jax.block_until_ready(hit.t)
    rng = np.random.default_rng(0)
    idx = rng.choice(w * h, 8192, replace=False)
    sub = jnp.asarray(np.asarray(rmd)[idx])
    hit_ref = trace_rays(scene, camera.pos, sub, RenderConfig(method="fixed"))
    tri_b = np.asarray(hit.tri)[idx]
    tri_r = np.asarray(hit_ref.tri)
    t_b = np.asarray(hit.t)[idx]
    t_r = np.asarray(hit_ref.t)
    agree = tri_b == tri_r
    log(f"agree={agree.mean():.4f}")
    bad = ~agree
    log(f"disagree: n={bad.sum()}  bin-miss/ref-hit={(bad & (tri_b < 0)).sum()}"
        f"  bin-hit/ref-miss={(bad & (tri_r < 0) & (tri_b >= 0)).sum()}"
        f"  both-hit-diff={(bad & (tri_b >= 0) & (tri_r >= 0)).sum()}")
    bh = bad & (tri_b >= 0) & (tri_r >= 0)
    if bh.sum():
        dt = np.abs(t_b[bh] - t_r[bh])
        log(f"both-hit-diff |dt|: max={dt.max():.3e} mean={dt.mean():.3e}"
            f" n_same_t={(dt < 1e-5).sum()}")

    # ---- prepass stage timings ----
    def timed(f, *a, iters=5):
        jax.block_until_ready(f(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    f32 = jnp.float32
    p1, e1, e2 = tris.p1, tris.e1, tris.e2
    res_h, res_w = h + (-h) % th, w + (-w) % tw
    n_tx, n_ty = res_w // tw, res_h // th
    n_tiles = n_tx * n_ty

    def stage_project():
        verts = jnp.stack([p1, p1 + e1, p1 + e2], axis=1)
        rel = verts - proj.origin[None, None, :]
        a = jnp.einsum("tvc,c->tv", rel, proj.n)
        b = jnp.einsum("tvc,c->tv", rel, proj.u)
        c = jnp.einsum("tvc,c->tv", rel, proj.v)
        return a, b, c

    log(f"project: {timed(jax.jit(stage_project)):.2f} ms")

    # isolate: cumsum+searchsorted, sort, gathers
    ntiles_tri = jnp.ones((n_tris,), jnp.int32) * 2
    cum = jnp.cumsum(ntiles_tri)
    jj = jnp.arange(e_cap, dtype=jnp.int32)

    def stage_search(cum):
        return jnp.searchsorted(cum, jj, side="right", method="sort")

    log(f"searchsorted E over T: {timed(jax.jit(stage_search), cum):.2f} ms")

    key = jax.random.randint(jax.random.PRNGKey(0), (e_cap,), 0, 2**31 - 1,
                             dtype=jnp.int32)
    payload = jj

    def stage_sort(key, payload):
        return jax.lax.sort((key, payload), num_keys=1)

    log(f"sort E i32 pairs: {timed(jax.jit(stage_sort), key, payload):.2f} ms")

    ftab = jnp.concatenate([p1, e1, e2, jnp.ones((n_tris, 1), f32)], axis=1)
    sidx = jnp.asarray(np.random.default_rng(1).integers(0, n_tris, e_cap),
                       jnp.int32)

    def stage_gather(ftab, sidx):
        return jnp.take(ftab, sidx, axis=0)

    log(f"gather (T,10) at E: {timed(jax.jit(stage_gather), ftab, sidx):.2f} ms")

    itab = jnp.stack([cum] * 6, axis=1)

    def stage_gather_i(itab, sidx):
        return jnp.take(itab, sidx, axis=0)

    log(f"gather (T,6) i32 at E: {timed(jax.jit(stage_gather_i), itab, sidx):.2f} ms")

    def stage_full():
        return bin_triangles(proj, o, p1, e1, e2, res_h, res_w, th, tw,
                             e_cap=e_cap, chunk=cfg.bin_chunk).starts

    log(f"full prepass: {timed(jax.jit(stage_full)):.2f} ms")


if __name__ == "__main__":
    main()
