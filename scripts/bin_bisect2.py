#!/usr/bin/env python
"""Second bisect of the bin kernel's lost hits: was the block containing the
oracle triangle's entry scanned (k_end) or skipped by the early exit?"""
import sys

sys.path.insert(0, "/root/repo")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import dataclasses

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

    cfg = RenderConfig(method="bin", tile_h=16, tile_w=16, bin_chunk=128,
                       with_stats=True)
    th, tw = cfg.tile_h, cfg.tile_w
    chunk = cfg.bin_chunk
    e_cap = int(n_tris * cfg.bin_e_factor) + 8192
    e_cap = -(-e_cap // chunk) * chunk
    res_h, res_w = h + (-h) % th, w + (-w) % tw
    bs = jax.jit(lambda: bin_triangles(
        proj, o, tris.p1, tris.e1, tris.e2, res_h, res_w,
        th, tw, e_cap=e_cap, chunk=chunk))()
    entry_tri = np.asarray(bs.entry_tri)
    starts = np.asarray(bs.starts)
    geom = np.asarray(bs.geom)          # (nb, 10, chunk)
    qstep = float(bs.qstep)

    hit, stats = jax.jit(lambda o_, d_: intersect_binned(
        o_, d_, tris, proj, cfg, h, w))(o, rmd)
    tri_b = np.asarray(hit.tri)
    k_end = np.asarray(stats["steps"])     # per tile
    nch = np.asarray(stats["chunks"])
    t_b = np.asarray(hit.t)

    rng = np.random.default_rng(0)
    idx = rng.choice(w * h, 8192, replace=False)
    sub = jnp.asarray(np.asarray(rmd)[idx])
    hit_ref = trace_rays(scene, camera.pos, sub, RenderConfig(method="fixed"))
    tri_r = np.asarray(hit_ref.tri)
    t_r = np.asarray(hit_ref.t)

    bad = (tri_b[idx] != tri_r) & (tri_r >= 0) & (tri_b[idx] < 0)
    bidx = idx[bad]
    btri = tri_r[bad]
    bt = t_r[bad]
    log(f"lost hits: {bad.sum()}  (k_end==nch tiles overall: "
        f"{(k_end == nch).mean():.3f})")
    n_tx = res_w // tw
    n_skip = n_full = 0
    examples = []
    for px, tr, tref in zip(bidx, btri, bt):
        iy, ix = px // w, px % w
        t = (iy // th) * n_tx + (ix // tw)
        s0, s1 = starts[t], starts[t + 1]
        seg = entry_tri[s0:s1]
        epos = s0 + int(np.nonzero(seg == tr)[0][0])
        b0 = s0 // chunk
        kb = epos // chunk - b0
        if kb >= k_end[t]:
            n_skip += 1
            if len(examples) < 8:
                dep = geom[epos // chunk, 9, epos % chunk]
                examples.append(
                    (int(t), int(kb), int(k_end[t]), int(nch[t]),
                     float(dep), float(tref), float(t_b[px])))
        else:
            n_full += 1
    log(f"oracle entry block SKIPPED by early exit: {n_skip}; "
        f"scanned but missed: {n_full}")
    for e in examples:
        log(f"  tile={e[0]} kb={e[1]} k_end={e[2]} nch={e[3]} "
            f"entry_depth={e[4]:.4f} t_ref={e[5]:.4f} t_bin={e[6]:.4f}")
    # for scanned-but-missed: check a few directly with mt against geometry
    if n_full:
        cnt = 0
        for px, tr, tref in zip(bidx, btri, bt):
            iy, ix = px // w, px % w
            t = (iy // th) * n_tx + (ix // tw)
            s0 = starts[t]
            seg = entry_tri[s0:starts[t + 1]]
            epos = s0 + int(np.nonzero(seg == tr)[0][0])
            if epos // chunk - s0 // chunk < k_end[t]:
                g = geom[epos // chunk, :, epos % chunk]
                p1, e1, e2, dep = g[0:3], g[3:6], g[6:9], g[9]
                d = np.asarray(rmd)[px]
                og = np.asarray(camera.pos)
                tvec = og - p1
                md = np.cross(e2, e1)
                mu = np.cross(e2, tvec)
                mv = np.cross(tvec, e1)
                det = float(d @ md)
                u = float(d @ mu)
                v = float(d @ mv)
                td = float(e2 @ mv)
                log(f"  scanned-miss: tile={t} det={det:.3e} u/det="
                    f"{u / det:.4f} v/det={v / det:.4f} t={td / det:.4f} "
                    f"t_ref={tref:.4f} dep={dep:.4f} "
                    f"tb={t_b[px]:.4f}")
                cnt += 1
                if cnt >= 8:
                    break


if __name__ == "__main__":
    main()
