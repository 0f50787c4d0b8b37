#!/usr/bin/env python
"""Sizing study for gen-5 block-binning: bin BLOCKS of B spatially-sorted
consecutive triangles to screen tiles (block bbox = union of tri bboxes).
Prepass then needs no per-entry gather (geometry stays in triangle order)
and sorts only ~10-100k (tile, block) entries. This script computes, on
CPU, for each scene x triangle order x B x tile shape:
  - items  = total (tile, block) entries (kernel grid size + sort size)
  - pairs  = items * tile_rays * B (kernel pair tests before early-exit)
vs the current per-tri binning baseline."""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def log(m):
    print(m, flush=True)


def morton_order(centers):
    """Morton (z-curve) order of triangle centroids, 10 bits/axis."""
    lo = centers.min(0)
    hi = centers.max(0)
    q = ((centers - lo) / np.maximum(hi - lo, 1e-20) * 1023).astype(
        np.uint64)

    def spread(x):
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    code = (spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1))
            | (spread(q[:, 2]) << np.uint64(2)))
    return np.argsort(code, kind="stable")


def project(tv, cam):
    proj = cam.projection()
    o = np.asarray(proj.origin)
    n, u, v = np.asarray(proj.n), np.asarray(proj.u), np.asarray(proj.v)
    p = tv - o[None, None, :]
    a = p @ n
    asafe = np.maximum(a, 1e-20)
    px = float(proj.adjust_x) + float(proj.sx) * ((p @ u) / asafe)
    py = float(proj.adjust_y) + float(proj.sy) * ((p @ v) / asafe)
    front = np.all(a > 0, 1)
    return px, py, front, a


def counts(px, py, front, res_w, res_h, tw, th, B):
    """(items, pairs, live_blocks) for block size B, (tw x th) tiles."""
    T = px.shape[0]
    pad = (-T) % B
    if pad:
        px = np.concatenate([px, np.full((pad, 3), 1e30)])
        py = np.concatenate([py, np.full((pad, 3), 1e30)])
        front = np.concatenate([front, np.zeros(pad, bool)])
    nb = px.shape[0] // B
    g = .5
    x0 = np.where(front, px.min(1) - g, 1e30).reshape(nb, B)
    x1 = np.where(front, px.max(1) + g, -1e30).reshape(nb, B)
    y0 = np.where(front, py.min(1) - g, 1e30).reshape(nb, B)
    y1 = np.where(front, py.max(1) + g, -1e30).reshape(nb, B)
    bx0, bx1 = x0.min(1), x1.max(1)
    by0, by1 = y0.min(1), y1.max(1)
    live = (front.reshape(nb, B).any(1) & (bx1 >= 0) & (bx0 <= res_w - 1)
            & (by1 >= 0) & (by0 <= res_h - 1))
    tx0 = np.clip(bx0, 0, res_w - 1).astype(np.int64) // tw
    tx1 = np.clip(bx1, 0, res_w - 1).astype(np.int64) // tw
    ty0 = np.clip(by0, 0, res_h - 1).astype(np.int64) // th
    ty1 = np.clip(by1, 0, res_h - 1).astype(np.int64) // th
    tiles = np.where(live, (tx1 - tx0 + 1) * (ty1 - ty0 + 1), 0)
    items = int(tiles.sum())
    pairs = items * tw * th * B
    return items, pairs, int(live.sum())


def per_tri(px, py, front, res_w, res_h, tw, th):
    g = .5
    x0 = px.min(1) - g
    x1 = px.max(1) + g
    y0 = py.min(1) - g
    y1 = py.max(1) + g
    live = front & (x1 >= 0) & (x0 <= res_w - 1) & (y1 >= 0) & (y0 <= res_h - 1)
    tx0 = np.clip(x0, 0, res_w - 1).astype(np.int64) // tw
    tx1 = np.clip(x1, 0, res_w - 1).astype(np.int64) // tw
    ty0 = np.clip(y0, 0, res_h - 1).astype(np.int64) // th
    ty1 = np.clip(y1, 0, res_h - 1).astype(np.int64) // th
    ent = np.where(live, (tx1 - tx0 + 1) * (ty1 - ty0 + 1), 0)
    return int(ent.sum()), int(ent.sum()) * tw * th


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from cpp_cuda_raytracer_dev_tpu.models.camera import Camera
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import (clustered_mesh,
                                                          dragon_class_mesh)

    scenes = {}
    scenes["dragon-class"] = (dragon_class_mesh(800_000),
                              dict(pos=[0., 0., -3.], look_at=[0., 0., 0.],
                                   focal=0.055))
    scenes["clustered"] = (clustered_mesh(800_000),
                           dict(pos=[0.6, 0.25, -2.6],
                                look_at=[0., 0., 0.], focal=0.055))
    from cpp_cuda_raytracer_dev_tpu.io import ply
    mesh = ply.load_mesh("/root/reference/TEST_Dungeonrun/rabbit_70k.ply")
    tv = np.asarray(mesh.tri_vertices)
    lo, hi = tv.reshape(-1, 3).min(0), tv.reshape(-1, 3).max(0)
    c = (lo + hi) / 2
    scenes["rabbit"] = (tv, dict(
        pos=c + np.array([0, 0, -(hi - lo)[2] * 2.2], np.float32),
        look_at=c, focal=0.035))

    for name, (tv, ck) in scenes.items():
        cam = Camera.create(960, 540, pos=ck["pos"], look_at=ck["look_at"],
                            up=[0., 1., 0.], film_h=0.024,
                            focal=ck["focal"])
        for order in ("mesh", "morton"):
            tvo = tv
            if order == "morton":
                tvo = tv[morton_order(tv.mean(1))]
            px, py, front, a = project(tvo, cam)
            ents, prs = per_tri(px, py, front, 960, 540, 16, 16)
            log(f"\n{name} [{order}] T={tv.shape[0]} "
                f"per-tri@16x16: entries={ents / 1e6:.2f}M "
                f"pairs={prs / 1e6:.0f}M")
            for tw, th in ((16, 16), (16, 8), (8, 8), (32, 8)):
                for B in (32, 64, 128, 256):
                    it, prs_b, lb = counts(px, py, front, 960, 540,
                                           tw, th, B)
                    log(f"  {tw:2d}x{th:2d} B={B:3d}: items={it:7d} "
                        f"pairs={prs_b / 1e6:6.0f}M live_blocks={lb}")


if __name__ == "__main__":
    main()
