#!/usr/bin/env python
"""Projected-bbox span distribution of the bench meshes at the bench
cameras — sizes the raster path's candidate enumeration (accel/raster.py).

For every triangle: bbox span in x/y, major/minor (axis-swapped) span, and
the max per-column cross-section width along the major axis (the minor
candidate count a scanline enumeration needs). Run on CPU."""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def log(m):
    print(m, flush=True)


def scene_tris_cam(name):
    from cpp_cuda_raytracer_dev_tpu.models.camera import Camera
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import (clustered_mesh,
                                                          dragon_class_mesh)
    if name == "rabbit":
        from cpp_cuda_raytracer_dev_tpu.io import ply
        mesh = ply.load_mesh(
            "/root/reference/TEST_Dungeonrun/rabbit_70k.ply")
        tv = np.asarray(mesh.tri_vertices)
        lo, hi = tv.reshape(-1, 3).min(0), tv.reshape(-1, 3).max(0)
        center = (lo + hi) / 2
        pos = center + np.array([0, 0, -(hi - lo)[2] * 2.2], np.float32)
        focal = 0.035
    elif name == "clustered":
        tv = clustered_mesh(800_000)
        center = np.zeros(3, np.float32)
        pos = np.array([0.6, 0.25, -2.6], np.float32)
        focal = 0.055
    else:
        tv = dragon_class_mesh(800_000)
        center = np.zeros(3, np.float32)
        pos = np.array([0.0, 0.0, -3.0], np.float32)
        focal = 0.055
    cam = Camera.create(960, 540, pos=pos, look_at=center,
                        up=[0.0, 1.0, 0.0], film_h=0.024, focal=focal)
    return tv, cam


def stats(name):
    tv, cam = scene_tris_cam(name)
    proj = cam.projection()
    o = np.asarray(proj.origin)
    n, u, v = np.asarray(proj.n), np.asarray(proj.u), np.asarray(proj.v)
    sx, sy = float(proj.sx), float(proj.sy)
    ax, ay = float(proj.adjust_x), float(proj.adjust_y)

    p = tv - o[None, None, :]                      # (T, 3, 3)
    a = p @ n
    b = p @ u
    c = p @ v
    front = np.all(a > 0, axis=1)
    asafe = np.maximum(a, 1e-20)
    px = ax + sx * (b / asafe)
    py = ay + sy * (c / asafe)
    x0, x1 = px.min(1), px.max(1)
    y0, y1 = py.min(1), py.max(1)
    onscreen = front & (x1 >= 0) & (x0 <= 959) & (y1 >= 0) & (y0 <= 539)
    # integer candidate counts with 0.5 guard, like raster.py
    nx = np.floor(np.clip(x1 + .5, 0, 959)) - np.ceil(
        np.clip(x0 - .5, 0, 959)) + 1
    ny = np.floor(np.clip(y1 + .5, 0, 539)) - np.ceil(
        np.clip(y0 - .5, 0, 539)) + 1
    nx = np.maximum(nx, 0)
    ny = np.maximum(ny, 0)
    sp_major = np.maximum(nx, ny)
    sp_minor = np.minimum(nx, ny)

    # max cross-section width along the major axis: sort verts by major
    # coord; width at the middle vertex = |edge02(majmid) - minmid|
    swap = ny > nx
    maj = np.where(swap[:, None], py, px)
    mnr = np.where(swap[:, None], px, py)
    order = np.argsort(maj, axis=1)
    majs = np.take_along_axis(maj, order, 1)
    mnrs = np.take_along_axis(mnr, order, 1)
    denom = majs[:, 2] - majs[:, 0]
    tfrac = np.where(denom > 1e-12,
                     (majs[:, 1] - majs[:, 0]) / np.maximum(denom, 1e-12),
                     0.0)
    on_long = mnrs[:, 0] + tfrac * (mnrs[:, 2] - mnrs[:, 0])
    width = np.abs(mnrs[:, 1] - on_long)

    m = onscreen
    log(f"\n=== {name}: T={tv.shape[0]}  onscreen(front)={m.sum()} "
        f"({100 * m.mean():.1f}%)  cross={np.sum(np.any(a <= 0, 1) & np.any(a > 0, 1))}")
    for label, arr in (("span_x", nx), ("span_y", ny),
                       ("span_major", sp_major), ("span_minor", sp_minor),
                       ("col_width", width)):
        q = np.percentile(arr[m], [50, 90, 99, 99.9, 100])
        log(f"  {label:11s} p50={q[0]:6.1f} p90={q[1]:6.1f} "
            f"p99={q[2]:6.1f} p99.9={q[3]:7.1f} max={q[4]:8.1f}")
    # candidate-pair counts for several strategies
    tot_bbox = (nx * ny)[m].sum()
    log(f"  bbox pairs total: {tot_bbox / 1e6:.1f} M "
        f"(mean {(nx * ny)[m].mean():.1f}/tri)")
    for smaj, smin in ((4, 4), (8, 2), (8, 4), (16, 2), (16, 4), (32, 2)):
        fits = m & (sp_major <= smaj) & (np.ceil(width) + 2 <= smin)
        ovf = m & ~((sp_major <= smaj) & (np.ceil(width) + 2 <= smin))
        log(f"  scanline maj<={smaj:2d} minor<={smin}: fits={fits.sum():7d} "
            f"({100 * fits.sum() / max(m.sum(), 1):5.1f}%) ovf={ovf.sum():6d} "
            f"pairs={fits.sum() * smaj * smin / 1e6:6.1f}M")
    # pure bbox-bucket strategy
    for cap in (2, 4, 8, 16, 32):
        fits = m & (sp_major <= cap)
        log(f"  bbox span<={cap:2d}: fits={fits.sum():7d} "
            f"({100 * fits.sum() / max(m.sum(), 1):5.1f}%) "
            f"pairs={(nx * ny)[m & (sp_major <= cap)].sum() / 1e6:6.1f}M")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    for name in ("dragon-class", "rabbit", "clustered"):
        stats(name)


if __name__ == "__main__":
    main()
