#!/usr/bin/env python
"""Locate the backward-pass cost at dragon scale (fwd 37ms vs fwd+bwd 182ms).

Times, on the real chip: fwd; fwd+bwd (full); fwd+bwd with grads limited to
camera-only; the gather-VJP building blocks in isolation (argsort, permute,
segment_sum, raw scatter-add, cumsum+searchsorted segment sum) at the real
(R=518k rays, T=800k tris) shapes.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(fn, *args, iters=10):
    import jax
    jax.block_until_ready(fn(*args))
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

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    w, h = 960, 540
    num_r = w * h

    # --- isolated gather-VJP building blocks at real shapes ---
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n_tris, num_r, dtype=np.int32))
    g = jnp.asarray(rng.standard_normal((num_r, 3), np.float32))

    f_argsort = jax.jit(lambda i: jnp.argsort(i))
    log(f"argsort(R):          {timed(f_argsort, idx)*1e3:7.2f} ms")

    order = f_argsort(idx)
    f_permute = jax.jit(lambda gg, o: jnp.take(gg, o, axis=0))
    log(f"permute(R,3):        {timed(f_permute, g, order)*1e3:7.2f} ms")

    idx_sorted = jnp.take(idx, order)

    f_seg = jax.jit(lambda gg, ii: jax.ops.segment_sum(
        gg, ii, num_segments=n_tris, indices_are_sorted=True))
    log(f"segment_sum sorted:  {timed(f_seg, g, idx_sorted)*1e3:7.2f} ms")

    f_scat = jax.jit(lambda gg, ii: jnp.zeros(
        (n_tris, 3), jnp.float32).at[ii].add(gg))
    log(f"scatter-add unsorted:{timed(f_scat, g, idx)*1e3:7.2f} ms")

    def seg_cumsum(gg, ii):
        # sorted-segment sum without scatter: cumsum + boundary diff
        cs = jnp.cumsum(gg, axis=0)
        # first position with id >= t  (binary search, vectorized)
        start = jnp.searchsorted(ii, jnp.arange(n_tris, dtype=jnp.int32))
        end = jnp.searchsorted(ii, jnp.arange(n_tris, dtype=jnp.int32),
                               side="right")
        zero = jnp.zeros((1, 3), jnp.float32)
        cs_pad = jnp.concatenate([zero, cs], axis=0)
        return jnp.take(cs_pad, end, axis=0) - jnp.take(cs_pad, start, axis=0)

    f_cum = jax.jit(seg_cumsum)
    log(f"cumsum+searchsorted: {timed(f_cum, g, idx_sorted)*1e3:7.2f} ms")
    a = f_seg(g, idx_sorted)
    b = f_cum(g, idx_sorted)
    log(f"  cumsum path allclose: {bool(jnp.allclose(a, b, atol=1e-3))}")

    # --- full model ---
    from cpp_cuda_raytracer_dev_tpu import (Camera, RenderConfig, Scene,
                                            SceneObject, Triangles)
    from cpp_cuda_raytracer_dev_tpu.accel.traverse import ClusterAccel
    from cpp_cuda_raytracer_dev_tpu.models.renderer import render
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh

    tv = dragon_class_mesh(n_tris)
    tris = Triangles.from_vertices(tv)
    scene = Scene.create([SceneObject.create(tris)])
    camera = Camera.create(w, h, pos=[0., 0., -3.], look_at=[0., 0., 0.],
                           up=[0., 1., 0.], film_h=0.024, focal=0.055)
    t0 = time.perf_counter()
    accel = (ClusterAccel.build(tris, leaf_size=128),)
    jax.block_until_ready(accel[0].geom_t)
    log(f"accel build+transfer {time.perf_counter()-t0:.1f}s")
    cfg = RenderConfig(method="pallas2", leaf_size=128, tile_h=32, tile_w=32,
                       max_candidates=48, max_groups=24)

    fwd = jax.jit(lambda s, c: render(s, c, cfg, accel).hit_tri)
    log(f"fwd:                 {timed(fwd, scene, camera)*1e3:7.2f} ms")

    def loss(s, c):
        return jnp.mean(render(s, c, cfg, accel).radiance)

    fb_full = jax.jit(jax.grad(loss, argnums=(0, 1)))
    log(f"fwd+bwd full:        {timed(fb_full, scene, camera)*1e3:7.2f} ms")

    fb_cam = jax.jit(jax.grad(loss, argnums=1))
    log(f"fwd+bwd cam-only:    {timed(fb_cam, scene, camera)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
