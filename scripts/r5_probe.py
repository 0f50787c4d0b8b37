#!/usr/bin/env python
"""Round-5 honest on-chip decomposition probes (device_time everywhere).

Every number here uses the batch-delta methodology (utils/profiling.py
device_time): distinct perturbed calls, host-materialized scalar fence,
(t(n_hi)-t(n_lo))/(n_hi-n_lo), median of replicates. Stage probes consume
their outputs with FULL reductions (jnp.sum over the whole array) so XLA
cannot dead-code-eliminate or narrow the stage (ROOFLINE.md §1 caveat:
slicing a probe output lets the compiler prune the gather behind it).

Modes (combine freely; each is one or two jit compiles):
  --fwd              full forward frame (radiance)
  --step             fwd+bwd (bench loss, grads wrt scene+camera)
  --trace            intersect only (hit.t/tri sums)
  --prepass          bin_triangles full output + ray table (no kernel)
  --prepass-nogather bin_triangles through _stage="starts" (no (T,12)
                     entry gather, no geom table) + ray table
  --bwd-split        grads wrt phong-only / camera-only / color-only /
                     verts — deltas decompose the backward increment
  --prims            standalone take/argsort/sort/permute cost model
  --tile-h/--tile-w/--bin-chunk re-run any of the above at other configs
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tris", type=int, default=800_000)
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--height", type=int, default=540)
    p.add_argument("--tile-h", type=int, default=16)
    p.add_argument("--tile-w", type=int, default=32)
    p.add_argument("--bin-chunk", type=int, default=512)
    p.add_argument("--bin-esub", type=int, default=1)
    p.add_argument("--fwd", action="store_true")
    p.add_argument("--step", action="store_true")
    p.add_argument("--trace", action="store_true")
    p.add_argument("--prepass", action="store_true")
    p.add_argument("--prepass-nogather", action="store_true")
    p.add_argument("--bwd-split", action="store_true")
    p.add_argument("--prims", action="store_true")
    p.add_argument("--stats", action="store_true",
                   help="print bin telemetry (entries/chunks scanned)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from cpp_cuda_raytracer_dev_tpu import (Camera, RenderConfig, Scene,
                                            SceneObject, Triangles)
    from cpp_cuda_raytracer_dev_tpu.models.renderer import render, trace_rays
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh
    from cpp_cuda_raytracer_dev_tpu.utils.profiling import device_time

    log(f"devices: {jax.devices()}")
    tv = dragon_class_mesh(args.tris)
    tris = Triangles.from_vertices(tv)
    scene = Scene.create([SceneObject.create(tris)])
    camera = Camera.create(args.width, args.height,
                           pos=[0.0, 0.0, -3.0], look_at=[0.0, 0.0, 0.0],
                           up=[0.0, 1.0, 0.0], film_h=0.024, focal=0.055)
    config = RenderConfig(method="bin", tile_h=args.tile_h,
                          tile_w=args.tile_w, bin_chunk=args.bin_chunk,
                          bin_esub=args.bin_esub)
    num_rays = args.width * args.height
    results = {}

    def dt(name, fn, *extra):
        """fn(scene, camera) jitted; camera perturbed per call."""
        jfn = jax.jit(fn)

        def call(i):
            cam = camera.replace(pos=camera.pos + np.float32(i) * 1e-7)
            return jfn(scene, cam, *extra)

        t0 = time.perf_counter()
        jax.block_until_ready(call(0))
        log(f"  [{name}] compile {time.perf_counter() - t0:.1f}s")
        v = device_time(call)
        results[name] = v * 1e3
        log(f"  {name}: {v * 1e3:.2f} ms")
        return v

    if args.fwd:
        dt("fwd", lambda s, c: render(s, c, config, None).radiance)

    if args.step:
        w = jnp.linspace(0.3, 1.7, num_rays * 3).reshape(
            args.height, args.width, 3)

        def loss(s, c):
            return jnp.mean(render(s, c, config, None).radiance * w)

        dt("step", jax.grad(loss, argnums=(0, 1)))

    if args.trace:
        def tr(s, c):
            rmd = c.ray_directions()
            hit = trace_rays(s, c.pos, rmd, config, None, c.res_h,
                             c.res_w, proj=c.projection())
            return jnp.sum(hit.t), jnp.sum(hit.tri)

        dt("trace", tr)

    if args.prepass or args.prepass_nogather:
        from cpp_cuda_raytracer_dev_tpu.accel.binning import bin_triangles
        from cpp_cuda_raytracer_dev_tpu.accel.traverse import _ray_table

        th, tw, chunk = args.tile_h, args.tile_w, args.bin_chunk
        t_n = args.tris
        e_cap = int(t_n * config.bin_e_factor) + 8192
        e_cap = -(-e_cap // chunk) * chunk
        hp, wp = (-args.height) % th, (-args.width) % tw
        h2, w2 = args.height + hp, args.width + wp
        n_tx = w2 // tw
        n_tiles = (h2 // th) * n_tx

        def mk(stage):
            def f(s, c):
                obj = s.objects[0]
                proj = c.projection().transformed(obj.pose)
                o = obj.pose.inv_apply(c.pos)
                ts = obj.tris
                v = jnp.stack([ts.p1, ts.p1 + ts.e1, ts.p1 + ts.e2], 1)
                bmin = jnp.min(v.reshape(-1, 3), axis=0)
                bmax = jnp.max(v.reshape(-1, 3), axis=0)
                rays = _ray_table(proj, o, bmin, bmax, n_tiles, n_tx,
                                  th, tw, config.draw_distance)
                out = bin_triangles(proj, o, ts.p1, ts.e1, ts.e2, h2, w2,
                                    th, tw, e_cap=e_cap, chunk=chunk,
                                    eps=config.eps, _stage=stage)
                if stage is None:
                    return (jnp.sum(out.geom), jnp.sum(out.starts),
                            jnp.sum(out.item_tile), jnp.sum(out.item_block),
                            jnp.sum(rays))
                return tuple(jnp.sum(x) for x in out) + (jnp.sum(rays),)
            return f

        if args.prepass:
            dt("prepass", mk(None))
        if args.prepass_nogather:
            dt("prepass_nogather", mk("starts"))

    if args.bwd_split:
        w = jnp.linspace(0.3, 1.7, num_rays * 3).reshape(
            args.height, args.width, 3)

        def loss3(lv, s, c):
            return jnp.mean(render(s, c, config, None).radiance * w)

        def loss_phong(ph, s, c):
            return jnp.mean(render(s.replace(phong=ph), c, config,
                                   None).radiance * w)

        def loss_color(col, s, c):
            o = s.objects[0]
            s2 = s.replace(objects=[o.replace(tris=o.tris.replace(
                color=col))])
            return jnp.mean(render(s2, c, config, None).radiance * w)

        def loss_verts(flat9, s, c):
            # Triangles stores flat (T,) component leaves (r5 layout)
            o = s.objects[0]
            names = ("p1x", "p1y", "p1z", "e1x", "e1y", "e1z",
                     "e2x", "e2y", "e2z")
            s2 = s.replace(objects=[o.replace(
                tris=o.tris.replace(**dict(zip(names, flat9))))])
            return jnp.mean(render(s2, c, config, None).radiance * w)

        def loss_cam(pos, s, c):
            return jnp.mean(render(s, c.replace(pos=pos), config,
                                   None).radiance * w)

        dt("grad_none_fwdonly",
           lambda s, c: render(s, c, config, None).radiance)
        dt("grad_phong",
           lambda s, c: jax.grad(loss_phong)(s.phong, s, c))
        dt("grad_cam",
           lambda s, c: jax.grad(loss_cam)(c.pos, s, c))
        dt("grad_color",
           lambda s, c: jax.grad(loss_color)(s.objects[0].tris.color,
                                             s, c))
        dt("grad_verts",
           lambda s, c: jax.grad(loss_verts)(
               tuple(getattr(s.objects[0].tris, n) for n in
                     ("p1x", "p1y", "p1z", "e1x", "e1y", "e1z",
                      "e2x", "e2y", "e2z")), s, c))

    if args.prims:
        t_n = args.tris
        r = num_rays
        rng = np.random.default_rng(0)
        idx = jnp.asarray(rng.integers(0, t_n, r), jnp.int32)
        tbl15 = jnp.asarray(rng.standard_normal((t_n, 15)), jnp.float32)
        keys = jnp.asarray(rng.integers(0, t_n, r), jnp.int32)
        iota = jnp.arange(r, dtype=jnp.int32)

        def prim(name, f, *arrs):
            jf = jax.jit(f)

            def call(i):
                return jf(arrs[0] + np.float32(i) * 1e-7, *arrs[1:])

            t0 = time.perf_counter()
            jax.block_until_ready(call(0))
            log(f"  [{name}] compile {time.perf_counter() - t0:.1f}s")
            v = device_time(call)
            results[name] = v * 1e3
            log(f"  {name}: {v * 1e3:.3f} ms")

        prim("take15_R", lambda t, ix: jnp.sum(jnp.take(t, ix, axis=0)),
             tbl15, idx)
        prim("take3_R",
             lambda t, ix: jnp.sum(jnp.take(t[:, :3], ix, axis=0)),
             tbl15, idx)
        prim("take8_R",
             lambda t, ix: jnp.sum(jnp.take(t[:, :8], ix, axis=0)),
             tbl15, idx)
        # argsort: consume order-dependently (sum of a permutation is
        # constant and could fold)
        prim("argsort_R",
             lambda k: jnp.sum(jnp.argsort(
                 (k + jnp.zeros((), k.dtype)).astype(jnp.int32)) * iota),
             keys.astype(jnp.float32))
        prim("sort1pay_R",
             lambda k: jnp.sum(jax.lax.sort(
                 (k, iota), num_keys=1)[1] * iota),
             keys.astype(jnp.float32))
        # full backward-style permute: argsort + 15-wide row permute
        prim("perm15_R",
             lambda t, ix: jnp.sum(jnp.take(t[:r], jnp.argsort(ix),
                                            axis=0)),
             tbl15, keys)

    if args.stats:
        import dataclasses

        from cpp_cuda_raytracer_dev_tpu.accel.traverse import (
            intersect_binned)
        scfg = dataclasses.replace(config, with_stats=True)
        rmd_all = jnp.asarray(camera.ray_directions())
        proj = camera.projection()
        _, stats = jax.jit(
            lambda o_, d_: intersect_binned(
                o_, d_, scene.objects[0].tris, proj, scfg,
                camera.res_h, camera.res_w)
        )(jnp.asarray(camera.pos), rmd_all)
        results["entries"] = int(stats["entries"])
        results["steps_mean"] = float(np.asarray(stats["steps"]).mean())
        results["chunks_mean"] = float(np.asarray(stats["chunks"]).mean())
        log(f"  stats: {results}")

    cfg_tag = (f"t{args.tile_h}x{args.tile_w}_c{args.bin_chunk}"
               f"_e{args.bin_esub}")
    print(json.dumps({"config": cfg_tag, **results}))


if __name__ == "__main__":
    main()
