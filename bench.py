#!/usr/bin/env python
"""Benchmark harness — the BASELINE.md headline numbers on real hardware.

Reference bar (BASELINE.md): Stanford dragon ~800k tris @ 960x540, ~100 FPS
forward-only on the author's CUDA GPU => ~5.2e7 primary rays/s. The dragon
PLY is stripped from the reference repo, so the headline scene here is a
deterministic dragon-class mesh (same triangle count, utils/procgen.py);
`--scene rabbit` benches the real rabbit_70k.ply when present.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
(vs_baseline > 1.0 means faster than the reference's published number, with
our number including the FULL backward pass.) Details go to
BENCH_DETAILS.json and stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

REF_RAYS_PER_SEC = 960 * 540 * 100.0  # README.md:19 at 1 ray/pixel


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def build_scene(args):
    from cpp_cuda_raytracer_dev_tpu import (Camera, RenderConfig, Scene,
                                            SceneObject, Triangles)
    from cpp_cuda_raytracer_dev_tpu.accel.traverse import ClusterAccel
    from cpp_cuda_raytracer_dev_tpu.utils.procgen import dragon_class_mesh

    if args.scene == "rabbit":
        from cpp_cuda_raytracer_dev_tpu.io import ply
        mesh = ply.load_mesh(args.rabbit_path)
        tv = mesh.tri_vertices
        lo, hi = tv.reshape(-1, 3).min(0), tv.reshape(-1, 3).max(0)
        center = (lo + hi) / 2
        pos = center + np.array([0, 0, -(hi - lo)[2] * 2.2], np.float32)
    elif args.scene == "clustered":
        from cpp_cuda_raytracer_dev_tpu.utils.procgen import clustered_mesh
        tv = clustered_mesh(args.tris)
        center = np.zeros(3, np.float32)
        pos = np.array([0.6, 0.25, -2.6], np.float32)   # oblique view
    else:
        tv = dragon_class_mesh(args.tris)
        center = np.zeros(3, np.float32)
        pos = np.array([0.0, 0.0, -3.0], np.float32)

    tris = Triangles.from_vertices(tv)
    scene = Scene.create([SceneObject.create(tris)])
    camera = Camera.create(args.width, args.height, pos=pos, look_at=center,
                           up=[0.0, 1.0, 0.0], film_h=0.024,
                           focal=0.055 if args.scene != "rabbit" else 0.035)
    if args.backface_cull is None:
        # auto: exact for the closed procgen surfaces viewed from outside
        # (validated below by full-image agreement vs the two-sided
        # oracle); rabbit has base holes that can expose back faces.
        args.backface_cull = args.scene != "rabbit"
    if args.backface_cull and args.bin_e_factor == 1.2:
        # every per-entry prepass stage is static-shaped at
        # e_cap = e_factor * tris, so the cull only pays off with a tight
        # cap (r5: dragon live entries drop 789k -> 373k = 0.47/tri).
        # Overflow still self-heals via the 2x re-bin escalation and is
        # reported in the artifact.
        args.bin_e_factor = 0.55 if args.scene == "dragon-class" else 0.8
    config = RenderConfig(method=args.method, leaf_size=args.leaf_size,
                          tile_h=args.tile_h, tile_w=args.tile_w,
                          max_candidates=args.max_candidates,
                          chunk=args.chunk, group_size=args.group_size,
                          max_groups=args.max_groups,
                          sub_h=args.sub_h, sub_w=args.sub_w,
                          bin_chunk=args.bin_chunk,
                          bin_e_factor=args.bin_e_factor,
                          mt_precision=args.mt_precision,
                          backface_cull=args.backface_cull)
    accel = None
    if args.method == "kd":
        # reference-semantics traversal needs the flattened KD tables, not
        # cluster blocks (models/renderer.py trace_rays hands accel[oi]
        # straight to kd_intersect)
        from cpp_cuda_raytracer_dev_tpu.accel.traverse import KDTables
        from cpp_cuda_raytracer_dev_tpu.utils.cache import build_kd_cached
        t0 = time.perf_counter()
        amin, amax = [np.asarray(a) for a in tris.aabbs()]
        tree = build_kd_cached(amin, amax, min_node_size=config.leaf_size)
        accel = (KDTables.from_tree(tree, tris),)
        log(f"kd tables build: {time.perf_counter() - t0:.2f}s "
            f"({tree.num_nodes} nodes, max_leaf={accel[0].max_leaf})")
    elif args.method in ("grid", "pallas", "pallas2"):
        t0 = time.perf_counter()
        accel = (ClusterAccel.build(tris, leaf_size=config.leaf_size),)
        log(f"accel build: {time.perf_counter() - t0:.2f}s "
            f"({accel[0].num_clusters} clusters x {config.leaf_size})")
    return scene, camera, config, accel, tv.shape[0]


def validate(scene, camera, config, accel, n_sample=4096, seed=0):
    """Grid path must agree with the brute-force oracle on sampled rays."""
    import jax.numpy as jnp

    from cpp_cuda_raytracer_dev_tpu.models.renderer import trace_rays
    from cpp_cuda_raytracer_dev_tpu.utils.config import RenderConfig as RC

    proj = (camera.projection() if config.method in ("bin", "raster")
            else None)
    rmd = camera.ray_directions()
    hit_g = trace_rays(scene, camera.pos, rmd, config, accel,
                       camera.res_h, camera.res_w, proj=proj)
    rng = np.random.default_rng(seed)
    idx = rng.choice(rmd.shape[0], n_sample, replace=False)
    sub = jnp.asarray(rmd[idx])
    ref_cfg = RC(method="fixed", chunk=config.chunk,
                 draw_distance=config.draw_distance, eps=config.eps)
    hit_f = trace_rays(scene, camera.pos, sub, ref_cfg)
    agree = float(np.mean(np.asarray(hit_g.tri)[idx] == np.asarray(hit_f.tri)))
    terr = float(np.max(np.abs(np.asarray(hit_g.t)[idx]
                               - np.asarray(hit_f.t))))
    hit_rate = float(np.mean(np.asarray(hit_g.tri) >= 0))
    log(f"validate: agree={agree:.4f} max|dt|={terr:.2e} "
        f"hit_rate={hit_rate:.3f}")
    return agree, hit_rate


def bench(fn, scene, camera, n_lo=3, n_hi=7):
    """TRUE device seconds per frame by the batch-delta method.

    METHODOLOGY FIX (round 4): the previous harness — repeated identical
    calls fenced with jax.block_until_ready — under-reported by ~4.7x on
    the tunneled axon runtime: block_until_ready does not force remote
    execution there, so the loop timed dispatch, not rendering (measured:
    0.05 ms reported vs 207 ms real for the same frame). Rounds 1-3
    headline numbers inherit that flaw. This harness enqueues n DISTINCT
    frames (camera perturbed per call), folds one element of every output
    into one scalar, materializes it on the host (the only reliable
    fence), and reports (t(n_hi) - t(n_lo)) / (n_hi - n_lo) so fixed
    tunnel latency cancels.
    """
    import numpy as np

    from cpp_cuda_raytracer_dev_tpu.utils.profiling import device_time

    def call(i):
        # wrap the perturbation (509 prime: distinct dispatches within any
        # measurement window, defeating the runtime dedup cache) so long
        # sweeps never accumulate an offset big enough to shift bin
        # occupancy: max 5e-5 world units ~ 0.04 px at the bench camera.
        cam = camera.replace(pos=camera.pos + np.float32(i % 509) * 1e-7)
        return fn(scene, cam)

    # 5 replicate deltas (median): single deltas on the tunneled runtime
    # carry +-10-20% jitter and whole sessions occasionally spike ~1.7x
    # (r5: one clustered step read 87.9 ms vs 49.8-50.4 on immediate
    # re-measurement)
    return device_time(call, n_lo=n_lo, n_hi=n_hi, repeats=5)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="dragon-class",
                   choices=["dragon-class", "rabbit", "clustered"])
    p.add_argument("--tris", type=int, default=800_000)
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--height", type=int, default=540)
    p.add_argument("--method", default="bin")
    p.add_argument("--leaf-size", type=int, default=128)
    p.add_argument("--tile-h", type=int, default=16)
    p.add_argument("--tile-w", type=int, default=32)
    p.add_argument("--max-candidates", type=int, default=64)
    p.add_argument("--sub-h", type=int, default=0)
    p.add_argument("--sub-w", type=int, default=0)
    p.add_argument("--chunk", type=int, default=2048)
    p.add_argument("--group-size", type=int, default=32)
    p.add_argument("--max-groups", type=int, default=24,
                   help="two-level cull: groups per tile (0 = flat cull)")
    p.add_argument("--bin-chunk", type=int, default=512)
    p.add_argument("--bin-e-factor", type=float, default=1.2)
    p.add_argument("--mt-precision", default="highest",
                   choices=["default", "high", "highest"])
    p.add_argument("--backface-cull", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="cull triangles facing away from the camera before "
                        "binning (default: on for the closed procgen "
                        "scenes, off for rabbit; exactness is validated by "
                        "--agree-full)")
    p.add_argument("--quick", action="store_true",
                   help="small smoke-test configuration")
    p.add_argument("--skip-validate", action="store_true")
    p.add_argument("--agree-full", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="full-image agreement vs the brute-force oracle "
                        "(default ON so the recorded BENCH_DETAILS always "
                        "carries it; --no-agree-full to skip)")
    p.add_argument("--rabbit-path",
                   default="/root/reference/TEST_Dungeonrun/rabbit_70k.ply")
    args = p.parse_args()
    if args.quick:
        args.tris, args.width, args.height = 20_000, 256, 256
        args.leaf_size, args.max_candidates = 64, 24
        args.tile_h, args.tile_w, args.sub_h, args.sub_w = 16, 16, 0, 0
        args.bin_chunk = 128

    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")

    # The remote-chip tunnel can wedge (see .claude/skills/verify): a tiny
    # device op that doesn't land within 3 minutes means every later call
    # would hang forever. Fail fast with a diagnostic line instead.
    import threading
    probe_ok = threading.Event()

    def _probe():
        jax.block_until_ready(jnp.ones((8,)) * 2.0)
        probe_ok.set()

    threading.Thread(target=_probe, daemon=True).start()
    if not probe_ok.wait(timeout=180.0):
        print(json.dumps({
            "metric": "device probe failed (TPU tunnel wedged)",
            "value": 0, "unit": "rays/s", "vs_baseline": 0.0}))
        import os
        os._exit(3)
    scene, camera, config, accel, num_tris = build_scene(args)
    num_rays = camera.res_w * camera.res_h

    from cpp_cuda_raytracer_dev_tpu.models.renderer import render

    fwd = jax.jit(lambda s, c: render(s, c, config, accel).radiance)

    w = jnp.linspace(0.3, 1.7, num_rays * 3).reshape(
        camera.res_h, camera.res_w, 3)

    def loss(s, c):
        return jnp.mean(render(s, c, config, accel).radiance * w)

    fwd_bwd = jax.jit(jax.grad(loss, argnums=(0, 1)))

    t0 = time.perf_counter()
    jax.block_until_ready(fwd(scene, camera))
    log(f"fwd compile: {time.perf_counter() - t0:.1f}s")

    agree = 1.0
    agree_full = None
    overflow_stats = None
    if not args.skip_validate:
        agree, hit_rate = validate(scene, camera, config, accel)
    if args.agree_full:
        # full-image agreement against the exact brute-force oracle
        # (matmul-form fixed-origin MT, the analogue of the reference's
        # own ground-truth kernel intersect_trixel_cuda,
        # Trixel.cu:173-209) — every ray, not a sample (VERDICT r2 ask
        # #8). Processed in ray slabs to bound the (rays x tri-chunk)
        # intermediate; one compile, ~1.2e12 MACs on the MXU. (The KD
        # full-image pass used previously faults the TPU worker at
        # dragon scale — per-ray while_loops are not a viable oracle on
        # this chip.)
        from cpp_cuda_raytracer_dev_tpu.models.renderer import trace_rays
        from cpp_cuda_raytracer_dev_tpu.utils.config import (
            RenderConfig as RC)
        rmd_all = jnp.asarray(camera.ray_directions())
        proj = (camera.projection()
                if config.method in ("bin", "raster") else None)
        hit_m = jax.jit(lambda o_, d_: trace_rays(
            scene, o_, d_, config, accel, camera.res_h, camera.res_w,
            proj=proj))(jnp.asarray(camera.pos), rmd_all)
        ref_cfg = RC(method="fixed", chunk=1024,
                     draw_distance=config.draw_distance, eps=config.eps)
        slab = 32768
        r_tot = rmd_all.shape[0]
        pad = (-r_tot) % slab
        rmd_pad = jnp.concatenate(
            [rmd_all, jnp.broadcast_to(rmd_all[:1], (pad, 3))])
        oracle_fn = jax.jit(lambda o_, d_: trace_rays(
            scene, o_, d_, ref_cfg).tri)
        tris_ref = []
        for s in range(rmd_pad.shape[0] // slab):
            tris_ref.append(np.asarray(oracle_fn(
                jnp.asarray(camera.pos),
                rmd_pad[s * slab:(s + 1) * slab])))
        tri_oracle = np.concatenate(tris_ref)[:r_tot]
        agree_full = float(np.mean(
            np.asarray(hit_m.tri) == tri_oracle))
        log(f"agree_full vs brute oracle (all {r_tot} rays): "
            f"{agree_full:.6f}")
    if args.method == "pallas2":
        # per-tile candidate telemetry: scanned steps + residual overflow
        # (clusters a tile saw beyond its budget AFTER escalation — any
        # nonzero residual means potentially dropped geometry)
        import dataclasses

        from cpp_cuda_raytracer_dev_tpu.accel.traverse import (
            intersect_clustered_pallas_v2)
        scfg = dataclasses.replace(config, with_stats=True)
        rmd_all = jnp.asarray(camera.ray_directions())
        _, stats = jax.jit(
            lambda o_, d_: intersect_clustered_pallas_v2(
                o_, d_, accel[0], scfg, camera.res_h, camera.res_w)
        )(jnp.asarray(camera.pos), rmd_all)
        ovf = np.asarray(stats["overflow"])
        cnt = np.asarray(stats["count"])
        steps = np.asarray(stats["steps"])
        overflow_stats = {
            "tiles": int(ovf.size),
            "overflow_tiles_residual": int((ovf > 0).sum()),
            "overflow_max": int(ovf.max()),
            "count_mean": float(cnt.mean()),
            "steps_mean": float(steps.mean()),
            "steps_hist": np.histogram(
                steps, bins=[0, 1, 2, 4, 8, 16, 32, 64, 1 << 30]
            )[0].tolist(),
        }
        log(f"overflow: residual_tiles={overflow_stats['overflow_tiles_residual']}"
            f" max={overflow_stats['overflow_max']}"
            f" steps_mean={overflow_stats['steps_mean']:.1f}")
    elif args.method == "bin":
        # bin-path telemetry: entry-table occupancy + overflow (any nonzero
        # overflow means dropped geometry -> raise bin_e_factor)
        import dataclasses

        from cpp_cuda_raytracer_dev_tpu.accel.traverse import intersect_binned
        scfg = dataclasses.replace(config, with_stats=True)
        rmd_all = jnp.asarray(camera.ray_directions())
        proj = camera.projection()
        _, stats = jax.jit(
            lambda o_, d_: intersect_binned(
                o_, d_, scene.objects[0].tris, proj, scfg,
                camera.res_h, camera.res_w)
        )(jnp.asarray(camera.pos), rmd_all)
        steps = np.asarray(stats["steps"])
        chunks = np.asarray(stats["chunks"])
        overflow_stats = {
            "entries": int(stats["entries"]),
            "overflow_entries": int(stats["overflow"]),
            "cross_tris": int(stats["cross"]),
            "steps_mean": float(steps.mean()),
            "chunks_mean": float(chunks.mean()),
        }
        log(f"bin: entries={overflow_stats['entries']}"
            f" overflow={overflow_stats['overflow_entries']}"
            f" cross={overflow_stats['cross_tris']}"
            f" steps_mean={overflow_stats['steps_mean']:.1f}"
            f"/{overflow_stats['chunks_mean']:.1f}")

    dt_f = bench(fwd, scene, camera)
    log(f"forward: {dt_f * 1e3:.2f} ms/frame = {1 / dt_f:.1f} FPS "
        f"= {num_rays / dt_f:.3e} rays/s")

    t0 = time.perf_counter()
    jax.block_until_ready(fwd_bwd(scene, camera))
    log(f"fwd+bwd compile: {time.perf_counter() - t0:.1f}s")
    dt_fb = bench(fwd_bwd, scene, camera)
    log(f"fwd+bwd: {dt_fb * 1e3:.2f} ms/step = {1 / dt_fb:.1f} FPS "
        f"= {num_rays / dt_fb:.3e} rays/s")

    # SECONDARY detail row (not the headline): inverse-rendering-typical
    # step differentiating only pose + lighting/material scalars + camera
    # (the parameters the reference's interactive loop mutates). The
    # headline above differentiates w.r.t. EVERYTHING including the
    # 800k-row vertex/color tables, whose gather-VJP dominates backward
    # (BWD_SPLIT_r05.json).
    def loss_pc(po, ph, cpos, s, c):
        o = s.objects[0]
        s2 = s.replace(objects=[o.replace(pose=po)], phong=ph)
        return jnp.mean(render(s2, c.replace(pos=cpos), config,
                               accel).radiance * w)

    fwd_bwd_pc = jax.jit(lambda s, c: jax.grad(loss_pc, argnums=(0, 1, 2))(
        s.objects[0].pose, s.phong, c.pos, s, c))
    jax.block_until_ready(fwd_bwd_pc(scene, camera))
    dt_pc = bench(fwd_bwd_pc, scene, camera)
    log(f"fwd+bwd (pose/light/camera only): {dt_pc * 1e3:.2f} ms/step "
        f"= {1 / dt_pc:.1f} FPS = {num_rays / dt_pc:.3e} rays/s")

    rays_s = num_rays / dt_fb
    details = {
        "scene": args.scene, "num_tris": num_tris,
        "resolution": [args.width, args.height],
        "method": args.method, "leaf_size": args.leaf_size,
        "max_candidates": args.max_candidates,
        "fwd_ms": dt_f * 1e3, "fwd_fps": 1 / dt_f,
        "fwd_rays_per_sec": num_rays / dt_f,
        "fwd_bwd_ms": dt_fb * 1e3, "fwd_bwd_fps": 1 / dt_fb,
        "fwd_bwd_rays_per_sec": rays_s,
        "fwd_bwd_pose_light_camera_only_ms": dt_pc * 1e3,
        "oracle_agreement": agree,
        "agree_full_vs_oracle": agree_full,
        "overflow_stats": overflow_stats,
        "reference_rays_per_sec_fwd_only": REF_RAYS_PER_SEC,
        "timing_methodology": "batch-delta, distinct frames, host-forced "
            "(r4 fix: block_until_ready does not fence the tunneled axon "
            "runtime; r1-r3 numbers under-reported ~4.7x)",
    }
    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=2)

    print(json.dumps({
        "metric": f"rays/sec/chip fwd+bwd ({args.scene} {num_tris} tris "
                  f"@ {args.width}x{args.height})",
        "value": round(rays_s),
        "unit": "rays/s",
        "vs_baseline": round(rays_s / REF_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
