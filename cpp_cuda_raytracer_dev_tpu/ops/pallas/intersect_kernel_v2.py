"""Gen-2 fused tile-intersection kernel: dynamic candidate loop + manual DMA.

The gen-1 kernel (intersect_kernel.py) uses a static (tiles x K) grid and
predicates off useless steps — correct, but every tile still *iterates* K
steps. This version makes the candidate loop dynamic, the TPU analogue of
the reference's early-terminating ordered KD traversal
(``TEST_Dungeonrun/Trixel.cu:70-169``):

  grid = (num_tiles,); per tile one kernel invocation:
    - ray dirs (3, P), candidate AABBs (K, 8) resident in VMEM;
    - a `lax.while_loop` walks candidates nearest-first and STOPS as soon
      as no remaining cluster can beat any ray's current best hit:
      cond = k < count[t]  AND  suffmin_dist[t, k] < max_p best_t[p],
      where suffmin_dist is the suffix-min over candidates of the
      conservative Euclidean origin->AABB distance (a lower bound on any
      hit t for unit-norm rays) — computed in the XLA cull stage;
    - per candidate the AABB is slab-tested per ray bounded by best_t;
      the Möller–Trumbore block only runs when some ray can improve;
    - cluster geometry (9, L: p1|e1|e2 rows) is DMA'd HBM->VMEM by
      hand through a depth-_DMA_DEPTH prefetch pipeline (_DMA_NBUF
      buffers), so each copy is issued several steps of compute before
      its wait — single-buffering stalled every step on HBM latency;
    - the MT math is the gen-1 MXU contraction (3L, 3)x(3, P) with
      sign-aware division-free acceptance; winners are tracked as
      k*L + slot via a free iota (triangle ids are decoded by XLA after
      the kernel), so the int id row needs neither DMA nor transpose.
      (A K=4 variant carrying t_d through the contraction measured 45%
      slower — the 4L-row output crosses a Mosaic tiling cliff.)

Compute and DMA cost now track the *dynamic* number of useful candidates
per tile instead of the static K bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.dtypes import MT_EPSILON

_HP = jax.lax.Precision.HIGHEST
_PRECISIONS = {"default": jax.lax.Precision.DEFAULT,
               "high": jax.lax.Precision.HIGH,
               "highest": jax.lax.Precision.HIGHEST}
# Miss sentinel for the packed winner select: must stay above any real t
# (and above draw_distance) after its low mantissa bits are zeroed.
_MISS_T = 3.0e38
# Prefetch pipeline: depth (how many steps ahead a copy is issued) and
# buffer count (must exceed depth so a slot is consumed before reuse).
_DMA_DEPTH = 4
_DMA_NBUF = 6


def _kernel(cand_ref, count_ref, origin_ref,               # scalar prefetch
            d_ref, box_ref, geom_hbm,                      # blocks / HBM
            out_t_ref, out_tri_ref, out_steps_ref,         # outputs
            geom_vmem, sem,                                # scratch
            *, eps: float, draw_distance: float, leaf: int, kmax: int,
            n_sub: int, debug_mode: int, mt_precision: str):
    t = pl.program_id(0)
    count = count_ref[t]

    out_t_ref[...] = jnp.full_like(out_t_ref, draw_distance)
    out_tri_ref[...] = jnp.full_like(out_tri_ref, -1)

    d = d_ref[0]                                           # (3, P)
    ox, oy, oz = origin_ref[0], origin_ref[1], origin_ref[2]
    dsf = jnp.where(jnp.abs(d) < 1e-30,
                    jnp.where(d < 0, -1e-30, 1e-30), d)
    inv = pl.reciprocal(dsf, approx=False)                 # (3, P)

    # Per-ray hit-distance bound: a ray can't hit anything past its exit
    # from the scene's root AABB (origin_ref[3:9] = root bmin|bmax), and a
    # ray that misses the root box entirely can't hit at all (bound 0).
    # Without this, every tile touching background rays keeps best_t at
    # draw_distance and scans its whole candidate list.
    rt_ax = (origin_ref[3] - ox) * inv[0:1]
    rt_bx = (origin_ref[6] - ox) * inv[0:1]
    rt_ay = (origin_ref[4] - oy) * inv[1:2]
    rt_by = (origin_ref[7] - oy) * inv[1:2]
    rt_az = (origin_ref[5] - oz) * inv[2:3]
    rt_bz = (origin_ref[8] - oz) * inv[2:3]
    r_near = jnp.maximum(
        jnp.maximum(jnp.minimum(rt_ax, rt_bx), jnp.minimum(rt_ay, rt_by)),
        jnp.minimum(rt_az, rt_bz))
    r_far = jnp.minimum(
        jnp.minimum(jnp.maximum(rt_ax, rt_bx), jnp.maximum(rt_ay, rt_by)),
        jnp.maximum(rt_az, rt_bz))
    root_hit = (r_far >= jnp.maximum(r_near, 0.0) - 1e-4)
    bound = jnp.where(root_hit, r_far + 1e-3, 0.0)
    bound = jnp.minimum(bound, draw_distance)              # (1, P)

    def dma(slot, k):
        # cand rides SMEM flattened 1-D: 2-D SMEM rows are padded to 128
        # lanes, which blew the 1 MiB budget at fine tile sizes
        return pltpu.make_async_copy(
            geom_hbm.at[cand_ref[t * kmax + k]], geom_vmem.at[slot],
            sem.at[slot])

    # Depth-D prefetch pipeline: each candidate's 5 KB copy is issued D
    # steps before it is consumed. With the old 2-buffer/depth-1 pipeline
    # the copy was issued only one step's compute (~1-2 us) before the
    # wait, so every step stalled on HBM latency.
    for i in range(_DMA_DEPTH):
        @pl.when(i < count)
        def _warmup(i=i):
            dma(i % _DMA_NBUF, i).start()

    def body(carry):
        k, wb, _snext, nmt = carry
        slot = jax.lax.rem(k, _DMA_NBUF)

        # prefetch candidate k+D while this one computes
        @pl.when(k + _DMA_DEPTH < count)
        def _prefetch():
            dma(jax.lax.rem(k + _DMA_DEPTH, _DMA_NBUF), k + _DMA_DEPTH
                ).start()

        # slab-test this candidate per ray, bounded by current best
        row = box_ref[0, pl.ds(k, 1), :]                   # (1, 8)
        ta_x = (row[:, 0:1] - ox) * inv[0:1]
        tb_x = (row[:, 3:4] - ox) * inv[0:1]
        ta_y = (row[:, 1:2] - oy) * inv[1:2]
        tb_y = (row[:, 4:5] - oy) * inv[1:2]
        ta_z = (row[:, 2:3] - oz) * inv[2:3]
        tb_z = (row[:, 5:6] - oz) * inv[2:3]
        t_near = jnp.maximum(
            jnp.maximum(jnp.minimum(ta_x, tb_x), jnp.minimum(ta_y, tb_y)),
            jnp.minimum(ta_z, tb_z))
        t_far = jnp.minimum(
            jnp.minimum(jnp.maximum(ta_x, tb_x), jnp.maximum(ta_y, tb_y)),
            jnp.maximum(ta_z, tb_z))
        best = jnp.minimum(out_t_ref[0], bound)            # (1, P)
        box_ok = ((t_far >= jnp.maximum(t_near, 0.0) - 1e-4)
                  & (t_near < best))

        # the slot must be consumed before it can be reused NBUF steps on,
        # so always wait — with a depth-4 pipeline the copy landed long ago
        dma(slot, k).wait()

        if debug_mode != 2:
            _mt_gate = jnp.any(box_ok)
        else:                      # debug: loop/slab/DMA machinery only
            _mt_gate = (k < -1)

        @pl.when(_mt_gate)
        def _mt():
            # geometry rides (9, L): components on sublanes, slots on
            # lanes — manual DMA requires the trailing dim 128-aligned
            g = geom_vmem[slot]            # (9, L): p1|e1|e2 rows
            p1x, p1y, p1z = g[0:1], g[1:2], g[2:3]           # (1, L)
            e1x, e1y, e1z = g[3:4], g[4:5], g[5:6]
            e2x, e2y, e2z = g[6:7], g[7:8], g[8:9]
            tvx, tvy, tvz = ox - p1x, oy - p1y, oz - p1z

            mdx = e2y * e1z - e2z * e1y
            mdy = e2z * e1x - e2x * e1z
            mdz = e2x * e1y - e2y * e1x
            mux = e2y * tvz - e2z * tvy
            muy = e2z * tvx - e2x * tvz
            muz = e2x * tvy - e2y * tvx
            mvx = tvy * e1z - tvz * e1y
            mvy = tvz * e1x - tvx * e1z
            mvz = tvx * e1y - tvy * e1x
            td_row = e2x * mvx + e2y * mvy + e2z * mvz       # (1, L)

            # Epsilon folding (all on (1, L) rows — negligible next to the
            # (L, sp) epilogue): emit det' = (1-eps)·det, u' = u - eps·det,
            # v' = v - eps·det from the contraction, so the acceptance
            # tests below become pure sign tests against det':
            #   u >= eps        <=>  u'·det' >= 0
            #   v >= eps        <=>  v'·det' >= 0
            #   u+v <= 1+eps    <=>  (det' - u' - v')·det' >= 0
            #   t >= eps        <=>  td·det' - eps·det'² >= 0
            #   |det| >= eps    <=>  det'² >= ((1-eps)·eps)²
            # (td below is pre-scaled by (1-eps) so t = td/det' exactly).
            k1 = 1.0 - eps
            eps2_det = (k1 * eps) ** 2
            td = jnp.transpose(td_row) * k1                  # (L, 1)
            m = jnp.concatenate(                             # (3, 3L)
                [jnp.concatenate([mdx * k1, mdy * k1, mdz * k1], axis=0),
                 jnp.concatenate([mux - eps * mdx, muy - eps * mdy,
                                  muz - eps * mdz], axis=0),
                 jnp.concatenate([mvx - eps * mdx, mvy - eps * mdy,
                                  mvz - eps * mdz], axis=0)], axis=1)

            # Sub-tile predication: rays arrive sub-tile-major, so each
            # sub-tile is a contiguous lane slice. Only sub-tiles where
            # some ray can still improve pay the MT matmul + epilogue —
            # a candidate cluster near one corner of a 32x32 tile no
            # longer charges all 1024 rays.
            sp = d.shape[1] // n_sub
            for q in range(n_sub):
                lo, hi = q * sp, (q + 1) * sp

                @pl.when(jnp.any(box_ok[:, lo:hi]))
                def _mt_sub(lo=lo, hi=hi):
                    if debug_mode == 3:
                        # branch/predicate machinery only: consume the DMA'd
                        # geometry with a no-op update so nothing is DCE'd
                        probe = jnp.max(g) * 1e-30 + 1e30
                        out_t_ref[0, :, lo:hi] = jnp.minimum(
                            out_t_ref[0, :, lo:hi], probe)
                        return
                    out = jax.lax.dot_general(
                        m, d[:, lo:hi], (((0,), (0,)), ((), ())),
                        precision=_PRECISIONS[mt_precision],
                        preferred_element_type=jnp.float32)
                    det1 = out[0 * leaf:1 * leaf]            # (L, sp)
                    up = out[1 * leaf:2 * leaf]
                    vp = out[2 * leaf:3 * leaf]

                    # Division-free acceptance as a min of sign products
                    # against det' (padding slots have zero geometry =>
                    # det' == 0 => the |det| test rejects them). One fused
                    # min-tree replaces the r1 kernel's sign-normalize +
                    # 5-compare/4-and chain.
                    dd2 = det1 * det1
                    q = jnp.minimum(up * det1, vp * det1)
                    q = jnp.minimum(q, (det1 - up - vp) * det1)
                    q = jnp.minimum(q, td * det1 - eps * dd2)
                    ok = (q >= 0.0) & (dd2 >= eps2_det)
                    # approx reciprocal (~2^-8) + one Newton step (~1e-5
                    # relative): orders of magnitude cheaper than the exact
                    # divide, tight enough for nearest-hit selection and the
                    # raw depth output. t = td/det' is sign-correct without
                    # normalization.
                    r = pl.reciprocal(det1, approx=True)
                    r = r * (2.0 - det1 * r)
                    tt = jnp.where(ok, td * r, _MISS_T)      # (L, sp)

                    # Winner select in ONE reduction: t is positive for
                    # every accepted slot, so its f32 bits order like the
                    # value; zero the low 7 mantissa bits (2^-17 relative
                    # depth quantization) and pack the slot id there.
                    key = jax.lax.bitcast_convert_type(tt, jnp.int32)
                    key = ((key & ~(leaf - 1))
                           | jax.lax.broadcasted_iota(jnp.int32,
                                                      tt.shape, 0))
                    kmin = jnp.min(key, axis=0, keepdims=True)  # (1, sp)
                    win = kmin & (leaf - 1)
                    tmin = jax.lax.bitcast_convert_type(
                        kmin & ~(leaf - 1), jnp.float32)
                    enc = k * leaf + win                     # (1, sp)

                    cur_t = out_t_ref[0, :, lo:hi]           # (1, sp)
                    better = tmin < cur_t
                    out_t_ref[0, :, lo:hi] = jnp.where(better, tmin, cur_t)
                    out_tri_ref[0, :, lo:hi] = jnp.where(
                        better, enc, out_tri_ref[0, :, lo:hi])

        wb = jnp.min(jnp.array(
            [wb, jnp.max(jnp.minimum(out_t_ref[0], bound))]))
        # suffix-min certificate rides boxes column 6 (SMEM is only 1 MiB
        # — prefetching a (tiles, K) f32 there capped the tile count)
        snext = jnp.max(
            box_ref[0, pl.ds(jnp.minimum(k + 1, kmax - 1), 1), 6:7])
        if debug_mode == 1:        # telemetry: count active sub-tiles
            sp = d.shape[1] // n_sub
            nmt = nmt + sum(
                jnp.any(box_ok[:, q * sp:(q + 1) * sp]).astype(jnp.int32)
                for q in range(n_sub))
        return k + 1, wb, snext, nmt

    def cond(carry):
        k, wb, snext, _nmt = carry
        return (k < count) & (snext < wb)

    k_end, _, _, n_mt = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.max(bound), jnp.max(box_ref[0, 0:1, 6:7]),
         jnp.int32(0)))
    # dynamic-work telemetry: candidates scanned (lane 0) and, in debug
    # mode 1, MT sub-tile blocks executed (lane 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, out_steps_ref.shape, 2)
    out_steps_ref[...] = jnp.where(lane == 1, n_mt, k_end)

    # On early exit (k_end < count), candidates [k_end, min(count, k_end+D))
    # are still in flight (warmup copies if the loop never ran, or the
    # body's prefetches). Drain them all, or the next grid step inherits
    # signaled semaphores and the runtime aborts.
    for j in range(_DMA_DEPTH):
        @pl.when(k_end + j < count)
        def _drain(j=j):
            dma(jax.lax.rem(k_end + j, _DMA_NBUF), k_end + j).wait()


@functools.partial(
    jax.jit,
    static_argnames=("leaf", "eps", "draw_distance", "n_sub", "debug_mode",
                     "mt_precision", "interpret"))
def pallas_tile_intersect_v2(d_tiles: jax.Array, cand: jax.Array,
                             count: jax.Array, boxes: jax.Array,
                             origin: jax.Array, geom9: jax.Array,
                             leaf: int, eps: float = MT_EPSILON,
                             draw_distance: float = 400.0,
                             n_sub: int = 1, debug_mode: int = 0,
                             mt_precision: str = "highest",
                             interpret: bool = False):
    """Nearest hit per ray for all tiles, dynamic candidate loop.

    d_tiles: (nT, 3, P); cand: (nT, K) int32 nearest-first; count: (nT,);
    boxes: (nT, K, 8) candidate AABBs (cols 0-5) with the suffix-min
    conservative origin->AABB distance in col 6 (the loop-exit
    certificate); origin9: (9,) = origin|root_bmin|root_bmax; geom9:
    (C, 9, L) packed rows p1|e1|e2 (slots on the 128-aligned lane dim).
    Returns (t (nT, P), enc (nT, P)) where enc = k*L + slot of the winning
    (candidate, slot) pair, -1 = miss — the caller decodes triangle ids.
    """
    n_tiles, _, p = d_tiles.shape
    kmax = cand.shape[1]
    ln = geom9.shape[2]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 3, p), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kmax, 8), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),          # geometry in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((_DMA_NBUF, 9, ln), jnp.float32),
            pltpu.SemaphoreType.DMA((_DMA_NBUF,)),
        ],
    )
    if p % n_sub:
        raise ValueError(f"tile ray count {p} not divisible by n_sub={n_sub}")
    kernel = functools.partial(_kernel, eps=eps,
                               draw_distance=draw_distance, leaf=leaf,
                               kmax=kmax, n_sub=n_sub,
                               debug_mode=debug_mode,
                               mt_precision=mt_precision)
    out_t, out_tri, out_steps = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, p), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, 1, 128), jnp.int32),
        ],
        interpret=interpret,
    )(cand.reshape(-1), count, origin, d_tiles, boxes, geom9)
    return out_t[:, 0], out_tri[:, 0], out_steps[:, 0, :2]
