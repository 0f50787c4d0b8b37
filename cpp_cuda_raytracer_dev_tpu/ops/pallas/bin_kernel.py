"""Fused tile-intersection kernel over screen-space bins (accel/binning.py).

Per image tile, geometry arrives as a *contiguous, front-to-back sorted*
run of entries in one (10, E) table — so unlike the cluster kernel
(intersect_kernel_v2.py) there is no candidate indirection at all: the
loop streams fixed-size chunks with a depth-D DMA pipeline at sequential
(strided) addresses and exits as soon as the next chunk's depth
certificate cannot beat any ray's current best. The chunk tail past the
tile's segment may contain the *next* tile's entries — they are real
scene geometry, so testing them is harmless (a nearest-hit can only be
found, never fabricated); past the global entry count the table is
zero-padded (det == 0 => rejected).

The Möller–Trumbore block is the epsilon-folded min-tree + packed-select
epilogue of intersect_kernel_v2.py; see the derivation there.

Exit certificate: entries are sorted by depth quantized to `qstep`
buckets, so every entry of chunk k+1 has true depth >= (min true depth of
chunk k) - qstep, and depth = min over the triangle of (p - origin)·n is
a lower bound on hit distance for unit rays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.dtypes import MT_EPSILON

_PRECISIONS = {"default": jax.lax.Precision.DEFAULT,
               "high": jax.lax.Precision.HIGH,
               "highest": jax.lax.Precision.HIGHEST}
_MISS_T = 3.0e38
_DMA_DEPTH = 4
_DMA_NBUF = 6


def _kernel(starts_ref, origin_ref,                        # scalar prefetch
            d_ref, geom_hbm,                               # VMEM / HBM
            out_t_ref, out_enc_ref, out_steps_ref,         # outputs
            geom_vmem, sem,                                # scratch
            *, eps: float, draw_distance: float, chunk: int,
            n_sub: int, mt_precision: str, debug_mode: int = 0):
    # debug_mode (bisect aid): 1 = no early exit (cond ignores the depth
    # certificate), 2 = additionally run the MT for every chunk/sub-tile
    # (no cmin gates) — isolates certificate vs gate vs MT failures.
    t = pl.program_id(0)
    start = starts_ref[t]
    end = starts_ref[t + 1]
    # whole-block scan covering the tile's entry segment: the first/last
    # block may carry neighboring tiles' entries — real geometry, harmless
    b0 = start // chunk
    nch = jnp.where(end > start, (end - 1) // chunk - b0 + 1, 0)

    out_t_ref[...] = jnp.full_like(out_t_ref, draw_distance)
    out_enc_ref[...] = jnp.full_like(out_enc_ref, -1)

    d = d_ref[0]                                           # (3, P)
    ox, oy, oz = origin_ref[0], origin_ref[1], origin_ref[2]
    qstep = origin_ref[9]

    # per-ray bound from the scene root AABB (see intersect_kernel_v2)
    dsf = jnp.where(jnp.abs(d) < 1e-30,
                    jnp.where(d < 0, -1e-30, 1e-30), d)
    inv = pl.reciprocal(dsf, approx=False)
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

    def dma(slot, c):
        return pltpu.make_async_copy(
            geom_hbm.at[b0 + c], geom_vmem.at[slot], sem.at[slot])

    for i in range(_DMA_DEPTH):
        @pl.when(i < nch)
        def _warmup(i=i):
            dma(i % _DMA_NBUF, i).start()

    def body(carry):
        k, wb, _cert = carry
        slot = jax.lax.rem(k, _DMA_NBUF)

        @pl.when(k + _DMA_DEPTH < nch)
        def _prefetch():
            dma(jax.lax.rem(k + _DMA_DEPTH, _DMA_NBUF), k + _DMA_DEPTH
                ).start()

        dma(slot, k).wait()
        g = geom_vmem[slot]                                # (10, chunk)
        cmin = jnp.min(g[9:10])                            # chunk depth lo

        @pl.when((cmin < wb) | (debug_mode >= 2))
        def _mt_all():
            p1x, p1y, p1z = g[0:1], g[1:2], g[2:3]         # (1, L)
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
            td_row = e2x * mvx + e2y * mvy + e2z * mvz     # (1, L)

            k1 = 1.0 - eps
            eps2_det = (k1 * eps) ** 2
            td = jnp.transpose(td_row) * k1                # (L, 1)
            m = jnp.concatenate(
                [jnp.concatenate([mdx * k1, mdy * k1, mdz * k1], axis=0),
                 jnp.concatenate([mux - eps * mdx, muy - eps * mdy,
                                  muz - eps * mdz], axis=0),
                 jnp.concatenate([mvx - eps * mdx, mvy - eps * mdy,
                                  mvz - eps * mdz], axis=0)], axis=1)

            sp = d.shape[1] // n_sub
            for q in range(n_sub):
                lo, hi = q * sp, (q + 1) * sp
                best_q = jnp.minimum(out_t_ref[0, :, lo:hi],
                                     bound[:, lo:hi])

                @pl.when((cmin < jnp.max(best_q)) | (debug_mode >= 2))
                def _mt_sub(lo=lo, hi=hi):
                    out = jax.lax.dot_general(
                        m, d[:, lo:hi], (((0,), (0,)), ((), ())),
                        precision=_PRECISIONS[mt_precision],
                        preferred_element_type=jnp.float32)
                    det1 = out[0 * chunk:1 * chunk]        # (L, sp)
                    up = out[1 * chunk:2 * chunk]
                    vp = out[2 * chunk:3 * chunk]

                    dd2 = det1 * det1
                    qq = jnp.minimum(up * det1, vp * det1)
                    qq = jnp.minimum(qq, (det1 - up - vp) * det1)
                    qq = jnp.minimum(qq, td * det1 - eps * dd2)
                    ok = (qq >= 0.0) & (dd2 >= eps2_det)
                    r = pl.reciprocal(det1, approx=True)
                    r = r * (2.0 - det1 * r)
                    tt = jnp.where(ok, td * r, _MISS_T)

                    key = jax.lax.bitcast_convert_type(tt, jnp.int32)
                    key = ((key & ~(chunk - 1))
                           | jax.lax.broadcasted_iota(jnp.int32,
                                                      tt.shape, 0))
                    kmin = jnp.min(key, axis=0, keepdims=True)
                    win = kmin & (chunk - 1)
                    tmin = jax.lax.bitcast_convert_type(
                        kmin & ~(chunk - 1), jnp.float32)
                    enc = k * chunk + win                  # (1, sp)

                    cur_t = out_t_ref[0, :, lo:hi]
                    better = tmin < cur_t
                    out_t_ref[0, :, lo:hi] = jnp.where(better, tmin, cur_t)
                    out_enc_ref[0, :, lo:hi] = jnp.where(
                        better, enc, out_enc_ref[0, :, lo:hi])

        wb = jnp.min(jnp.array(
            [wb, jnp.max(jnp.minimum(out_t_ref[0], bound))]))
        return k + 1, wb, cmin - qstep

    def cond(carry):
        k, wb, cert = carry
        if debug_mode >= 1:
            return k < nch
        return (k < nch) & (cert < wb)

    k_end, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.max(bound), jnp.float32(-3.0e38)))
    lane = jax.lax.broadcasted_iota(jnp.int32, out_steps_ref.shape, 2)
    out_steps_ref[...] = jnp.where(lane == 0, k_end, nch)

    for j in range(_DMA_DEPTH):
        @pl.when(k_end + j < nch)
        def _drain(j=j):
            dma(jax.lax.rem(k_end + j, _DMA_NBUF), k_end + j).wait()


@functools.partial(
    jax.jit,
    static_argnames=("chunk", "eps", "draw_distance", "n_sub",
                     "mt_precision", "debug_mode", "interpret"))
def pallas_bin_intersect(d_tiles: jax.Array, starts: jax.Array,
                         origin10: jax.Array, geom: jax.Array,
                         chunk: int = 128, eps: float = MT_EPSILON,
                         draw_distance: float = 400.0, n_sub: int = 1,
                         mt_precision: str = "highest",
                         debug_mode: int = 0,
                         interpret: bool = False):
    """Nearest hit per ray over binned entries.

    d_tiles: (nT, 3, P) tile ray dirs; starts: (nT+1,) entry ranges;
    origin10: (10,) = origin | root_bmin | root_bmax | qstep; geom:
    (Epad/chunk, 10, chunk) blocked entry table (p1|e1|e2 rows + depth
    row). Returns (t (nT, P), enc (nT, P), steps (nT, 2)) with enc =
    block-relative winner k*chunk+slot (caller adds
    (starts[t]//chunk)*chunk and decodes entry_tri), -1 = miss.
    """
    n_tiles, _, p = d_tiles.shape
    if chunk & (chunk - 1):
        raise ValueError(f"chunk {chunk} must be a power of two")
    if p % n_sub:
        raise ValueError(f"tile ray count {p} not divisible by {n_sub}")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 3, p), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),             # geometry HBM
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
            pltpu.VMEM((_DMA_NBUF, 10, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((_DMA_NBUF,)),
        ],
    )
    kernel = functools.partial(_kernel, eps=eps,
                               draw_distance=draw_distance, chunk=chunk,
                               n_sub=n_sub, mt_precision=mt_precision,
                               debug_mode=debug_mode)
    out_t, out_enc, out_steps = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, p), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, 1, 128), jnp.int32),
        ],
        interpret=interpret,
    )(starts, origin10, d_tiles, geom)
    return out_t[:, 0], out_enc[:, 0], out_steps[:, 0, :2]
