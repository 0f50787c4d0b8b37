"""Gen-6 bin-tile kernel: gen-5 (bin_kernel2.py) with the per-item
pipeline slimmed down — an A/B vehicle for the r5 kernel experiments.

Differences vs gen-5 (each individually static-flagged so the A/B is
honest):

1. ONE merged output block (1, P, 2) f32: column 0 is the running best t,
   column 1 the winner triangle id BITCAST from int32 (no arithmetic ever
   touches it in-kernel, only selects). Gen-5 pipelined three output
   BlockSpecs per grid item (t, enc, steps); output revisit bookkeeping is
   per-item overhead (~1.2 us/item measured r5 at 2911 items).
2. The steps/telemetry output is gone — bin-path telemetry
   (entries/overflow/cross) comes from the prepass stats, and chunk-scan
   counts were only ever used by A/B scripts (which can use gen-5).
3. Optional bf16 acceptance (`mt_dtype="bfloat16"`): the three dot
   products and acceptance tests run in bf16. VERDICT r5 ask #4; measured
   on chip — see scripts/r5_kernel_ab.py results in the commit message /
   ROOFLINE.md.
4. Optional per-ray-slice early exit (`n_sub > 1`): the depth-certificate
   gate is evaluated per contiguous ray slice (sp = P/n_sub rays, a band
   of image rows) instead of once per whole tile, so foreground sub-bands
   stop scanning earlier (gen-5's whole-tile gate almost never fired at
   dragon scale: steps_mean 2.66 of chunks_mean 2.85).

Geometry rows and acceptance math are identical to gen-5 (see
bin_kernel2.py docstring; reference semantics Trixel.cu:41-172).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.dtypes import MT_EPSILON

_MISS_T = 3.0e38


def _kernel(item_tile_ref, item_block_ref,
            rays_ref, g_ref,                               # pipelined VMEM
            out_ref,                                       # (1, P, 2) f32
            *, eps: float, draw_distance: float, p: int, n_sub: int,
            bf16: bool):
    i = pl.program_id(0)
    tile = item_tile_ref[i]
    first = jnp.logical_or(i == 0, item_tile_ref[jnp.maximum(i - 1, 0)]
                           != tile)
    @pl.when(first)
    def _init():
        col = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 2)
        neg1 = jax.lax.bitcast_convert_type(
            jnp.full(out_ref.shape, -1, jnp.int32), jnp.float32)
        out_ref[...] = jnp.where(col == 0, jnp.float32(draw_distance),
                                 neg1)

    g = g_ref[...]                                         # (12, L)
    k1 = 1.0 - eps
    eps2_det = (k1 * eps) ** 2
    td = g[9:10]
    sp = p // n_sub
    if bf16:
        gb = g[0:9].astype(jnp.bfloat16)

    for q in range(n_sub):
        lo, hi = q * sp, (q + 1) * sp
        bound = rays_ref[0, lo:hi, 3:4]                    # (sp, 1)
        # per-slice exit: min entry depth of this (depth-sorted) block
        # vs the slice's farthest still-improvable ray
        cmin = jnp.min(g[10:11])
        wb = jnp.max(jnp.minimum(out_ref[0, lo:hi, 0:1], bound))

        @pl.when(cmin < wb)
        def _mt(lo=lo, hi=hi, bound=bound):
            dx = rays_ref[0, lo:hi, 0:1]                   # (sp, 1)
            dy = rays_ref[0, lo:hi, 1:2]
            dz = rays_ref[0, lo:hi, 2:3]
            if bf16:
                bx = dx.astype(jnp.bfloat16)
                by = dy.astype(jnp.bfloat16)
                bz = dz.astype(jnp.bfloat16)
                det = (bx * gb[0:1] + by * gb[1:2]
                       + bz * gb[2:3]).astype(jnp.float32)
                up = (bx * gb[3:4] + by * gb[4:5]
                      + bz * gb[5:6]).astype(jnp.float32)
                vp = (bx * gb[6:7] + by * gb[7:8]
                      + bz * gb[8:9]).astype(jnp.float32)
            else:
                det = dx * g[0:1] + dy * g[1:2] + dz * g[2:3]  # (sp, L)
                up = dx * g[3:4] + dy * g[4:5] + dz * g[5:6]
                vp = dx * g[6:7] + dy * g[7:8] + dz * g[8:9]
            dd2 = det * det
            qq = jnp.minimum(up * det, vp * det)
            qq = jnp.minimum(qq, (det - up - vp) * det)
            qq = jnp.minimum(qq, td * det - eps * dd2)
            ok = (qq >= 0.0) & (dd2 >= eps2_det)
            dsf = jnp.where(det == 0.0, 1e-30, det)
            tt = jnp.where(ok, td / dsf, _MISS_T)

            tmin = jnp.min(tt, axis=1, keepdims=True)      # (sp, 1)
            tri = jnp.min(jnp.where(tt == tmin, g[11:12], _MISS_T),
                          axis=1, keepdims=True).astype(jnp.int32)

            cur = out_ref[0, lo:hi, 0:1]
            better = tmin < cur
            out_ref[0, lo:hi, 0:1] = jnp.where(better, tmin, cur)
            enc = jax.lax.bitcast_convert_type(out_ref[0, lo:hi, 1:2],
                                               jnp.int32)
            out_ref[0, lo:hi, 1:2] = jax.lax.bitcast_convert_type(
                jnp.where(better, tri, enc), jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("n_tiles", "p", "chunk", "n_items", "eps",
                     "draw_distance", "n_sub", "mt_dtype", "interpret"))
def pallas_bin_intersect3(item_tile: jax.Array, item_block: jax.Array,
                          rays: jax.Array, geom: jax.Array,
                          n_tiles: int, p: int, n_items: int,
                          chunk: int = 512,
                          eps: float = MT_EPSILON,
                          draw_distance: float = 400.0, n_sub: int = 1,
                          mt_dtype: str = "float32",
                          interpret: bool = False):
    """Nearest hit per ray over binned entries (gen-6 slim pipeline).

    Same operand contract as pallas_bin_intersect2 minus the params
    vector; returns (t (nT, P) f32, tri (nT, P) i32 winner id or -1).
    """
    if chunk & (chunk - 1):
        raise ValueError(f"chunk {chunk} must be a power of two")
    while n_sub > 1 and p % n_sub:
        n_sub //= 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_items,),
        in_specs=[
            pl.BlockSpec((1, p, 4), lambda i, it, ib: (it[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, chunk), lambda i, it, ib: (0, ib[i]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, p, 2), lambda i, it, ib: (it[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(_kernel, eps=eps,
                               draw_distance=draw_distance, p=p,
                               n_sub=n_sub,
                               bf16=(mt_dtype == "bfloat16"))
    out, = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_tiles, p, 2), jnp.float32)],
        interpret=interpret,
    )(item_tile, item_block, rays, geom)
    return out[:, :, 0], jax.lax.bitcast_convert_type(out[:, :, 1],
                                                      jnp.int32)
