"""Gen-5 bin-tile intersection kernel: inverted (tile, block) grid with
streamed per-tile ray tables.

The gen-3 kernel (bin_kernel.py) ran one grid step per *tile* with a
manual depth-4 DMA pipeline streaming that tile's entry blocks — measured
on chip, each loop iteration cost ~1.5 us of fixed overhead. Gen-4
inverted the loop: the grid is the *flat work-item list* — one step per
(tile, entry-block) pair, items sorted tile-major — and all operands
stream through ordinary BlockSpecs, so Mosaic's generated pipeline does
the double-buffering (consecutive items of one tile map to the same
output block index, so the accumulator stays VMEM-resident — the classic
matmul-k-loop revisiting pattern).

Gen-5 (this file) removes the two overheads the r4 chunk-size sweep
exposed (~1.0 us fixed per grid item + a ~1 us per-tile init, together
~half the kernel time at dragon scale):

1.  **Ray gen and scene-exit bounds move OUT of the kernel** into a flat,
    lane-efficient precompute (accel/traverse.py `_ray_table`): the gen-4
    in-kernel init computed them in (P, 1)-shaped scalar math — 1 active
    lane of 128 — per tile. The kernel now streams a (1, P, 4) block
    [dx | dy | dz | bound] per tile through a revisited BlockSpec: tiles
    are item-sorted, so the block DMAs once per tile, ~4 KB.
2.  **The geometry table arrives pre-transposed** as a 2-D (12, Epad)
    stack of twelve flat entry-order gathers (accel/binning.py); the
    gen-4 (E, 12) -> (blocks, 12, chunk) HBM lane-transpose cost ~8
    ms/frame. The BlockSpec slices (12, chunk) column blocks — legal
    because the sublane dim equals the full array dim.

Geometry rows (12, L), from accel/binning.py:
  0-2  A   = k1 * (e2 x e1)                 (k1 = 1 - eps)
  3-5  B   = U - eps * (e2 x e1),  U = e2 x (o - p1)
  6-8  C   = V - eps * (e2 x e1),  V = (o - p1) x e1
  9    TD  = k1 * (e2 . V)
  10   depth = front-to-back exit certificate (min over tri of (p-o).n,
       0 for camera-plane crossers)
  11   triangle id as f32 (exact below 2^24)
Acceptance (epsilon-folded, derivation in intersect_kernel_v2.py):
  det = A.d;  u' = B.d;  v' = C.d
  qq = min(u'·det, v'·det, (det-u'-v')·det, TD·det - eps·det^2) >= 0
  and det^2 >= (k1·eps)^2;   t = TD / det.
The dot products stay full-width VPU work in exact f32: rays on sublanes
((P, 1) slices of the ray block) x entries on lanes ((1, L) geometry
rows). The gen-3 MXU variant measured 6 HIGHEST-precision passes at 2.3%
utilisation; bf16 DEFAULT dropped oracle agreement to 0.67.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.dtypes import MT_EPSILON

_MISS_T = 3.0e38


def _kernel(item_tile_ref, item_block_ref, params_ref,
            rays_ref, g_ref,                               # pipelined VMEM
            out_t_ref, out_enc_ref, out_steps_ref,         # outputs
            *, eps: float, draw_distance: float, chunk: int, n_sub: int,
            p: int, esub: int):
    i = pl.program_id(0)
    tile = item_tile_ref[i]
    first = jnp.logical_or(i == 0, item_tile_ref[jnp.maximum(i - 1, 0)]
                           != tile)

    @pl.when(first)
    def _init():
        out_t_ref[...] = jnp.full_like(out_t_ref, draw_distance)
        out_enc_ref[...] = jnp.full_like(out_enc_ref, -1)
        out_steps_ref[...] = jnp.zeros_like(out_steps_ref)

    g = g_ref[...]                                         # (12, L)
    bound = rays_ref[0, :, 3:4]                            # (P, 1)
    k1 = 1.0 - eps
    eps2_det = (k1 * eps) ** 2
    el = chunk // esub

    # entry sub-blocks: depth-sorted entries mean each successive slice
    # can early-exit independently — finer-grained than the gen-4
    # whole-block gate (chunk quantization made the kernel scan ~2.2x
    # the live entries at dragon scale)
    for e in range(esub):
        ge = g[:, e * el:(e + 1) * el]                     # (12, el)
        # certificate: min true depth of this slice's entries; sorted
        # order bounds every t in this AND later slices from below
        cmin = jnp.min(ge[10:11])
        wb = jnp.max(jnp.minimum(out_t_ref[0, :, 0:1], bound))

        @pl.when(cmin < wb)
        def _mt(ge=ge):
            td = ge[9:10]
            sp = p // n_sub
            for q in range(n_sub):
                lo, hi = q * sp, (q + 1) * sp
                dx = rays_ref[0, lo:hi, 0:1]               # (sp, 1)
                dy = rays_ref[0, lo:hi, 1:2]
                dz = rays_ref[0, lo:hi, 2:3]
                det = (dx * ge[0:1] + dy * ge[1:2]
                       + dz * ge[2:3])                     # (sp, el)
                up = dx * ge[3:4] + dy * ge[4:5] + dz * ge[5:6]
                vp = dx * ge[6:7] + dy * ge[7:8] + dz * ge[8:9]
                dd2 = det * det
                qq = jnp.minimum(up * det, vp * det)
                qq = jnp.minimum(qq, (det - up - vp) * det)
                qq = jnp.minimum(qq, td * det - eps * dd2)
                ok = (qq >= 0.0) & (dd2 >= eps2_det)
                dsf = jnp.where(det == 0.0, 1e-30, det)
                tt = jnp.where(ok, td / dsf, _MISS_T)

                # winner-per-ray: EXACT lane min of t (mantissa-packing
                # the lane id cost t precision — oracle agreement decayed
                # 0.9995 -> 0.9954 from c128 to c1024), then the winner's
                # triangle id via a tie-broken min over the id row
                # (smallest id wins ties, matching the brute oracle)
                tmin = jnp.min(tt, axis=1, keepdims=True)   # (sp, 1)
                tri = jnp.min(jnp.where(tt == tmin, ge[11:12], _MISS_T),
                              axis=1, keepdims=True).astype(jnp.int32)

                cur = out_t_ref[0, lo:hi, 0:1]
                better = tmin < cur
                out_t_ref[0, lo:hi, 0:1] = jnp.where(better, tmin, cur)
                out_enc_ref[0, lo:hi, 0:1] = jnp.where(
                    better, tri, out_enc_ref[0, lo:hi, 0:1])

            # Mosaic cannot store scalars to VMEM: bump the counters with
            # one-hot vector adds over the whole (1, 8, 1) block
            row = jax.lax.broadcasted_iota(jnp.int32,
                                           out_steps_ref.shape, 1)
            out_steps_ref[...] += (row == 0).astype(jnp.int32)

    row = jax.lax.broadcasted_iota(jnp.int32, out_steps_ref.shape, 1)
    out_steps_ref[...] += (row == 1).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("n_tiles", "p", "chunk", "n_items", "eps",
                     "draw_distance", "n_sub", "esub",
                     "interpret"))
def pallas_bin_intersect2(item_tile: jax.Array, item_block: jax.Array,
                          params: jax.Array, rays: jax.Array,
                          geom: jax.Array,
                          n_tiles: int, p: int, n_items: int,
                          chunk: int = 512,
                          eps: float = MT_EPSILON,
                          draw_distance: float = 400.0, n_sub: int = 1,
                          esub: int = 1,
                          interpret: bool = False):
    """Nearest hit per ray over binned entries, inverted-grid form with
    streamed per-tile ray tables.

    item_tile / item_block: (n_items,) i32 work items sorted tile-major,
    padded by repeating the final real item; params: (1,) = [qstep]
    (kept for cache-key stability; the certificate already rides the
    geometry); rays: (n_tiles, p, 4) f32 = [dx | dy | dz | scene-exit
    bound] per tile in row-major tile order (accel/traverse.py
    `_ray_table`); geom: (12, Epad) MT-constant table, column-blocked.

    Returns (t (nT, P), tri (nT, P) winner TRIANGLE id or -1 = miss,
    steps (nT, 2) = [mt-executed items, items]).
    """
    if chunk & (chunk - 1):
        raise ValueError(f"chunk {chunk} must be a power of two")
    if p % n_sub:
        raise ValueError(f"tile ray count {p} not divisible by {n_sub}")
    # entry sub-slices must be 128-lane aligned for Mosaic lane slicing;
    # degrade esub rather than erroring for small test chunks
    while esub > 1 and (chunk % esub or (chunk // esub) % 128):
        esub //= 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_items,),
        in_specs=[
            pl.BlockSpec((1, p, 4), lambda i, it, ib, pr: (it[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, chunk), lambda i, it, ib, pr: (0, ib[i]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, p, 1), lambda i, it, ib, pr: (it[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, 1), lambda i, it, ib, pr: (it[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 1), lambda i, it, ib, pr: (it[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(_kernel, eps=eps,
                               draw_distance=draw_distance, chunk=chunk,
                               n_sub=n_sub, p=p, esub=esub)
    out_t, out_enc, out_steps = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, p, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, p, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, 8, 1), jnp.int32),
        ],
        interpret=interpret,
    )(item_tile, item_block, params, rays, geom)
    return out_t[:, :, 0], out_enc[:, :, 0], out_steps[:, :2, 0]
