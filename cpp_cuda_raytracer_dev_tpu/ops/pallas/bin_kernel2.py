"""Gen-4 bin-tile intersection kernel: inverted (tile, block) grid.

The gen-3 kernel (bin_kernel.py) ran one grid step per *tile* with a
manual depth-4 DMA pipeline streaming that tile's entry blocks — measured
on chip, each loop iteration cost ~1.5 us of fixed overhead (small-DMA
issue + semaphore wait + scalar bookkeeping), dominating the ~0.9 us of
useful vector math per block. This kernel inverts the loop: the grid is
the *flat work-item list* — one step per (tile, entry-block) pair, items
sorted tile-major — and all operands stream through ordinary BlockSpecs,
so Mosaic's generated pipeline does the double-buffering with no manual
DMA code at all. Consecutive items of one tile map to the same output
block index, so Pallas keeps the accumulator resident in VMEM and only
flushes when the tile changes (the classic matmul-k-loop revisiting
pattern). Padding items repeat a real (tile, block) pair — re-testing a
block is idempotent (nearest-hit min with identical candidates).

Geometry arrives as blocks of a per-entry *Möller–Trumbore constant
table* (accel/binning.py): for primary rays all origins coincide (the
reference's own fixed-origin trick, ``Trixel.cu:29-36``), so per entry
the prepass stores A = (1-eps)·(e2 x e1), B = (o-p1) x e2 ... folded so
the kernel evaluates det/u/v as three broadcast dot products:

    det[s, l] = dx[s]·Ax[l] + dy[s]·Ay[l] + dz[s]·Az[l]

with rays on sublanes ((P, 1) slices of the tile's (P, 3) ray block) and
entries on lanes ((1, L) rows of the (12, L) geometry block). That is
pure full-width VPU work in exact f32 — no MXU pass, no K=3 matmul, no
mt_precision tradeoff (the gen-3 kernel's HIGHEST-precision dot was 6
MXU passes at 2.3% utilisation; bf16 DEFAULT dropped oracle agreement to
0.67).

Row layout of a geometry block (12, L), from accel/binning.py:
  0-2  A   = k1 * (e2 x e1)                 (k1 = 1 - eps)
  3-5  B   = U - eps * (e2 x e1),  U = e2 x (o - p1)
  6-8  C   = V - eps * (e2 x e1),  V = (o - p1) x e1
  9    TD  = k1 * (e2 . V)
  10   depth = front-to-back exit certificate (min over tri of (p-o).n)
  11   pad
Acceptance (epsilon-folded, derivation in intersect_kernel_v2.py):
  det = A.d;  u' = B.d;  v' = C.d
  qq = min(u'·det, v'·det, (det-u'-v')·det, TD·det - eps·det^2) >= 0
  and det^2 >= (k1·eps)^2;   t = TD / det.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.dtypes import MT_EPSILON

_MISS_T = 3.0e38


def _kernel(item_tile_ref, item_block_ref, starts_ref, params_ref,
            g_ref,                                         # pipelined VMEM
            out_t_ref, out_enc_ref, out_steps_ref,         # outputs
            d_ref, bound_ref,                              # scratch
            *, eps: float, draw_distance: float, chunk: int, n_sub: int,
            p: int, n_tx: int, th: int, tw: int):
    i = pl.program_id(0)
    tile = item_tile_ref[i]
    block = item_block_ref[i]
    first = jnp.logical_or(i == 0, item_tile_ref[jnp.maximum(i - 1, 0)]
                           != tile)

    @pl.when(first)
    def _init():
        # In-kernel ray generation: d = normalize(base + um*ix + vm*iy)
        # with (base, um, vm) the OBJECT-FRAME camera basis (9 scalars,
        # params[10:19]) — equivalent to Camera.ray_directions rotated by
        # the object pose, but costs (P, 1)-shaped scalar math per tile
        # instead of a 518k-ray (R, 3) rotate + HBM round-trip per frame
        # (measured 14 ms of the 43.6 ms frame at dragon scale).
        pi = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
        ix = ((tile % n_tx) * tw + pi % tw).astype(jnp.float32)
        iy = ((tile // n_tx) * th + pi // tw).astype(jnp.float32)
        dc = []
        for ax in range(3):
            dc.append(params_ref[10 + ax] + params_ref[13 + ax] * ix
                      + params_ref[16 + ax] * iy)
        inv_len = 1.0 / jnp.sqrt(dc[0] * dc[0] + dc[1] * dc[1]
                                 + dc[2] * dc[2])
        d0 = dc[0] * inv_len
        d1 = dc[1] * inv_len
        d2 = dc[2] * inv_len
        d_ref[:, 0:1] = d0
        d_ref[:, 1:2] = d1
        d_ref[:, 2:3] = d2

        # per-ray scene-exit bound from the root AABB (object frame);
        # rays on sublanes -> every op here is (P, 1)-shaped and tiny
        bnd = jnp.full((p, 1), draw_distance, jnp.float32)
        r_near = jnp.full((p, 1), -jnp.inf, jnp.float32)
        r_far = jnp.full((p, 1), jnp.inf, jnp.float32)
        for ax, dax in ((0, d0), (1, d1), (2, d2)):
            o_ax = params_ref[ax]
            dsf = jnp.where(jnp.abs(dax) < 1e-30,
                            jnp.where(dax < 0, -1e-30, 1e-30), dax)
            inv = 1.0 / dsf
            ta = (params_ref[3 + ax] - o_ax) * inv
            tb = (params_ref[6 + ax] - o_ax) * inv
            r_near = jnp.maximum(r_near, jnp.minimum(ta, tb))
            r_far = jnp.minimum(r_far, jnp.maximum(ta, tb))
        root_hit = (r_far >= jnp.maximum(r_near, 0.0) - 1e-4)
        bnd = jnp.minimum(jnp.where(root_hit, r_far + 1e-3, 0.0), bnd)
        bound_ref[...] = bnd
        out_t_ref[...] = jnp.full_like(out_t_ref, draw_distance)
        out_enc_ref[...] = jnp.full_like(out_enc_ref, -1)
        out_steps_ref[...] = jnp.zeros_like(out_steps_ref)

    g = g_ref[0]                                           # (12, L)
    # certificate: the minimum true depth of this block's entries; sorted
    # order guarantees later blocks of this tile can only be deeper than
    # cmin - qstep, but for THIS block cmin itself lower-bounds every t
    cmin = jnp.min(g[10:11])
    wb = jnp.max(jnp.minimum(out_t_ref[0, :, 0:1], bound_ref[...]))

    @pl.when(cmin < wb)
    def _mt():
        ax, ay, az = g[0:1], g[1:2], g[2:3]                # (1, L)
        bx, by, bz = g[3:4], g[4:5], g[5:6]
        cx, cy, cz = g[6:7], g[7:8], g[8:9]
        td = g[9:10]
        k1 = 1.0 - eps
        eps2_det = (k1 * eps) ** 2

        sp = p // n_sub
        for q in range(n_sub):
            lo, hi = q * sp, (q + 1) * sp
            best_q = jnp.minimum(out_t_ref[0, lo:hi, 0:1],
                                 bound_ref[lo:hi])

            @pl.when(cmin < jnp.max(best_q))
            def _mt_sub(lo=lo, hi=hi, best_q=best_q):
                dx = d_ref[lo:hi, 0:1]                     # (sp, 1)
                dy = d_ref[lo:hi, 1:2]
                dz = d_ref[lo:hi, 2:3]
                det = dx * ax + dy * ay + dz * az          # (sp, L)
                up = dx * bx + dy * by + dz * bz
                vp = dx * cx + dy * cy + dz * cz

                dd2 = det * det
                qq = jnp.minimum(up * det, vp * det)
                qq = jnp.minimum(qq, (det - up - vp) * det)
                qq = jnp.minimum(qq, td * det - eps * dd2)
                ok = (qq >= 0.0) & (dd2 >= eps2_det)
                dsf = jnp.where(det == 0.0, 1e-30, det)
                tt = jnp.where(ok, td / dsf, _MISS_T)

                # winner-per-ray: EXACT lane min of t (the gen-3 kernel
                # packed the lane id into t's low mantissa bits, which
                # cost log2(chunk) bits of t precision — oracle agreement
                # decayed 0.9995 -> 0.9954 from c128 to c1024), then the
                # winner's triangle id via a tie-broken min over the id
                # row (g[11], ids exact in f32; smallest id wins ties,
                # matching the brute oracle's first-hit-kept semantics)
                tmin = jnp.min(tt, axis=1, keepdims=True)   # (sp, 1)
                tri = jnp.min(jnp.where(tt == tmin, g[11:12], _MISS_T),
                              axis=1, keepdims=True).astype(jnp.int32)

                cur = out_t_ref[0, lo:hi, 0:1]
                better = tmin < cur
                out_t_ref[0, lo:hi, 0:1] = jnp.where(better, tmin, cur)
                out_enc_ref[0, lo:hi, 0:1] = jnp.where(
                    better, tri, out_enc_ref[0, lo:hi, 0:1])

        # Mosaic cannot store scalars to VMEM: bump the counters with
        # one-hot vector adds over the whole (1, 8, 1) block
        row = jax.lax.broadcasted_iota(jnp.int32, out_steps_ref.shape, 1)
        out_steps_ref[...] += (row == 0).astype(jnp.int32)

    row = jax.lax.broadcasted_iota(jnp.int32, out_steps_ref.shape, 1)
    out_steps_ref[...] += (row == 1).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("n_tiles", "p", "n_tx", "th", "tw", "chunk",
                     "n_items", "eps", "draw_distance", "n_sub",
                     "interpret"))
def pallas_bin_intersect2(item_tile: jax.Array,
                          item_block: jax.Array, starts: jax.Array,
                          params: jax.Array, geom: jax.Array,
                          n_tiles: int, p: int, n_tx: int, th: int,
                          tw: int, n_items: int, chunk: int = 512,
                          eps: float = MT_EPSILON,
                          draw_distance: float = 400.0, n_sub: int = 1,
                          interpret: bool = False):
    """Nearest hit per ray over binned entries, inverted-grid form with
    in-kernel ray generation.

    item_tile / item_block: (n_items,) i32 work items sorted tile-major,
    padded by repeating the final real item; starts: (nT+1,) entry
    ranges (unused by the kernel, kept for callers); params: (19,) =
    origin(3) | root_bmin(3) | root_bmax(3) | qstep | ray base(3) |
    u_step(3) | v_step(3), all in the OBJECT frame (rays are generated
    inside the kernel from the camera basis — see _kernel._init); geom:
    (Epad/chunk, 12, chunk) MT-constant blocks. n_tiles/p/n_tx/th/tw
    describe the (padded) tile grid; p = th*tw rays per tile.

    Returns (t (nT, P), tri (nT, P) winner TRIANGLE id or -1 = miss (the
    id row rides the geometry blocks, no caller decode needed),
    steps (nT, 2) = [mt-executed items, items]).
    """
    if chunk & (chunk - 1):
        raise ValueError(f"chunk {chunk} must be a power of two")
    if p % n_sub:
        raise ValueError(f"tile ray count {p} not divisible by {n_sub}")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_items,),
        in_specs=[
            pl.BlockSpec((1, 12, chunk),
                         lambda i, it, ib, st, pr: (ib[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, p, 1), lambda i, it, ib, st, pr: (it[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, 1), lambda i, it, ib, st, pr: (it[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 1), lambda i, it, ib, st, pr: (it[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((p, 3), jnp.float32),
            pltpu.VMEM((p, 1), jnp.float32),
        ],
    )
    kernel = functools.partial(_kernel, eps=eps,
                               draw_distance=draw_distance, chunk=chunk,
                               n_sub=n_sub, p=p, n_tx=n_tx, th=th, tw=tw)
    out_t, out_enc, out_steps = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, p, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, p, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, 8, 1), jnp.int32),
        ],
        interpret=interpret,
    )(item_tile, item_block, starts, params, geom)
    return out_t[:, :, 0], out_enc[:, :, 0], out_steps[:, :2, 0]
