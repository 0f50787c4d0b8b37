"""Fused tile-intersection Pallas kernel — the framework's hot loop.

TPU replacement for the reference's per-ray KD traversal + Möller–Trumbore
kernel (``TEST_Dungeonrun/Trixel.cu:41-172``). Why Pallas: the XLA version
(accel/traverse.py `intersect_clustered`) materializes (rays x candidates)
intermediates to HBM — at the dragon scale that is GBs of traffic per frame.
This kernel keeps the whole per-(tile, cluster) working set in VMEM:

  grid = (num_tiles, K candidate clusters)      # K innermost
  per step:
    - the tile's ray dirs (3, P) and candidate AABBs (K, 8) stay resident
      in VMEM across k;
    - the candidate cluster's geometry block (L, 9) is DMA'd by the
      BlockSpec index_map *indirected through a scalar-prefetched candidate
      table* (cand[t, k]) — Pallas double-buffers these loads against
      compute automatically;
    - the cluster AABB is slab-tested against every ray bounded by the
      ray's current best t; if no ray can improve, the whole block is
      predicated off (the tile-granular analogue of the reference's
      ordered stack traversal + "w < d" reject, Trixel.cu:127-142,146-169).
      Candidates come nearest-first from the cull, so covered tiles skip
      their whole candidate tail;
    - Möller–Trumbore constants are derived on the VPU from p1/e1/e2
      (the d_t/d_q/d_w precompute of Trixel.cu:29-36, done per block);
    - one MXU contraction (3L, 3) x (3, P) -> det/u·det/v·det for every
      (slot, ray) pair at once;
    - sign-aware acceptance avoids per-element divisions except the one
      reciprocal needed for t;
    - masked min + tie-min select accumulate the nearest hit in VMEM
      accumulators, written out once per tile.
  steps with k >= count[t] are predicated off (@pl.when) AND their
  index_map is clamped to the last valid candidate, so Pallas's
  same-block-index dedupe elides the geometry DMA too; K only bounds the
  shape.

The candidate table itself comes from the XLA frustum-cull stage
(`cull_tiles`) — tiles x clusters plane tests, a few MFLOPs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.dtypes import MT_EPSILON

_HP = jax.lax.Precision.HIGHEST
_I32_MAX = 2**31 - 1  # python literal: a jnp constant would be a captured tracer


def _kernel(cand_ref, count_ref, origin_ref,      # scalar prefetch
            d_ref, geom_ref, slot_ref, box_ref,   # blocks
            out_t_ref, out_tri_ref,               # outputs
            *, eps: float, draw_distance: float, leaf: int):
    t = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        out_t_ref[...] = jnp.full_like(out_t_ref, draw_distance)
        out_tri_ref[...] = jnp.full_like(out_tri_ref, -1)

    @pl.when(k < count_ref[t])
    def _body():
        d = d_ref[0]                                         # (3, P)
        ox, oy, oz = origin_ref[0], origin_ref[1], origin_ref[2]

        # --- early termination: slab-test the candidate AABB per ray,
        # bounded by the ray's current best t (box columns:
        # bmin.xyz | bmax.xyz | pad pad).
        row = box_ref[0, pl.ds(k, 1), :]                     # (1, 8)
        dsf = jnp.where(jnp.abs(d) < 1e-30,
                        jnp.where(d < 0, -1e-30, 1e-30), d)
        inv = pl.reciprocal(dsf, approx=False)               # (3, P)
        ta_x = (row[:, 0:1] - ox) * inv[0:1]
        tb_x = (row[:, 3:4] - ox) * inv[0:1]
        ta_y = (row[:, 1:2] - oy) * inv[1:2]
        tb_y = (row[:, 4:5] - oy) * inv[1:2]
        ta_z = (row[:, 2:3] - oz) * inv[2:3]
        tb_z = (row[:, 5:6] - oz) * inv[2:3]
        t_near = jnp.maximum(
            jnp.maximum(jnp.minimum(ta_x, tb_x), jnp.minimum(ta_y, tb_y)),
            jnp.minimum(ta_z, tb_z))                         # (1, P)
        t_far = jnp.minimum(
            jnp.minimum(jnp.maximum(ta_x, tb_x), jnp.maximum(ta_y, tb_y)),
            jnp.maximum(ta_z, tb_z))
        box_ok = ((t_far >= jnp.maximum(t_near, 0.0) - 1e-4)
                  & (t_near < out_t_ref[0]))

        @pl.when(jnp.any(box_ok))
        def _mt():
            g = geom_ref[0]               # (L, 9): p1.xyz | e1.xyz | e2.xyz
            tri_col = slot_ref[0]         # (L, 1) int32, -1 = padding

            # every intermediate stays 2-D — Mosaic layouts want (sublane,
            # lane) shapes; slots live on sublanes, rays on lanes.
            p1x, p1y, p1z = g[:, 0:1], g[:, 1:2], g[:, 2:3]  # (L, 1)
            e1x, e1y, e1z = g[:, 3:4], g[:, 4:5], g[:, 5:6]
            e2x, e2y, e2z = g[:, 6:7], g[:, 7:8], g[:, 8:9]
            tvx, tvy, tvz = ox - p1x, oy - p1y, oz - p1z

            # fixed-origin MT constants (Trixel.cu:29-36 equivalents), (L, 1)
            mdx = e2y * e1z - e2z * e1y   # m_det = e2 x e1
            mdy = e2z * e1x - e2x * e1z
            mdz = e2x * e1y - e2y * e1x
            mux = e2y * tvz - e2z * tvy   # m_u = e2 x tvec
            muy = e2z * tvx - e2x * tvz
            muz = e2x * tvy - e2y * tvx
            mvx = tvy * e1z - tvz * e1y   # m_v = tvec x e1  (ref d_q)
            mvy = tvz * e1x - tvx * e1z
            mvz = tvx * e1y - tvy * e1x
            td = e2x * mvx + e2y * mvy + e2z * mvz   # (L, 1)  (ref d_w)

            # one MXU contraction: (3L, 3) x (3, P) -> (3L, P); row blocks
            # are [m_det; m_u; m_v] so out[j, p] = sum_c m[j, c] * d[c, p].
            m = jnp.concatenate(
                [jnp.concatenate([mdx, mdy, mdz], axis=1),
                 jnp.concatenate([mux, muy, muz], axis=1),
                 jnp.concatenate([mvx, mvy, mvz], axis=1)], axis=0)  # (3L, 3)
            out = jax.lax.dot_general(
                m, d, (((1,), (0,)), ((), ())),
                precision=_HP, preferred_element_type=jnp.float32)   # (3L, P)
            det = out[0 * leaf:1 * leaf]
            ud = out[1 * leaf:2 * leaf]
            vd = out[2 * leaf:3 * leaf]

            # sign-aware acceptance (Trixel.cu:106,127 semantics,
            # division-free)
            s = jnp.where(det >= 0.0, 1.0, -1.0)
            ad = det * s
            uds = ud * s
            vds = vd * s
            eps_ad = eps * ad
            tt = td * pl.reciprocal(det, approx=False)       # (L, P)
            ok = ((ad >= eps) & (uds >= eps_ad) & (vds >= eps_ad)
                  & (uds + vds <= ad + eps_ad) & (tt >= eps)
                  & (tri_col >= 0))
            tt = jnp.where(ok, tt, draw_distance)

            tmin = jnp.min(tt, axis=0, keepdims=True)        # (1, P)
            tri_win = jnp.min(
                jnp.where(tt <= tmin, tri_col, _I32_MAX),
                axis=0, keepdims=True)                       # (1, P)

            better = tmin < out_t_ref[0]
            out_t_ref[0] = jnp.where(better, tmin, out_t_ref[0])
            out_tri_ref[0] = jnp.where(better, tri_win, out_tri_ref[0])


def _cand_clamped(t, kk, cand_, cnt_):
    """Candidate id for step (t, k), clamped to the last valid candidate so
    predicated-off steps re-request the same block (DMA deduped)."""
    return cand_[t, jnp.minimum(kk, jnp.maximum(cnt_[t] - 1, 0))]


@functools.partial(
    jax.jit,
    static_argnames=("leaf", "eps", "draw_distance", "interpret"))
def pallas_tile_intersect(d_tiles: jax.Array, cand: jax.Array,
                          count: jax.Array, boxes: jax.Array,
                          origin: jax.Array,
                          geom_t: jax.Array, slot_mat: jax.Array,
                          leaf: int, eps: float = MT_EPSILON,
                          draw_distance: float = 400.0,
                          interpret: bool = False):
    """Nearest hit per ray for all tiles.

    d_tiles: (nT, 3, P) object-frame unit dirs; cand: (nT, K) int32 cluster
    ids (nearest-first); count: (nT,) valid candidates; boxes: (nT, K, 8)
    gathered candidate AABBs (bmin.xyz | bmax.xyz | pad pad); origin: (3,);
    geom_t: (C, L, 9); slot_mat: (C, L). Returns (t (nT, P), tri (nT, P)).
    """
    n_tiles, _, p = d_tiles.shape
    k = cand.shape[1]
    # TPU lowering requires each block's trailing two dims to be 8/128-
    # divisible or equal to the array dims — hence the trailing singleton
    # on the slot table (slots ride sublanes) and the leading one on the
    # outputs.
    slot3 = slot_mat[:, :, None]                    # (C, L, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles, k),
        in_specs=[
            pl.BlockSpec((1, 3, p), lambda t, kk, cand_, cnt_, o_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, geom_t.shape[1], 9),
                         lambda t, kk, cand_, cnt_, o_:
                         (_cand_clamped(t, kk, cand_, cnt_), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, slot_mat.shape[1], 1),
                         lambda t, kk, cand_, cnt_, o_:
                         (_cand_clamped(t, kk, cand_, cnt_), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 8), lambda t, kk, cand_, cnt_, o_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, p), lambda t, kk, cand_, cnt_, o_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda t, kk, cand_, cnt_, o_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(_kernel, eps=eps,
                               draw_distance=draw_distance, leaf=leaf)
    out_t, out_tri = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, p), jnp.int32),
        ],
        interpret=interpret,
    )(cand, count, origin, d_tiles, geom_t, slot3, boxes)
    return out_t[:, 0], out_tri[:, 0]
