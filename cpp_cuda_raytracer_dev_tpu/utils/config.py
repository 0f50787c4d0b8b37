"""Render configuration — the reference's scattered compile-time constants
(``PPP_TAG``, ``BLOCK_SIZE``, draw distance 400, background (240,130,0),
``min_node_size``, light/Phong literals; see SURVEY.md §5 "Config") made into
one runtime dataclass. Fields that shape compiled code (resolution, tiling,
method) are static; physical quantities live in the scene/camera pytrees so
they stay differentiable.
"""

from __future__ import annotations

import dataclasses

from .dtypes import (DEFAULT_BACKGROUND_RGB, DEFAULT_DRAW_DISTANCE,
                     MT_EPSILON)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    # Ray termination distance (Camera.cpp:70 / Trixel.cu:47 hardcode 400).
    draw_distance: float = DEFAULT_DRAW_DISTANCE
    # Miss-pixel fill color (Camera.cpp:72).
    background_rgb: tuple[int, int, int] = DEFAULT_BACKGROUND_RGB
    # MT acceptance epsilon (vector.cuh:10-13).
    eps: float = MT_EPSILON
    # Intersection backend: "brute" (oracle), "fixed" (matmul-form brute),
    # "grid" (two-level cluster-accelerated TPU path).
    method: str = "fixed"
    # Triangle chunk for the brute paths (bounds R x chunk memory).
    chunk: int = 2048
    # --- accelerated path ---
    # Triangles per spatial leaf cluster (KD build stops here; the
    # reference uses min_node_size=1, Trixel.h:80 — too fine for a vector
    # machine, so the TPU path uses wide leaves and dense per-leaf MT).
    leaf_size: int = 128
    # Ray-tile edge lengths (pixels): tiles are the unit of culling.
    # 16x32 (512 rays) is the honest-timing on-chip optimum for the
    # flagship bin path at dragon scale (scripts/tile_sweep.py r4:
    # 16.15 ms intersect vs 21.9 at 16x16, agreement 1.0000); the
    # cluster paths (grid/pallas*) were tuned at 64x64 via bench flags.
    tile_h: int = 16
    tile_w: int = 32
    # Max candidate clusters per tile after culling (static shape bound).
    max_candidates: int = 48
    # Two-level cull: pre-select `max_groups` groups of `group_size`
    # consecutive clusters (KD order => spatially coherent) per tile before
    # the cluster-level test — turns the per-tile O(C) cull into
    # O(C/group_size + max_groups*group_size). 0 = flat single-level cull.
    group_size: int = 32
    max_groups: int = 0
    # pallas2 sub-tile predication: rays within a tile are ordered so each
    # (sub_h, sub_w) sub-tile is a contiguous lane run; the kernel skips the
    # Möller–Trumbore epilogue for sub-tiles no ray of which can improve on
    # the current candidate. 0 = whole-tile granularity. sub_h*sub_w should
    # be a multiple of 128 (lane slice alignment).
    sub_h: int = 0
    sub_w: int = 0
    # Candidate-overflow escalation (pallas2): a tile whose frustum sees
    # more than `max_candidates` clusters would silently drop geometry (the
    # reference's stack traversal is exact, Trixel.cu:70-169, so dropping
    # is a parity bug). The `escalate_tiles` worst-overflow tiles are
    # re-culled exactly (flat cull, no group level) with
    # `max_candidates * escalate_factor` candidates in a second kernel
    # pass and their results spliced in. Residual dropped-cluster counts
    # are reported in stats["overflow"]. 0 = disabled.
    escalate_tiles: int = 64
    escalate_factor: int = 4
    # pallas2 telemetry: also return per-tile dynamic candidate-scan counts
    # (intersect_clustered_pallas_v2 then returns (Hit, stats)).
    with_stats: bool = False
    # pallas2 kernel debug: 0 = normal, 1 = count MT sub-tile executions
    # (stats lane 1), 2 = skip MT entirely (loop/slab/DMA floor),
    # 3 = keep predicates/branches but trivial MT body.
    debug_mode: int = 0
    # MXU precision for the MT (det|u|v) contraction: "default" (1 bf16
    # pass), "high" (3 passes), "highest" (6 passes, exact f32).
    mt_precision: str = "highest"
    # --- screen-space binning path (method="bin", accel/binning.py) ---
    # Entry-table chunk streamed per kernel step (power of two). Swept on
    # chip at dragon scale (scripts/bin_bench.py): 512 with 16x16 tiles
    # is the flat optimum (24.7 ms intersect, oracle agreement 1.0000).
    bin_chunk: int = 512
    # Static entry capacity = bin_e_factor * num_triangles + 8192 (each
    # triangle bins to every tile its projected bbox overlaps; overflow is
    # counted in stats and means dropped geometry — raise the factor).
    # Dragon-class @ 960x540/16x32 tiles measures ~1.0 entries/tri; the
    # prepass sort+gathers scale with this static cap, so keep it tight —
    # bin_escalate re-bins at 2x when a scene/camera overflows it.
    bin_e_factor: float = 1.2
    # Intersection arithmetic dtype for the gen-6 bin kernel: "float32"
    # (exact, the default) or "bfloat16" — a documented APPROXIMATE
    # preview mode: 2.6x faster kernel on chip (r5 A/B: 9.3 -> 3.6 ms at
    # dragon scale) but winner agreement vs the exact oracle drops to
    # ~0.66. There is no exact-recheck path on this VPU (no widening
    # bf16 multiplies, and lanes cannot be compacted per-ray), so bf16
    # is NOT used for any validated/benchmark number — r5's committed
    # negative result for VERDICT ask #4.
    bin_mt_dtype: str = "float32"
    # Kernel entry sub-slices per chunk: depth-sorted entries early-exit
    # at (chunk/esub)-entry granularity inside one grid item. A/B'd on
    # chip at dragon scale (scripts/kernel_ab.py, honest timing): esub=4
    # scans 25% FEWER entries but runs 42% SLOWER (per-slice gate +
    # narrower ops overhead), so the default stays 1. An MXU dot variant
    # was also tried and does not compile under Mosaic (K=3 dot_general).
    bin_esub: int = 1
    # Capacity self-healing: when the entry table overflows (dropped
    # geometry), re-bin at 2x e_cap under lax.cond (runtime cost only on
    # the overflowing frame; the reference never drops geometry,
    # Trixel.cu:70-169). Residual overflow past 2x is still reported.
    bin_escalate: bool = True
    # Cull triangles whose plane faces away from the (shared) primary-ray
    # origin before binning (accel/binning.py). EXACT for closed,
    # consistently-wound surfaces viewed from outside (a back-side hit is
    # always occluded by a nearer front face); halves the entry table at
    # dragon scale. OFF by default: the reference's MT is two-sided
    # (|det|, Trixel.cu:101-126) and open meshes (rabbit's base holes,
    # tester's dome) can expose back faces. bench.py enables it per scene
    # and validates full-image agreement against the two-sided oracle.
    backface_cull: bool = False
    # --- scatter-min rasterization path (method="raster", accel/raster.py)
    # Max projected-bbox span (pixels) handled by the per-triangle candidate
    # grid; triangles spanning more (or crossing the camera plane) go to the
    # dense overflow pass below. Cost scales with span^2 * num_tris.
    raster_span: int = 4
    # Static capacity of the overflow pass (0 disables it); overflow beyond
    # the cap is counted in stats — validation fails loudly, never silent.
    raster_ovf_cap: int = 512
    # Shading gather VJP: True = scatter-free sort+cumsum transpose
    # (ops/gather.py, ~35x faster at dragon scale), False = XLA's default
    # scatter-add (kept for A/B validation of the custom VJP).
    sorted_scatter: bool = True
