"""Log-odds occupancy map update: closed-form Bresenham rasterization plus
a commutative scatter, replacing the serial per-beam loop of
map/OccGridMapBase.h:121-260.

Key insight for TPU: the reference's per-scan updateIndex bookkeeping
(OccGridMapBase.h:216-241) makes the sequential update order-independent at
scan granularity —
  - each cell receives the free delta at most once per scan,
  - each cell receives the occupied delta at most once per scan,
  - occupied always wins over free within a scan (a cell marked free and
    then hit gets the free delta reverted via updateUnsetFree),
  - the occupied clamp (logOdds < 50, GridMapLogOdds.h:135-140) tests the
    cell value from *before* this scan's update (the free add is reverted
    before the clamp check).
So the final per-scan effect is exactly:
  new = old + logOddsFree  * [cell in free-set and not in occ-set]
            + logOddsOcc   * [cell in occ-set and old < 50]
which is two boolean masks — computable with commutative scatter-OR, no
sequential hazard. That is what this module does.

The Bresenham path itself is replicated cell-exactly in closed form: for
the integer line algorithm of OccGridMapBase.h:243-260 (error seeded with
abs_da/2), the minor-axis offset after j dominant steps is
``(abs_da//2 + j*abs_db) // abs_da`` — so every free cell's flat offset is
a direct formula over (beam, step), a dense [N, K] integer computation on
the VPU with no data-dependent loop.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import numpy as np
import jax.numpy as jnp

from ..config import SlamConfig
from ..types import Scan
from .cell_models import apply_update
from .grid import world_to_map_pose

_OCC_CLAMP = np.float32(50.0)


def _sign_ref(x: jnp.ndarray) -> jnp.ndarray:
    """util/UtilFunctions.h:56 — sign(0) == -1 (harmless: the minor axis
    offset is only applied when abs_db > 0)."""
    return jnp.where(x > 0, 1, -1).astype(jnp.int32)


def _beam_geometry(grid_shape, pose_world, scan_points, scan_origo,
                   scan_mask, offset, scale):
    """Shared rasterization prologue: beam start/end cells, validity and
    Bresenham parameters (exact reference rounding/validity semantics,
    OccGridMapBase.h:134-158,176,186). Used by both the dense-slot and
    segment-compacted scatter paths so the cell choice is identical."""
    h, w = grid_shape
    pose_map = world_to_map_pose(pose_world, offset, scale)
    s = jnp.sin(pose_map[2])
    c = jnp.cos(pose_map[2])

    # beam start: transform origo, round via +0.5 then int cast
    # (OccGridMapBase.h:134-137). Eigen applies Affine2f as
    # m00*px + (m01*py + t) — translation folded into the second
    # product's sum (verified bitwise vs the compiled reference,
    # native/refbuild) — which matters here because the +0.5 rounding
    # can flip a cell on a 1-ulp difference.
    ox = c * scan_origo[0] + (-s * scan_origo[1] + pose_map[0])
    oy = s * scan_origo[0] + (c * scan_origo[1] + pose_map[1])
    bx = (ox + jnp.float32(0.5)).astype(jnp.int32)
    by = (oy + jnp.float32(0.5)).astype(jnp.int32)

    # beam endpoints, same rounding (OccGridMapBase.h:148-155)
    ex_f = c * scan_points[:, 0] + (-s * scan_points[:, 1] + pose_map[0])
    ey_f = s * scan_points[:, 0] + (c * scan_points[:, 1] + pose_map[1])
    ex = (ex_f + jnp.float32(0.5)).astype(jnp.int32)
    ey = (ey_f + jnp.float32(0.5)).astype(jnp.int32)

    # beam validity: skip if start==end cell (OccGridMapBase.h:158), or
    # start/end outside the map (OccGridMapBase.h:176,186)
    begin_in = (bx >= 0) & (bx < w) & (by >= 0) & (by < h)
    end_in = (ex >= 0) & (ex < w) & (ey >= 0) & (ey < h)
    differs = (ex != bx) | (ey != by)
    valid = scan_mask & differs & begin_in & end_in

    dx = ex - bx
    dy = ey - by
    abs_dx = jnp.abs(dx)
    abs_dy = jnp.abs(dy)
    x_dom = abs_dx >= abs_dy
    abs_da = jnp.where(x_dom, abs_dx, abs_dy)
    abs_db = jnp.where(x_dom, abs_dy, abs_dx)
    return (bx, by, ex, ey, valid, dx, dy, x_dom, abs_da, abs_db)


def rasterize_scan(
    grid_shape: Tuple[int, int],
    pose_world: jnp.ndarray,
    scan_points: jnp.ndarray,   # f32[N,2] this level's scaled points
    scan_origo: jnp.ndarray,    # f32[2]
    scan_mask: jnp.ndarray,     # bool[N]
    offset,
    scale,
    max_ray_cells: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Computes the per-scan free/occupied boolean grids for one level.

    Returns (free_set bool[H,W], occ_set bool[H,W], truncated_cells i32[]).

    ``truncated_cells`` counts free cells dropped because a beam's
    dominant-axis span exceeded ``max_ray_cells`` — the reference marks
    every cell unconditionally (OccGridMapBase.h:243-260), so a nonzero
    count means divergence from reference semantics. With the default
    auto-derived cap (SlamConfig.max_ray_cells == 0 -> max(size_x, size_y))
    no in-map beam can ever truncate.
    """
    p = _bresenham_params(grid_shape, pose_world, scan_points,
                          scan_origo, scan_mask, offset, scale)
    free_set = _dense_free_set(p, grid_shape, max_ray_cells)
    occ_set = _occ_set(p, grid_shape)
    return free_set, occ_set, _truncated_count(p, max_ray_cells)


class _RayParams(NamedTuple):
    """Flat-offset Bresenham parameters for one scan's beams (the cited
    closed form: free cell j of a beam sits at
    start + j*offset_a + ((abs_da//2 + j*abs_db)//abs_da)*offset_b)."""

    ex: jnp.ndarray            # i32[N] end cell x
    ey: jnp.ndarray            # i32[N] end cell y
    valid: jnp.ndarray         # bool[N]
    abs_da: jnp.ndarray        # i32[N] dominant-axis span
    abs_db: jnp.ndarray        # i32[N] minor-axis span
    offset_a: jnp.ndarray      # i32[N] flat step per dominant cell
    offset_b: jnp.ndarray      # i32[N] flat step on minor advance
    start_offset: jnp.ndarray  # i32[] shared sensor-origin cell


def _bresenham_params(grid_shape, pose_world, scan_points, scan_origo,
                      scan_mask, offset, scale) -> _RayParams:
    w = grid_shape[1]
    (bx, by, ex, ey, valid, dx, dy, x_dom, abs_da, abs_db) = \
        _beam_geometry(grid_shape, pose_world, scan_points, scan_origo,
                       scan_mask, offset, scale)
    offset_dx = _sign_ref(dx)
    offset_dy = _sign_ref(dy) * w
    return _RayParams(
        ex=ex, ey=ey, valid=valid, abs_da=abs_da, abs_db=abs_db,
        offset_a=jnp.where(x_dom, offset_dx, offset_dy),
        offset_b=jnp.where(x_dom, offset_dy, offset_dx),
        start_offset=by * w + bx,
    )


def _scatter_true(flat: jnp.ndarray, grid_shape) -> jnp.ndarray:
    """Commutative scatter-OR; the sentinel index (== num cells) drops."""
    h, w = grid_shape
    return (jnp.zeros(h * w, jnp.bool_)
            .at[flat.reshape(-1)].set(True, mode="drop")
            .reshape(h, w))


def _dense_free_set(p: _RayParams, grid_shape, max_ray_cells: int):
    """Free set via the dense [N, K] slot scatter (one slot per possible
    cell of every beam; masked slots target the drop sentinel)."""
    num_cells = grid_shape[0] * grid_shape[1]
    abs_da_safe = jnp.maximum(p.abs_da, 1)  # valid beams have abs_da >= 1
    steps = jnp.arange(max_ray_cells, dtype=jnp.int32)[None, :]   # [1,K]
    err0 = (p.abs_da // 2)[:, None]
    minor = (err0 + steps * p.abs_db[:, None]) // abs_da_safe[:, None]
    free_flat = (p.start_offset + steps * p.offset_a[:, None]
                 + minor * p.offset_b[:, None])
    free_mask = p.valid[:, None] & (steps < p.abs_da[:, None])
    return _scatter_true(jnp.where(free_mask, free_flat, num_cells),
                         grid_shape)


def _occ_set(p: _RayParams, grid_shape) -> jnp.ndarray:
    num_cells = grid_shape[0] * grid_shape[1]
    occ_flat = jnp.where(p.valid, p.ey * grid_shape[1] + p.ex, num_cells)
    return _scatter_true(occ_flat, grid_shape)


def _truncated_count(p: _RayParams, max_ray_cells: int) -> jnp.ndarray:
    # cells silently dropped by the static cap (reference marks them all)
    return jnp.sum(jnp.where(
        p.valid, jnp.maximum(p.abs_da - max_ray_cells, 0),
        0)).astype(jnp.int32)


_SEG = 64   # cells per compacted beam segment


def rasterize_scan_seg(
    grid_shape: Tuple[int, int],
    pose_world: jnp.ndarray,
    scan_points: jnp.ndarray,
    scan_origo: jnp.ndarray,
    scan_mask: jnp.ndarray,
    offset,
    scale,
    max_ray_cells: int,
    budget_segments: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``rasterize_scan`` with SEGMENT COMPACTION: TPU scatter costs
    ~6 ns per STATIC slot whether or not the slot holds a valid cell
    (measured; no scatter mode changes this), and the dense [beams,
    max_ray_cells] layout is sized for the worst-case beam, so typically
    ~75% of its slots are padding. Here the valid 64-cell beam segments
    (~sum(abs_da)/64 of them) are compacted first with cumsum +
    searchsorted — the cheap gather-based primitive (the same one that
    fixed the matcher's repair path; jnp.nonzero/sort/scatter compaction
    are all orders slower) — and the scatter processes ~valid-cells
    slots instead of worst-case slots.

    Cell sets are bit-identical to ``rasterize_scan`` (same closed-form
    Bresenham, same indices; tests assert equality). If a scan's segment
    count exceeds the static ``budget_segments``, the whole
    rasterization falls back to the dense path via lax.cond: exact
    always, slower only for that scan.

    Default budget (round 5, VERDICT #5 — tightened from round 4's
    dense/4 rule against measured telemetry on the 435-scan corridor
    fixture): a sixth of the dense slot count, floored at 1.25x
    n_beams. The floor matters at coarse levels where every beam needs
    >= 1 segment — round 4's dense/4 rule sat BELOW n_beams there
    (864 < 1152 at the bench config's level 2), so the seg path could
    never engage and silently paid the dense scatter. Measured segment
    usage maxima on the fixture: 0.68-0.81x the NEW budgets at every
    level of both standard configs.
    """
    num_cells = grid_shape[0] * grid_shape[1]
    n_beams = scan_points.shape[0]
    k_seg = -(-max_ray_cells // _SEG)
    if budget_segments <= 0:
        budget_segments = max(8, n_beams + (n_beams >> 2),
                              (n_beams * k_seg) // 6)

    p = _bresenham_params(grid_shape, pose_world, scan_points,
                          scan_origo, scan_mask, offset, scale)
    abs_da_safe = jnp.maximum(p.abs_da, 1)
    err0 = p.abs_da // 2
    length = jnp.minimum(p.abs_da, max_ray_cells)  # painted cells/beam

    # valid segments per beam: ceil(length/SEG); compact (beam, seg) ids
    n_seg = jnp.where(p.valid, -(-length // _SEG), 0)        # [N]
    seg_valid = (jnp.arange(k_seg, dtype=jnp.int32)[None, :]
                 < n_seg[:, None])                           # [N, K_seg]
    pos = jnp.cumsum(seg_valid.reshape(-1).astype(jnp.int32))
    total = pos[-1]
    flat_ids = jnp.minimum(
        jnp.searchsorted(pos, jnp.arange(1, budget_segments + 1,
                                         dtype=jnp.int32)),
        n_beams * k_seg - 1)
    slot_ok = jnp.arange(budget_segments) < total
    b_i = flat_ids // k_seg
    s_i = flat_ids % k_seg

    def seg_path(_):
        j = (s_i[:, None] * _SEG
             + jnp.arange(_SEG, dtype=jnp.int32)[None, :])   # [B, SEG]
        minor = (err0[b_i][:, None] + j * p.abs_db[b_i][:, None]) \
            // abs_da_safe[b_i][:, None]
        flat = (p.start_offset + j * p.offset_a[b_i][:, None]
                + minor * p.offset_b[b_i][:, None])
        keep = slot_ok[:, None] & (j < length[b_i][:, None])
        return _scatter_true(jnp.where(keep, flat, num_cells),
                             grid_shape)

    free_set = jax.lax.cond(total > jnp.int32(budget_segments),
                            lambda _: _dense_free_set(p, grid_shape,
                                                      max_ray_cells),
                            seg_path, None)
    occ_set = _occ_set(p, grid_shape)
    return free_set, occ_set, _truncated_count(p, max_ray_cells)


def update_level(
    log_odds: jnp.ndarray,
    pose_world: jnp.ndarray,
    scan_points: jnp.ndarray,
    scan_origo: jnp.ndarray,
    scan_mask: jnp.ndarray,
    offset,
    scale,
    max_ray_cells: int,
    log_odds_free: float,
    log_odds_occupied: float,
    beam_axis: str | None = None,
    cell_model: str = "log_odds",
    raster_backend: str | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Applies one scan's log-odds update to one level (see module doc for
    the scatter-mask derivation from OccGridMapBase.h:216-241).

    Returns (new_log_odds, truncated_cells i32[]).

    ``beam_axis``: when the beam dimension is sharded (inside shard_map),
    each device rasterizes its local beams and the boolean cell sets are
    OR-combined with a psum over ICI — the masks commute, so this is
    exact.

    ``raster_backend``: "seg" (segment-compacted scatter — slots
    proportional to valid cells, dense fallback past the segment
    budget), "xla" (dense-slot scatter), or None = auto: seg on TPU
    (where scatter slots cost ~6 ns each), xla elsewhere. All backends
    produce bit-identical cell sets. (A Pallas in-VMEM paint kernel was
    prototyped and rejected: Mosaic cannot lower per-cell stores — see
    PERF.md round 4 and tools/probe_mosaic_store.py.)
    """
    shape = log_odds.shape[-2:]
    if raster_backend is None:
        raster_backend = ("seg" if jax.default_backend() == "tpu"
                          and beam_axis is None else "xla")
    if raster_backend == "seg":
        free_set, occ_set, truncated = rasterize_scan_seg(
            shape, pose_world, scan_points, scan_origo,
            scan_mask, offset, scale, max_ray_cells)
    else:
        free_set, occ_set, truncated = rasterize_scan(
            shape, pose_world, scan_points, scan_origo,
            scan_mask, offset, scale, max_ray_cells)
    if beam_axis is not None:
        free_set = jax.lax.psum(
            free_set.astype(jnp.int32), beam_axis) > 0
        occ_set = jax.lax.psum(
            occ_set.astype(jnp.int32), beam_axis) > 0
        truncated = jax.lax.psum(truncated, beam_axis)
    free_only = free_set & ~occ_set
    new_log_odds = apply_update(log_odds, free_only, occ_set, cell_model,
                                log_odds_free, log_odds_occupied)
    return new_log_odds, truncated


def update_pyramid(
    log_odds_pyramid: Sequence[jnp.ndarray],
    pose_world: jnp.ndarray,
    scan: Scan,
    cfg: SlamConfig,
    beam_axis: str | None = None,
    raster_backend: str | None = None,
) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """MapRepMultiMap::updateByScan (MapRepMultiMap.h:134-147): every level
    updated independently with its 2^-level-scaled scan.

    Returns (new pyramid tuple, truncated_cells i32[] summed over levels).
    """
    mcfg = cfg.map
    out = []
    truncated_total = jnp.zeros((), jnp.int32)
    for level, lo in enumerate(log_odds_pyramid):
        factor = jnp.float32(1.0 / (2.0 ** level))
        pts = scan.points * factor if level > 0 else scan.points
        org = scan.origo * factor if level > 0 else scan.origo
        new_lo, truncated = update_level(
            lo, pose_world, pts, org, scan.mask,
            mcfg.top_left_offset, mcfg.level_scale(level),
            cfg.level_max_ray_cells(level),
            cfg.update.log_odds_free, cfg.update.log_odds_occupied,
            beam_axis, cfg.update.cell_model,
            raster_backend,
        )
        out.append(new_lo)
        truncated_total = truncated_total + truncated
    return tuple(out), truncated_total
