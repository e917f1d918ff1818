"""Gauss-Newton scan matcher and coarse-to-fine pyramid matching.

TPU-native re-design of matcher/ScanMatcher.h:54-226 and the multi-map
chain in slam_main/MapRepMultiMap.h:116-132: the per-scan GN iterations are
statically unrolled inside one jitted function (they are 6/4/4 — tiny,
serial by nature), the beam axis is vectorized (core/interp.py), and the
3x3 solve is closed-form (ops/solve3.py).

Replicated discrete behaviors:
  - (maxIterations + 1) total GN steps: one call before the loop plus
    maxIterations in it (ScanMatcher.h:74,94)
  - solve guard H(0,0)!=0 && H(1,1)!=0 (ScanMatcher.h:201): failed guard
    leaves the estimate unchanged but keeps the freshly computed H
  - dtheta clamp to +-0.2 rad per step (ScanMatcher.h:209-215)
  - final angle normalization (ScanMatcher.h:170)
  - returned "covariance" is the raw final-H (ScanMatcher.h:184)
  - finest level runs 5(+1) iterations, coarser levels 3(+1), pose chains
    coarse -> fine in world coords, coarser levels see the scan scaled by
    2^-level (MapRepMultiMap.h:122-130; DataPointContainer.h:46-58)
  - an empty scan returns the input pose unchanged (ScanMatcher.h:68,189)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import numpy as np
import jax.numpy as jnp

from ..config import SlamConfig
from ..types import MatchResult, Scan
from ..ops.solve3 import solve3
from .grid import (map_to_world_pose, normalize_angle, world_to_map_pose)
from .cell_models import prob_grid
from .interp import hessian_derivs_quad, quad_pack

_CLAMP = np.float32(0.2)


def gn_step(
    quad: jnp.ndarray,           # f32[H*W, 4] quad-packed prob grid
    shape: Tuple[int, int],
    estimate_map: jnp.ndarray,
    points: jnp.ndarray,
    mask: jnp.ndarray,
    beam_axis: str | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One estimateTransformationLogLh step (ScanMatcher.h:194-226) over
    a quad-packed probability grid (interp.quad_pack).

    ``beam_axis``: mesh axis name when the beam dimension is sharded
    (inside shard_map) — the partial JtJ/JtR blocks are psum-reduced over
    ICI before the solve, so every replica takes the identical GN step.
    This is the TPU-native replacement for the reference's serial scan
    loop (SURVEY.md §2.4).
    """
    hess, dtr = hessian_derivs_quad(quad, shape, estimate_map, points,
                                    mask)
    if beam_axis is not None:
        hess = jax.lax.psum(hess, beam_axis)
        dtr = jax.lax.psum(dtr, beam_axis)
    guard = (hess[0, 0] != 0.0) & (hess[1, 1] != 0.0)
    # keep the solve NaN-free when the guard fails (both branches of a
    # `where` are computed): substitute identity, result is discarded
    safe_h = jnp.where(guard, hess, jnp.eye(3, dtype=jnp.float32))
    search_dir = solve3(safe_h, dtr)
    d_theta = jnp.clip(search_dir[2], -_CLAMP, _CLAMP)
    search_dir = search_dir.at[2].set(d_theta)
    new_estimate = jnp.where(guard, estimate_map + search_dir, estimate_map)
    return new_estimate, hess


def match_level(
    quad: jnp.ndarray,           # f32[H*W, 4] quad-packed prob grid
    shape: Tuple[int, int],
    begin_estimate_world: jnp.ndarray,
    points: jnp.ndarray,
    mask: jnp.ndarray,
    iterations: int,
    offset,
    scale,
    cell_length,
    beam_axis: str | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ScanMatcher::matchData on one pyramid level. ``iterations`` is the
    reference's maxIterations; iterations+1 GN steps run (ScanMatcher.h:74,94).
    """
    estimate = world_to_map_pose(begin_estimate_world, offset, scale)
    hess = jnp.zeros((3, 3), jnp.float32)
    for _ in range(iterations + 1):  # static unroll: 6 or 4 steps
        estimate, hess = gn_step(quad, shape, estimate, points, mask,
                                 beam_axis)
    estimate = estimate.at[2].set(normalize_angle(estimate[2]))
    world = map_to_world_pose(estimate, offset, cell_length)
    # empty scan: return the input pose verbatim (ScanMatcher.h:68,189)
    any_valid = jnp.any(mask)
    if beam_axis is not None:
        any_valid = jax.lax.psum(any_valid.astype(jnp.int32), beam_axis) > 0
    world = jnp.where(any_valid, world, begin_estimate_world)
    hess = jnp.where(any_valid, hess, jnp.zeros((3, 3), jnp.float32))
    return world, hess


def match_pyramid(
    log_odds_pyramid: Sequence[jnp.ndarray],
    begin_estimate_world: jnp.ndarray,
    scan: Scan,
    cfg: SlamConfig,
    beam_axis: str | None = None,
    quads: Sequence[jnp.ndarray] | None = None,
) -> MatchResult:
    """MapRepMultiMap::matchData (MapRepMultiMap.h:116-132): coarse->fine,
    scan pre-scaled per level by 2^-level, pose chained in world coords.
    The returned H is the finest level's (it overwrites covMatrix last).

    ``quads``: optional pre-packed per-level prob grids (SlamState.quads,
    the epoch cache — GridMapCacheArray.h:69-72 equivalent); when absent
    they are derived here from the log-odds storage.
    """
    mcfg = cfg.map
    model = cfg.update.cell_model
    pose = begin_estimate_world
    hess = jnp.zeros((3, 3), jnp.float32)
    for level in range(mcfg.levels - 1, -1, -1):
        factor = jnp.float32(1.0 / (2.0 ** level))
        pts = scan.points * factor if level > 0 else scan.points
        iters = (cfg.match.iterations_finest if level == 0
                 else cfg.match.iterations_coarse)
        # storage -> dense quad-packed prob grid once per level: the TPU
        # equivalent of GridMapCacheArray's per-epoch cache, plus the
        # neighbor-quad layout so the GN loop fetches all 4 bilinear
        # neighbors with ONE gather per beam (XLA TPU gather costs per
        # query, not per element). Bitwise identical values; under vmap
        # (multi-hypothesis) this pose-independent packing is traced
        # once, not per hypothesis.
        lvl_shape = log_odds_pyramid[level].shape[-2:]
        if quads is not None and len(quads) > level:
            quad_lvl = quads[level]
        else:
            quad_lvl = quad_pack(prob_grid(log_odds_pyramid[level], model))
        pose, hess = match_level(
            quad_lvl, lvl_shape, pose, pts, scan.mask, iters,
            mcfg.top_left_offset, mcfg.level_scale(level),
            mcfg.level_resolution(level), beam_axis,
        )
    return MatchResult(pose=pose, hessian=hess)
