"""Matcher observability: per-GN-iteration Hessian diagnostics.

Replaces the reference's hector_debug_info channel
(src/HectorDebugInfoProvider.h:58-80 + msg/HectorIterData.msg: hessian[9],
determinant, conditionNum, determinant2d, conditionNum2d) with a jitted
instrumented matcher that returns the diagnostics as stacked arrays.
Condition numbers follow the reference: ratio of the largest to smallest
eigenvalue (3x3 via symmetric eigendecomposition, 2x2 translation block
closed-form).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..types import Scan
from ..ops.solve3 import det3
from .cell_models import prob_grid
from .grid import normalize_angle, map_to_world_pose, world_to_map_pose
from .interp import quad_pack
from .matcher import gn_step


class IterDiagnostics(NamedTuple):
    """One entry per GN iteration (leading axis = iteration, coarse->fine
    order like the debug topic's append order)."""

    hessian: jnp.ndarray          # f32[I, 3, 3]
    determinant: jnp.ndarray      # f32[I]
    condition_num: jnp.ndarray    # f32[I] (3x3, eig_max / eig_min)
    determinant_2d: jnp.ndarray   # f32[I] translation block
    condition_num_2d: jnp.ndarray # f32[I]


def _eig2_sym(a, b, c):
    """Eigenvalues (lo, hi) of [[a, b], [b, c]]."""
    tr = a + c
    diff = a - c
    root = jnp.sqrt(diff * diff + 4.0 * b * b)
    return (tr - root) * 0.5, (tr + root) * 0.5


def _diag_from_hessian(hess: jnp.ndarray):
    eigs = jnp.linalg.eigvalsh(hess)
    cond3 = eigs[2] / eigs[0]
    lo, hi = _eig2_sym(hess[0, 0], hess[0, 1], hess[1, 1])
    det2 = hess[0, 0] * hess[1, 1] - hess[0, 1] * hess[1, 0]
    return det3(hess), cond3, det2, hi / lo


def match_pyramid_debug(
    log_odds_pyramid: Sequence[jnp.ndarray],
    begin_estimate_world: jnp.ndarray,
    scan: Scan,
    cfg: SlamConfig,
):
    """Full coarse->fine match returning (pose, final H, IterDiagnostics
    stacked over every GN iteration of every level)."""
    mcfg = cfg.map
    pose = begin_estimate_world
    hess = jnp.zeros((3, 3), jnp.float32)
    diags = []
    for level in range(mcfg.levels - 1, -1, -1):
        factor = jnp.float32(1.0 / (2.0 ** level))
        pts = scan.points * factor if level > 0 else scan.points
        iters = (cfg.match.iterations_finest if level == 0
                 else cfg.match.iterations_coarse)
        offset = mcfg.top_left_offset
        scale = mcfg.level_scale(level)
        estimate = world_to_map_pose(pose, offset, scale)
        lvl_shape = log_odds_pyramid[level].shape[-2:]
        quad = quad_pack(prob_grid(log_odds_pyramid[level],
                                   cfg.update.cell_model))
        for _ in range(iters + 1):
            estimate, hess = gn_step(quad, lvl_shape, estimate,
                                     pts, scan.mask)
            diags.append((hess,) + _diag_from_hessian(hess))
        estimate = estimate.at[2].set(normalize_angle(estimate[2]))
        world = map_to_world_pose(estimate, offset,
                                  mcfg.level_resolution(level))
        any_valid = jnp.any(scan.mask)
        pose = jnp.where(any_valid, world, pose)

    stacked = IterDiagnostics(
        hessian=jnp.stack([d[0] for d in diags]),
        determinant=jnp.stack([d[1] for d in diags]),
        condition_num=jnp.stack([d[2] for d in diags]),
        determinant_2d=jnp.stack([d[3] for d in diags]),
        condition_num_2d=jnp.stack([d[4] for d in diags]),
    )
    return pose, hess, stacked


match_pyramid_debug_jit = jax.jit(match_pyramid_debug,
                                  static_argnames=("cfg",))
