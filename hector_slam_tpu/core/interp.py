"""Beam-parallel bilinear map interpolation with hector_slam's quirk
gradients, and the JtJ/JtR normal-equation accumulation.

This is THE hot kernel (reference call stack SURVEY.md §3.1): the C++
version iterates ~1081 beams serially through
OccGridMapUtil::interpMapValueWithDerivatives (OccGridMapUtil.h:287-347)
and accumulates H/dTr scalar-by-scalar (OccGridMapUtil.h:64-104). Here the
beam axis is fully vectorized on the VPU and the 3x3 accumulation becomes
a [3,N]@[N,3] matmul.

TPU gather economics drive the layout: XLA's TPU gather costs ~5 cycles
per *query* regardless of the slice width, so fetching the 2x2 bilinear
neighborhood as four separate gathers wastes 4x the scalar-core budget.
``quad_pack`` precomputes, once per map epoch (the TPU replacement for
GridMapCacheArray's lazy per-cell cache), a [H*W, 4] array holding
(P00, P10, P01, P11) for every cell, and ``interp_quad`` fetches all four
neighbors with ONE flat gather. Values are exact f32 copies, so numerics
are bit-identical to the 4-gather path.

Discrete behaviors replicated exactly:
  - out-of-bounds rule ``coord < 0 or coord > size-2``
    (MapDimensionProperties.h:65-73) -> (0,0,0) contribution
  - floor by int cast (OccGridMapUtil.h:295)
  - neighbor fetch P00=idx, P10=idx+1, P01=idx+sizeX, P11=idx+sizeX+1
    (OccGridMapUtil.h:302-330)
  - GRADIENT QUIRK (OccGridMapUtil.h:332-346): x-gradient blends the two
    row-differences with the *x* fractional factor (not y), y-gradient
    blends the column-differences with the *y* factor (not x).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from .cell_models import prob_grid, storage_to_prob

_F1 = np.float32(1.0)


def quad_pack(prob: jnp.ndarray) -> jnp.ndarray:
    """Probability grid f32[H, W] -> f32[H*W, 4] neighbor quads
    (P00, P10, P01, P11 per cell). The rolled wrap-around entries in the
    last row/column are never read: interp clips cell indices to
    (h-2, w-2), so every fetched quad lies fully inside the grid."""
    p00 = prob
    p10 = jnp.roll(prob, -1, axis=1)
    p01 = jnp.roll(prob, -1, axis=0)
    p11 = jnp.roll(p01, -1, axis=1)
    return jnp.stack(
        [p00.reshape(-1), p10.reshape(-1), p01.reshape(-1),
         p11.reshape(-1)], axis=-1)


def quad_pack_storage(storage: jnp.ndarray, cell_model: str) -> jnp.ndarray:
    """Storage grid -> probability quads (prob_grid then quad_pack)."""
    return quad_pack(prob_grid(storage, cell_model))


def _neighbor_derivs(p00, p10, p01, p11, fx, fy, in_bounds):
    """Shared bilinear value + quirk-gradient math
    (OccGridMapUtil.h:332-346)."""
    dx1 = p00 - p10
    dx2 = p01 - p11
    dy1 = p00 - p01
    dy2 = p10 - p11
    xfi = _F1 - fx
    yfi = _F1 - fy

    value = (p00 * xfi + p10 * fx) * yfi + (p01 * xfi + p11 * fx) * fy
    grad_x = -((dx1 * xfi) + (dx2 * fx))   # quirk: x-weighted row blend
    grad_y = -((dy1 * yfi) + (dy2 * fy))   # quirk: y-weighted column blend

    zero = jnp.float32(0.0)
    return (
        jnp.where(in_bounds, value, zero),
        jnp.where(in_bounds, grad_x, zero),
        jnp.where(in_bounds, grad_y, zero),
    )


def interp_quad(
    quad: jnp.ndarray,            # f32[H*W, 4] from quad_pack
    shape: Tuple[int, int],       # (H, W) of the underlying grid
    coords: jnp.ndarray,          # f32[..., 2] map coords
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """interp_with_derivatives over a quad-packed prob grid: one gather
    per query instead of four."""
    h, w = shape
    x = coords[..., 0]
    y = coords[..., 1]
    in_bounds = (
        (x >= 0.0) & (x <= jnp.float32(w - 2))
        & (y >= 0.0) & (y <= jnp.float32(h - 2))
    )
    xi = jnp.clip(x.astype(jnp.int32), 0, w - 2)
    yi = jnp.clip(y.astype(jnp.int32), 0, h - 2)
    fx = x - xi.astype(jnp.float32)
    fy = y - yi.astype(jnp.float32)

    nbrs = quad[(yi * w + xi).reshape(-1)].reshape(x.shape + (4,))
    return _neighbor_derivs(nbrs[..., 0], nbrs[..., 1], nbrs[..., 2],
                            nbrs[..., 3], fx, fy, in_bounds)


def interp_with_derivatives(
    log_odds: jnp.ndarray,   # f32[H, W] one pyramid level
    coords: jnp.ndarray,     # f32[..., 2] map coords
    cell_model: str = "log_odds",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (M, dM/dx, dM/dy), each f32[...]; zeros when out of bounds.

    NON-PRODUCTION PATH: this 4-gather variant is the executable spec —
    production flows through ``interp_quad``/the Pallas kernel (one
    gather of the quad-packed layout); this form is kept as their
    bit-equality cross-check (tests/test_interp.py).

    ``cell_model``: "log_odds" converts gathered values through the
    sigmoid; "simple_count" gathers probabilities directly (also the
    path used for a precomputed reflectance prob grid)."""
    h, w = log_odds.shape
    x = coords[..., 0]
    y = coords[..., 1]
    # bounds: strictly reject > size-2 so the +1 neighbor stays valid
    in_bounds = (
        (x >= 0.0) & (x <= jnp.float32(w - 2))
        & (y >= 0.0) & (y <= jnp.float32(h - 2))
    )
    # int cast truncates toward zero == floor for the in-bounds (>=0) case
    xi = jnp.clip(x.astype(jnp.int32), 0, w - 2)
    yi = jnp.clip(y.astype(jnp.int32), 0, h - 2)
    fx = x - xi.astype(jnp.float32)
    fy = y - yi.astype(jnp.float32)

    # gather 4 neighbors, convert the gathered values to probabilities
    # (replaces the lazy per-cell cache, GridMapCacheArray.h:80-90)
    p00 = storage_to_prob(log_odds[yi, xi], cell_model)
    p10 = storage_to_prob(log_odds[yi, xi + 1], cell_model)
    p01 = storage_to_prob(log_odds[yi + 1, xi], cell_model)
    p11 = storage_to_prob(log_odds[yi + 1, xi + 1], cell_model)

    return _neighbor_derivs(p00, p10, p01, p11, fx, fy, in_bounds)


def hessian_derivs(
    log_odds: jnp.ndarray,    # f32[H, W]
    pose_map: jnp.ndarray,    # f32[3] pose in this level's map coords
    points: jnp.ndarray,      # f32[N, 2] beam endpoints (map-scale, robot frame)
    mask: jnp.ndarray,        # bool[N]
    cell_model: str = "log_odds",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """getCompleteHessianDerivs (OccGridMapUtil.h:64-104), beam-parallel.

    Returns (H f32[3,3], dTr f32[3]). Padded/out-of-bounds beams contribute
    exactly zero to every accumulator (their gradients are zero), matching
    the reference which skips them via the (0,0,0) interp return.
    """
    interp = lambda coords: interp_with_derivatives(
        log_odds, coords, cell_model)
    return _accumulate_normal_eqs(interp, pose_map, points, mask)


def hessian_derivs_quad(
    quad: jnp.ndarray,        # f32[H*W, 4] from quad_pack
    shape: Tuple[int, int],
    pose_map: jnp.ndarray,    # f32[3]
    points: jnp.ndarray,      # f32[N, 2]
    mask: jnp.ndarray,        # bool[N]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """hessian_derivs over a quad-packed prob grid (the hot path: one
    gather per beam)."""
    interp = lambda coords: interp_quad(quad, shape, coords)
    return _accumulate_normal_eqs(interp, pose_map, points, mask)


def _accumulate_normal_eqs(interp, pose_map, points, mask):
    sin_rot = jnp.sin(pose_map[2])
    cos_rot = jnp.cos(pose_map[2])

    px = points[:, 0]
    py = points[:, 1]
    # Eigen applies Affine2f as m00*px + (m01*py + t) — the translation
    # folds into the second product's sum (verified bitwise against the
    # compiled reference, native/refbuild). XLA preserves f32 association,
    # so writing it this way reproduces the reference's rounding.
    tx = cos_rot * px + (-sin_rot * py + pose_map[0])
    ty = sin_rot * px + (cos_rot * py + pose_map[1])

    m, gx, gy = interp(jnp.stack([tx, ty], axis=-1))
    # mask padded beams (the reference never sees them at all)
    valid = mask
    gx = jnp.where(valid, gx, 0.0)
    gy = jnp.where(valid, gy, 0.0)
    m = jnp.where(valid, m, 0.0)

    fun_val = _F1 - m
    rot_deriv = (-sin_rot * px - cos_rot * py) * gx + \
        (cos_rot * px - sin_rot * py) * gy
    rot_deriv = jnp.where(valid, rot_deriv, 0.0)

    jac = jnp.stack([gx, gy, rot_deriv], axis=-1)          # [N, 3]
    # J^T J -> 3x3 (a tiny matmul; batched versions of this land on the MXU)
    hess = jnp.dot(jac.T, jac, preferred_element_type=jnp.float32)
    # J^T r; fun_val of a masked beam is multiplied by a zero jacobian row
    dtr = jnp.dot(jac.T, fun_val, preferred_element_type=jnp.float32)
    return hess, dtr
