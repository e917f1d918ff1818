"""Sigma-point pose covariance and match likelihood/residual — the
OccGridMapUtil auxiliary estimators (OccGridMapUtil.h:106-221). The
reference main path never calls these (SURVEY.md §2.1), but they are part
of the library surface; here they are batched over the 7 sigma points /
N beams in one jitted evaluation instead of 7 serial scans.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..types import Scan
from .interp import interp_with_derivatives


def residual_for_state(log_odds: jnp.ndarray, pose_map: jnp.ndarray,
                       scan: Scan, cell_model: str = "log_odds"
                       ) -> jnp.ndarray:
    """sum(1 - M) over beams (getResidualForState, :204-221)."""
    s, c = jnp.sin(pose_map[2]), jnp.cos(pose_map[2])
    # Eigen affine fold order: m00*px + (m01*py + t) — the bit-validated
    # association (core/interp.py:180-184); keeps this scorer 1-ulp
    # consistent with parallel/batch.residual_for_poses
    tx = c * scan.points[:, 0] + (-s * scan.points[:, 1] + pose_map[0])
    ty = s * scan.points[:, 0] + (c * scan.points[:, 1] + pose_map[1])
    m, _, _ = interp_with_derivatives(
        log_odds, jnp.stack([tx, ty], axis=-1), cell_model)
    return jnp.sum(jnp.where(scan.mask, jnp.float32(1.0) - m, 0.0))


def likelihood_for_state(log_odds: jnp.ndarray, pose_map: jnp.ndarray,
                         scan: Scan, cell_model: str = "log_odds"
                         ) -> jnp.ndarray:
    """1 - residual/numPoints (getLikelihoodForState/Residual,
    :189-202)."""
    resid = residual_for_state(log_odds, pose_map, scan, cell_model)
    n = jnp.maximum(jnp.sum(scan.mask).astype(jnp.float32), 1.0)
    return jnp.float32(1.0) - resid / n


def sigma_point_covariance(log_odds: jnp.ndarray, pose_map: jnp.ndarray,
                           scan: Scan, cell_model: str = "log_odds"
                           ) -> jnp.ndarray:
    """getCovarianceForPose (OccGridMapUtil.h:106-160): 7 sigma points
    (+-1.5 cells translation, +-0.05 rad) weighted by their match
    likelihood; returns the weighted scatter matrix in map coordinates.
    The 7 likelihood evaluations are one vmapped batch."""
    dt = jnp.float32(1.5)
    da = jnp.float32(0.05)
    x, y, ang = pose_map[0], pose_map[1], pose_map[2]
    sigma = jnp.stack([
        jnp.stack([x + dt, y, ang]),
        jnp.stack([x - dt, y, ang]),
        jnp.stack([x, y + dt, ang]),
        jnp.stack([x, y - dt, ang]),
        jnp.stack([x, y, ang + da]),
        jnp.stack([x, y, ang - da]),
        jnp.stack([x, y, ang]),
    ])  # [7, 3]
    lh = jax.vmap(lambda p: likelihood_for_state(log_odds, p, scan,
                                                 cell_model))(sigma)
    inv_norm = jnp.float32(1.0) / jnp.sum(lh)
    mean = jnp.sum(sigma * lh[:, None], axis=0) * inv_norm
    d = sigma - mean
    return jnp.einsum("s,si,sj->ij", lh * inv_norm, d, d)


def interp_map_value(log_odds: jnp.ndarray, coords: jnp.ndarray,
                     cell_model: str = "log_odds") -> jnp.ndarray:
    """Plain bilinear value without gradients (interpMapValue,
    OccGridMapUtil.h:233-285)."""
    m, _, _ = interp_with_derivatives(log_odds, coords, cell_model)
    return m


sigma_point_covariance_jit = jax.jit(
    sigma_point_covariance, static_argnames=("cell_model",))
