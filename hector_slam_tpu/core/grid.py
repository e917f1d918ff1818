"""Grid geometry: world<->map transforms, bounds, probability conversion.

TPU-native reimplementation of the reference's GridMapBase transform math
(map/GridMapBase.h:265-280) and log-odds probability conversion
(map/GridMapLogOdds.h:163-167). No lazy probability cache
(map/GridMapCacheArray.h): on TPU we apply the sigmoid directly to the
gathered cell values — 4N exps per iteration instead of a 2^20-cell shadow
array, and numerically identical per cell.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import MapConfig


def world_to_map(xy: jnp.ndarray, offset, scale) -> jnp.ndarray:
    """mapTworld = Scaling(1/cell) * Translation(offset) (GridMapBase.h:272).

    Composed the way Eigen composes it: the affine's translation is the
    pre-scaled offset, so map = s*w + (s*o) — NOT (w+o)*s, which rounds
    differently in f32 and can flip a Bresenham cell at a .5 boundary.
    """
    off = jnp.asarray(offset, jnp.float32)
    s = jnp.float32(scale)
    return xy * s + off * s


def map_to_world(xy: jnp.ndarray, offset, cell_length) -> jnp.ndarray:
    """worldTmap = mapTworld.inverse() (GridMapBase.h:279), reproducing
    Eigen's numeric 2x2 affine inversion: invdet = 1/(s*s),
    linear_inv = s*invdet (which is NOT exactly cellLength in f32), and
    translation_inv = -linear_inv * (s*o)."""
    off = jnp.asarray(offset, jnp.float32)
    s = jnp.float32(1.0) / jnp.float32(cell_length)   # scaleToMap
    inv_det = jnp.float32(1.0) / (s * s)
    inv_s = s * inv_det
    t = off * s
    return xy * inv_s - inv_s * t


def world_to_map_pose(pose: jnp.ndarray, offset, scale) -> jnp.ndarray:
    """Pose transforms touch x,y only; theta passes through
    (GridMapBase.h:235-239)."""
    m = world_to_map(pose[..., :2], offset, scale)
    return jnp.concatenate([m, pose[..., 2:]], axis=-1)


def map_to_world_pose(pose: jnp.ndarray, offset, cell_length) -> jnp.ndarray:
    w = map_to_world(pose[..., :2], offset, cell_length)
    return jnp.concatenate([w, pose[..., 2:]], axis=-1)


def log_odds_to_prob(log_odds: jnp.ndarray) -> jnp.ndarray:
    """odds/(odds+1) exactly as GridMapLogOdds.h:163-167 (the occupied-side
    log-odds clamp at 50 keeps exp finite)."""
    odds = jnp.exp(log_odds)
    return odds / (odds + jnp.float32(1.0))


# two-float split of the double 2*pi (f64(2*pi) == _TWO_PI_HI + _TWO_PI_LO
# exactly to f64 precision); used to emulate the reference's double-
# precision angle arithmetic on f32-only TPU hardware
_TWO_PI_D = 2.0 * float(np.float64(np.pi))
_TWO_PI_HI = np.float32(_TWO_PI_D)
_TWO_PI_LO = np.float32(_TWO_PI_D - float(_TWO_PI_HI))
# largest f32 <= f64 pi: the reference compares `a > M_PI` in double, and
# no f32 lies strictly between this value and f64 pi, so the f32 compare
# `a > _PI_LOW32` is equivalent
_PI_LOW32 = np.float32(np.nextafter(np.float32(np.pi), np.float32(0.0))) \
    if float(np.float32(np.pi)) > float(np.float64(np.pi)) \
    else np.float32(np.pi)


def _add_twofloat(a: jnp.ndarray, hi, lo) -> jnp.ndarray:
    """Correctly rounded f32(a + (hi+lo)) via 2Sum compensation — the f32
    emulation of one double add + single rounding."""
    s = a + hi
    bv = s - a
    err = (a - (s - bv)) + (hi - bv)   # exact f32 rounding error of a+hi
    return s + (err + lo)


def normalize_angle(angle: jnp.ndarray) -> jnp.ndarray:
    """util/UtilFunctions.h:37-49. The reference's fmod chain runs in
    DOUBLE (``2.0f*M_PI`` is a double expression) and rounds to float
    once — so for |angle| < 2*pi it is NOT the f32 fmod chain: the +2*pi
    and -2*pi steps round like double adds. Emulated here with two-float
    compensated adds (bit-validated against the compiled reference in
    tests/test_reference_binary.py). Inputs beyond +-2*pi first get a
    coarse f32 wrap (the engine never produces them; parity claim is for
    |angle| < 2*pi)."""
    two_pi = jnp.float32(_TWO_PI_HI)
    # coarse range reduction for robustness on wild inputs
    a = jnp.where(jnp.abs(angle) >= two_pi, jnp.fmod(angle, two_pi), angle)
    # fmod(a, 2pi_d) == a exactly for |a| < 2pi; then + 2pi_d, fmod again:
    # identity for a >= 0, one double add for a < 0
    pos = jnp.where(a < 0.0, _add_twofloat(a, _TWO_PI_HI, _TWO_PI_LO), a)
    return jnp.where(pos > _PI_LOW32,
                     _add_twofloat(pos, -_TWO_PI_HI, -_TWO_PI_LO), pos)


def pose_difference_larger_than(pose1: jnp.ndarray, pose2: jnp.ndarray,
                                dist_thresh, angle_thresh) -> jnp.ndarray:
    """Map-update gate predicate (util/UtilFunctions.h:73-92)."""
    d = pose1[:2] - pose2[:2]
    dist_exceeded = jnp.sqrt(jnp.sum(d * d)) > jnp.float32(dist_thresh)
    angle_diff = pose1[2] - pose2[2]
    pi = jnp.float32(jnp.pi)
    angle_diff = jnp.where(angle_diff > pi, angle_diff - 2 * pi, angle_diff)
    angle_diff = jnp.where(angle_diff < -pi, angle_diff + 2 * pi, angle_diff)
    return dist_exceeded | (jnp.abs(angle_diff) > jnp.float32(angle_thresh))


def init_log_odds_pyramid(cfg: MapConfig, cell_model: str = "log_odds"):
    """Freshly reset pyramid (resetGridCell semantics per cell model:
    log-odds 0, probability models 0.5, reflectance zero counters)."""
    from .cell_models import init_fill, storage_channels
    fill = init_fill(cell_model)
    channels = storage_channels(cell_model)
    grids = []
    for lvl in range(cfg.levels):
        sx, sy = cfg.level_size(lvl)
        if channels == 1:
            grids.append(jnp.full((sy, sx), fill, jnp.float32))
        else:
            grids.append(jnp.zeros((channels, sy, sx), jnp.float32))
    return tuple(grids)
