"""NumPy oracle: a faithful transcription of the reference hector_slam
numerics (C++, /root/reference/hector_mapping/include/hector_slam_lib/).

This module is the *specification* that the JAX/TPU engine is tested
against. It is deliberately written scalar-faithfully (float32 ops in the
reference's order where it matters; exact integer Bresenham loops), not for
speed. For fast trajectory-level goldens use the C++ oracle in
``hector_slam_tpu/native`` which reproduces the serial f32 accumulation
order exactly.

Reference citations (file:line into /root/reference/):
  - world<->map transforms: map/GridMapBase.h:265-280
  - bounds rule (dims - 2): map/MapDimensionProperties.h:73, :65-68
  - bilinear interp + the non-textbook gradient blend:
    map/OccGridMapUtil.h:287-347 (gradients :332-346)
  - JtJ / JtR accumulation: map/OccGridMapUtil.h:64-104
  - GN step, H guard, dtheta clamp, +1 iteration, cov = raw H:
    matcher/ScanMatcher.h:54-226
  - log-odds cell update semantics: map/GridMapLogOdds.h:135-167
  - Bresenham ray update, per-scan dedup, occupied-wins:
    map/OccGridMapBase.h:121-260
  - multi-resolution pyramid: slam_main/MapRepMultiMap.h:44-147
  - processor + map-update pose gate: slam_main/HectorSlamProcessor.h:71-124,
    util/UtilFunctions.h:73-92
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import numpy as np

F32 = np.float32


def normalize_angle(angle: float) -> float:
    """util/UtilFunctions.h:37-49. The fmod chain runs in DOUBLE —
    ``2.0f*M_PI`` is a double expression, promoting fmod to
    fmod(double,double) — with one rounding to float at the
    normalize_angle_pos return; the ``a > M_PI`` compare and the final
    subtraction are double too (verified bitwise vs the compiled
    reference, native/refbuild)."""
    two_pi = 2.0 * math.pi
    a = F32(math.fmod(math.fmod(float(F32(angle)), two_pi) + two_pi,
                      two_pi))
    if float(a) > math.pi:
        a = F32(float(a) - two_pi)
    return a


def pose_difference_larger_than(pose1, pose2, dist_thresh, angle_thresh) -> bool:
    """util/UtilFunctions.h:73-92."""
    d = np.asarray(pose1[:2], np.float32) - np.asarray(pose2[:2], np.float32)
    with np.errstate(over="ignore"):  # FLT_MAX sentinel overflows to inf,
        # exactly like the C++ (HectorSlamProcessor.h:117)
        if np.sqrt(np.sum(d * d)) > F32(dist_thresh):
            return True
    angle_diff = F32(pose1[2]) - F32(pose2[2])
    if angle_diff > F32(math.pi):
        angle_diff = angle_diff - F32(math.pi) * F32(2.0)
    elif angle_diff < F32(-math.pi):
        angle_diff = angle_diff + F32(math.pi) * F32(2.0)
    return bool(abs(angle_diff) > F32(angle_thresh))


def prob_to_log_odds(p: float) -> np.float32:
    """GridMapLogOdds.h:199-203: f32 odds division, then the unqualified
    C++ ``log`` promotes to double; the float return rounds back to f32."""
    p = F32(p)
    odds = p / (F32(1.0) - p)
    return F32(math.log(float(odds)))


@dataclasses.dataclass
class OracleMap:
    """One grid level: log-odds storage + world<->map transform.

    Storage is row-major with flat index = y * size_x + x
    (GridMapBase.h:141-159); as a 2-D array that is ``log_odds[y, x]``.
    """

    size_x: int
    size_y: int
    cell_length: float
    top_left_offset: Tuple[float, float]
    log_odds_free: np.float32 = prob_to_log_odds(0.4)
    log_odds_occupied: np.float32 = prob_to_log_odds(0.9)

    def __post_init__(self):
        self.log_odds = np.zeros((self.size_y, self.size_x), np.float32)
        self.update_index = np.full((self.size_y, self.size_x), -1, np.int64)
        self.curr_update_index = 0
        self.scale_to_map = F32(1.0) / F32(self.cell_length)
        # map limits for pointOutOfMapBounds: dims - 2
        # (MapDimensionProperties.h:73)
        self.map_limits = (F32(self.size_x - 2.0), F32(self.size_y - 2.0))

    # ---- transforms (GridMapBase.h:265-280) --------------------------------
    # mapTworld = Scaling(1/cell) * Translation(topLeftOffset), composed
    # and inverted numerically the way Eigen does it:
    #   map   = s*w + (s*off)
    #   world = inv_s*m - inv_s*(s*off),  inv_s = s * (1/(s*s))

    def world_to_map(self, xy) -> np.ndarray:
        xy = np.asarray(xy, np.float32)
        off = np.asarray(self.top_left_offset, np.float32)
        s = self.scale_to_map
        return (xy * s + off * s).astype(np.float32)

    def map_to_world(self, xy) -> np.ndarray:
        xy = np.asarray(xy, np.float32)
        off = np.asarray(self.top_left_offset, np.float32)
        s = self.scale_to_map
        inv_det = F32(1.0) / (s * s)
        inv_s = s * inv_det
        t = off * s
        return (xy * inv_s - inv_s * t).astype(np.float32)

    def world_to_map_pose(self, pose) -> np.ndarray:
        m = self.world_to_map(pose[:2])
        return np.array([m[0], m[1], pose[2]], np.float32)

    def map_to_world_pose(self, pose) -> np.ndarray:
        w = self.map_to_world(pose[:2])
        return np.array([w[0], w[1], pose[2]], np.float32)

    # ---- cell values -------------------------------------------------------

    def point_out_of_bounds(self, xy) -> bool:
        """MapDimensionProperties.h:65-68 (note: > limit, not >=)."""
        return bool(
            (xy[0] < F32(0.0))
            or (xy[0] > self.map_limits[0])
            or (xy[1] < F32(0.0))
            or (xy[1] > self.map_limits[1])
        )

    def grid_probability(self, y: int, x: int) -> np.float32:
        """GridMapLogOdds.h:163-167: odds/(odds+1)."""
        odds = F32(np.exp(self.log_odds[y, x]))
        return F32(odds / (odds + F32(1.0)))

    def prob_grid(self) -> np.ndarray:
        odds = np.exp(self.log_odds, dtype=np.float32)
        return (odds / (odds + F32(1.0))).astype(np.float32)

    def is_occupied(self, y: int, x: int) -> bool:
        """GridMapLogOdds.h:76-79: occupied iff logOdds > 0."""
        return bool(self.log_odds[y, x] > 0.0)

    def is_free(self, y: int, x: int) -> bool:
        return bool(self.log_odds[y, x] < 0.0)

    def reset(self):
        """GridMapBase.h:77-87 + LogOddsCell reset (GridMapLogOdds.h:89-93)."""
        self.log_odds[:] = 0.0
        self.update_index[:] = -1

    # ---- interpolation (OccGridMapUtil.h:287-347) --------------------------

    def interp_with_derivatives(self, coords) -> np.ndarray:
        """Returns (M, dM/dx, dM/dy) with the reference's quirk gradients.

        Out of bounds -> (0, 0, 0). Floor by int cast (coords are >= 0 in
        bounds). The 4 neighbors are P00=(y,x) P10=(y,x+1) P01=(y+1,x)
        P11=(y+1,x+1) via flat index / index+1 / index+sizeX / +1.
        """
        if self.point_out_of_bounds(coords):
            return np.zeros(3, np.float32)
        xi = int(coords[0])  # int cast = floor for positive coords
        yi = int(coords[1])
        fx = F32(coords[0]) - F32(xi)
        fy = F32(coords[1]) - F32(yi)
        p00 = self.grid_probability(yi, xi)
        p10 = self.grid_probability(yi, xi + 1)
        p01 = self.grid_probability(yi + 1, xi)
        p11 = self.grid_probability(yi + 1, xi + 1)

        dx1 = p00 - p10
        dx2 = p01 - p11
        dy1 = p00 - p01
        dy2 = p10 - p11
        xfi = F32(1.0) - fx
        yfi = F32(1.0) - fy
        value = ((p00 * xfi + p10 * fx) * yfi) + ((p01 * xfi + p11 * fx) * fy)
        # GRADIENT QUIRK (OccGridMapUtil.h:344-345): the x-gradient blends
        # the two row-differences with the *x* fraction (textbook would use
        # the y fraction), and symmetrically for y.
        grad_x = -((dx1 * xfi) + (dx2 * fx))
        grad_y = -((dy1 * yfi) + (dy2 * fy))
        return np.array([value, grad_x, grad_y], np.float32)

    # ---- Hessian accumulation (OccGridMapUtil.h:64-104) --------------------

    def complete_hessian_derivs(self, pose_map, points) -> Tuple[np.ndarray, np.ndarray]:
        """Serial f32 accumulation of H (3x3, symmetric) and dTr (JtR)."""
        pose_map = np.asarray(pose_map, np.float32)
        sin_rot = F32(np.sin(pose_map[2]))
        cos_rot = F32(np.cos(pose_map[2]))
        H = np.zeros((3, 3), np.float32)
        dTr = np.zeros(3, np.float32)
        for p in np.asarray(points, np.float32):
            # transform * currPoint. Eigen applies Affine2f as
            # m00*px + (m01*py + t) — the translation is folded into the
            # second product's sum, verified bitwise against the compiled
            # reference (native/refbuild) — NOT ((m00*px + m01*py) + t)
            tx = cos_rot * p[0] + (-sin_rot * p[1] + pose_map[0])
            ty = sin_rot * p[0] + (cos_rot * p[1] + pose_map[1])
            m, gx, gy = self.interp_with_derivatives(
                np.array([tx, ty], np.float32))
            fun_val = F32(1.0) - m
            dTr[0] += gx * fun_val
            dTr[1] += gy * fun_val
            rot_deriv = F32(
                (-sin_rot * p[0] - cos_rot * p[1]) * gx
                + (cos_rot * p[0] - sin_rot * p[1]) * gy
            )
            dTr[2] += rot_deriv * fun_val
            H[0, 0] += gx * gx
            H[1, 1] += gy * gy
            H[2, 2] += rot_deriv * rot_deriv
            H[0, 1] += gx * gy
            H[0, 2] += gx * rot_deriv
            H[1, 2] += gy * rot_deriv
        H[1, 0] = H[0, 1]
        H[2, 0] = H[0, 2]
        H[2, 1] = H[1, 2]
        return H, dTr


def inv3_f32(H: np.ndarray) -> np.ndarray:
    """3x3 inverse via the adjugate in float32, matching Eigen's
    cofactor-based fixed-size ``Matrix3f::inverse()`` (used at
    ScanMatcher.h:205) to f32 rounding."""
    H = np.asarray(H, np.float32)
    c = np.empty((3, 3), np.float32)
    c[0, 0] = H[1, 1] * H[2, 2] - H[1, 2] * H[2, 1]
    c[0, 1] = H[1, 2] * H[2, 0] - H[1, 0] * H[2, 2]
    c[0, 2] = H[1, 0] * H[2, 1] - H[1, 1] * H[2, 0]
    c[1, 0] = H[0, 2] * H[2, 1] - H[0, 1] * H[2, 2]
    c[1, 1] = H[0, 0] * H[2, 2] - H[0, 2] * H[2, 0]
    c[1, 2] = H[0, 1] * H[2, 0] - H[0, 0] * H[2, 1]
    c[2, 0] = H[0, 1] * H[1, 2] - H[0, 2] * H[1, 1]
    c[2, 1] = H[0, 2] * H[1, 0] - H[0, 0] * H[1, 2]
    c[2, 2] = H[0, 0] * H[1, 1] - H[0, 1] * H[1, 0]
    # Eigen: det = cof<0,0>*m00 + (cof<1,0>*m10 + cof<2,0>*m20),
    # RIGHT-associated (verified bitwise vs the compiled reference);
    # for the symmetric H this reduces to the row-0 products below
    det = H[0, 0] * c[0, 0] + (H[0, 1] * c[0, 1] + H[0, 2] * c[0, 2])
    # Eigen rounds each inverse ENTRY as cofactor * (1/det) — multiply by
    # the rounded reciprocal, NOT divide (InverseImpl.h
    # compute_inverse_size3_helper; verified bitwise vs the compiled
    # reference, native/refbuild)
    invdet = F32(1.0) / det
    return (c.T * invdet).astype(np.float32)


def gn_step(grid: OracleMap, estimate_map: np.ndarray, points) -> Tuple[np.ndarray, np.ndarray]:
    """One estimateTransformationLogLh call (ScanMatcher.h:194-226).

    Returns (new_estimate_map, H). If the H(0,0)/H(1,1) guard fails the
    estimate is unchanged (but H is still the freshly computed one, which is
    what the matcher ultimately returns as "covariance").
    """
    H, dTr = grid.complete_hessian_derivs(estimate_map, points)
    estimate = np.array(estimate_map, np.float32)
    if H[0, 0] != 0.0 and H[1, 1] != 0.0:
        # hand-rolled matvec with Eigen's ((a+b)+c) f32 association —
        # numpy's BLAS sgemv may contract with FMA/higher precision
        inv = inv3_f32(H)
        # Eigen's Matrix3f*Vector3f contracts RIGHT-associated:
        # p0 + (p1 + p2) (verified bitwise vs the compiled reference);
        # numpy's BLAS sgemv may contract differently, so hand-roll
        search_dir = np.array(
            [inv[0, 0] * dTr[0] + (inv[0, 1] * dTr[1] + inv[0, 2] * dTr[2]),
             inv[1, 0] * dTr[0] + (inv[1, 1] * dTr[1] + inv[1, 2] * dTr[2]),
             inv[2, 0] * dTr[0] + (inv[2, 1] * dTr[1] + inv[2, 2] * dTr[2])],
            np.float32)
        if search_dir[2] > F32(0.2):
            search_dir[2] = F32(0.2)
        elif search_dir[2] < F32(-0.2):
            search_dir[2] = F32(-0.2)
        estimate = estimate + search_dir
    return estimate, H


def match_data(grid: OracleMap, begin_estimate_world, points,
               max_iterations: int) -> Tuple[np.ndarray, np.ndarray]:
    """ScanMatcher::matchData (ScanMatcher.h:54-190).

    Runs (max_iterations + 1) GN steps; returns (world pose with normalized
    angle, raw final H as the "covariance").
    """
    points = np.asarray(points, np.float32)
    if len(points) == 0:
        return np.asarray(begin_estimate_world, np.float32), np.zeros((3, 3), np.float32)
    estimate = grid.world_to_map_pose(begin_estimate_world)
    H = np.zeros((3, 3), np.float32)
    for _ in range(max_iterations + 1):
        estimate, H = gn_step(grid, estimate, points)
    estimate[2] = normalize_angle(estimate[2])
    return grid.map_to_world_pose(estimate), H


# ---- map update (OccGridMapBase.h:121-260) ---------------------------------


def _sign(x: int) -> int:
    """util/UtilFunctions.h:56 — NOTE sign(0) == -1."""
    return 1 if x > 0 else -1


def update_by_scan(grid: OracleMap, points, origo, pose_world) -> None:
    """OccGridMapBase::updateByScan — exact serial Bresenham transcription.

    ``points``/``origo`` are in map-scale units relative to the robot (the
    DataContainer convention, DataPointContainer.h:92-96): the pose is
    converted to map coords and applied as Translation*Rotation.
    """
    curr_mark_free = grid.curr_update_index + 1
    curr_mark_occ = grid.curr_update_index + 2

    pose_map = grid.world_to_map_pose(np.asarray(pose_world, np.float32))
    s = F32(np.sin(pose_map[2]))
    c = F32(np.cos(pose_map[2]))

    def tf(p):
        # Eigen affine order: m00*px + (m01*py + t), see
        # complete_hessian_derivs
        return (c * p[0] + (-s * p[1] + pose_map[0]),
                s * p[0] + (c * p[1] + pose_map[1]))

    ox, oy = tf(np.asarray(origo, np.float32))
    # rounding by +0.5 then int cast (OccGridMapBase.h:137)
    begin_x = int(F32(ox) + F32(0.5))
    begin_y = int(F32(oy) + F32(0.5))

    size_x, size_y = grid.size_x, grid.size_y
    flat_lo = grid.log_odds.reshape(-1)
    flat_ui = grid.update_index.reshape(-1)

    def cell_free(offset: int):
        if flat_ui[offset] < curr_mark_free:
            flat_lo[offset] = flat_lo[offset] + grid.log_odds_free
            flat_ui[offset] = curr_mark_free

    def cell_occ(offset: int):
        if flat_ui[offset] < curr_mark_occ:
            if flat_ui[offset] == curr_mark_free:
                flat_lo[offset] = flat_lo[offset] - grid.log_odds_free
            if flat_lo[offset] < F32(50.0):  # GridMapLogOdds.h:137
                flat_lo[offset] = flat_lo[offset] + grid.log_odds_occupied
            flat_ui[offset] = curr_mark_occ

    for p in np.asarray(points, np.float32):
        ex, ey = tf(p)
        end_x = int(F32(ex) + F32(0.5))
        end_y = int(F32(ey) + F32(0.5))
        if (begin_x, begin_y) == (end_x, end_y):
            continue  # OccGridMapBase.h:158
        # bounds checks abort the whole beam (OccGridMapBase.h:176,186)
        if not (0 <= begin_x < size_x and 0 <= begin_y < size_y):
            continue
        if not (0 <= end_x < size_x and 0 <= end_y < size_y):
            continue
        dx = end_x - begin_x
        dy = end_y - begin_y
        abs_dx, abs_dy = abs(dx), abs(dy)
        offset_dx = _sign(dx)
        offset_dy = _sign(dy) * size_x
        offset = begin_y * size_x + begin_x
        if abs_dx >= abs_dy:
            abs_da, abs_db = abs_dx, abs_dy
            offset_a, offset_b = offset_dx, offset_dy
        else:
            abs_da, abs_db = abs_dy, abs_dx
            offset_a, offset_b = offset_dy, offset_dx
        error_b = abs_da // 2
        # bresenham2D (OccGridMapBase.h:243-260): marks abs_da free cells
        # starting at the begin cell, never the endpoint cell.
        cell_free(offset)
        for _ in range(abs_da - 1):
            offset += offset_a
            error_b += abs_db
            if error_b >= abs_da:
                offset += offset_b
                error_b -= abs_da
            cell_free(offset)
        cell_occ(end_y * size_x + end_x)

    grid.curr_update_index += 3  # OccGridMapBase.h:167


# ---- multi-map pyramid + processor -----------------------------------------


class OracleMultiMap:
    """MapRepMultiMap (slam_main/MapRepMultiMap.h:44-147)."""

    def __init__(self, resolution: float, size_x: int, size_y: int,
                 levels: int, start_coords=(0.5, 0.5),
                 free_factor: float = 0.4, occupied_factor: float = 0.9):
        off = (F32(resolution) * F32(size_x) * F32(start_coords[0]),
               F32(resolution) * F32(size_y) * F32(start_coords[1]))
        self.maps: List[OracleMap] = []
        res, sx, sy = resolution, size_x, size_y
        for _ in range(levels):
            m = OracleMap(sx, sy, res, off,
                          log_odds_free=prob_to_log_odds(free_factor),
                          log_odds_occupied=prob_to_log_odds(occupied_factor))
            self.maps.append(m)
            sx //= 2
            sy //= 2
            res *= 2.0

    def match_data(self, begin_estimate_world, points):
        """Coarse->fine chain (MapRepMultiMap.h:116-132)."""
        tmp = np.asarray(begin_estimate_world, np.float32)
        H = np.zeros((3, 3), np.float32)
        for index in range(len(self.maps) - 1, -1, -1):
            if index == 0:
                tmp, H = match_data(self.maps[0], tmp, points, 5)
            else:
                factor = F32(1.0 / (2.0 ** index))
                scaled = (np.asarray(points, np.float32) * factor).astype(np.float32)
                tmp, H = match_data(self.maps[index], tmp, scaled, 3)
        return tmp, H

    def update_by_scan(self, points, origo, pose_world):
        """Every level is updated independently with its scaled scan
        (MapRepMultiMap.h:134-147) — coarse maps are NOT downsampled."""
        points = np.asarray(points, np.float32)
        origo = np.asarray(origo, np.float32)
        for i, m in enumerate(self.maps):
            if i == 0:
                update_by_scan(m, points, origo, pose_world)
            else:
                factor = F32(1.0 / (2.0 ** i))
                update_by_scan(m, (points * factor).astype(np.float32),
                               (origo * factor).astype(np.float32), pose_world)

    def reset(self):
        for m in self.maps:
            m.reset()


class OracleProcessor:
    """HectorSlamProcessor (slam_main/HectorSlamProcessor.h:52-139)."""

    def __init__(self, resolution=0.025, size_x=1024, size_y=1024,
                 levels=3, start_coords=(0.5, 0.5),
                 update_distance_thresh=0.4, update_angle_thresh=0.9,
                 free_factor=0.4, occupied_factor=0.9):
        self.map_rep = OracleMultiMap(resolution, size_x, size_y, levels,
                                      start_coords, free_factor,
                                      occupied_factor)
        self.dist_thresh = update_distance_thresh
        self.angle_thresh = update_angle_thresh
        self.reset()

    def reset(self):
        flt_max = np.float32(np.finfo(np.float32).max)
        self.last_map_update_pose = np.array([flt_max] * 3, np.float32)
        self.last_scan_match_pose = np.zeros(3, np.float32)
        self.last_cov = np.zeros((3, 3), np.float32)
        self.map_rep.reset()

    def update(self, points, origo, pose_hint_world,
               map_without_matching: bool = False):
        if not map_without_matching:
            new_pose, self.last_cov = self.map_rep.match_data(
                pose_hint_world, points)
        else:
            new_pose = np.asarray(pose_hint_world, np.float32)
        self.last_scan_match_pose = new_pose
        if (pose_difference_larger_than(new_pose, self.last_map_update_pose,
                                        self.dist_thresh, self.angle_thresh)
                or map_without_matching):
            self.map_rep.update_by_scan(points, origo, new_pose)
            self.last_map_update_pose = new_pose
        return new_pose
