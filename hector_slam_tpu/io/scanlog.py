"""Scan construction and scan-log IO.

Replaces the reference's ROS message plumbing:
  - ``scan_from_ranges`` mirrors HectorMappingRos::rosLaserScanToDataContainer
    (src/HectorMappingRos.cpp:483-507): polar ranges -> cartesian endpoints
    scaled by scaleToMap, with the (min, max-0.1) range filter.
  - ``scan_from_points`` mirrors rosPointCloudToDataContainer
    (src/HectorMappingRos.cpp:509-542): cartesian points with range^2 and
    behind-robot filters (the z-band filter applies to 3D input upstream).
  - ``save_log``/``load_log`` replace rosbag with a simple .npz scan-log
    format (the reference ships no bag fixtures at all, SURVEY.md §4).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from ..types import Scan


@dataclasses.dataclass(frozen=True)
class LaserModel:
    """Hokuyo UTM-30LX geometry (the reference's headline sensor,
    hector_mapping/package.xml:7): 1081 beams over 270 deg at 40 Hz."""

    num_beams: int = 1081
    angle_min: float = -2.356194490192345   # -135 deg
    angle_increment: float = 0.004363323129985824  # 0.25 deg
    range_min: float = 0.1
    range_max: float = 30.0

    @property
    def angles(self) -> np.ndarray:
        return (self.angle_min
                + np.arange(self.num_beams) * self.angle_increment
                ).astype(np.float32)


def scan_from_ranges(
    ranges: np.ndarray,
    scale_to_map: float,
    laser: LaserModel = LaserModel(),
    max_beams: int = 1152,
    origo: Tuple[float, float] = (0.0, 0.0),
) -> Scan:
    """Polar ranges -> padded Scan (rosLaserScanToDataContainer semantics:
    keep beams with range in (range_min, range_max - 0.1), endpoints
    cos/sin * range * scaleToMap; origo defaults to zero)."""
    ranges = np.asarray(ranges, np.float32)
    angles = laser.angles[: len(ranges)]
    max_range = np.float32(laser.range_max - 0.1)
    keep = (ranges > np.float32(laser.range_min)) & (ranges < max_range)
    dist = ranges[keep] * np.float32(scale_to_map)
    pts = np.stack([np.cos(angles[keep]) * dist,
                    np.sin(angles[keep]) * dist], axis=-1).astype(np.float32)
    return _pad(pts, origo, scale_to_map, max_beams)


def scan_from_points(
    points_base: np.ndarray,
    scale_to_map: float,
    max_beams: int = 1152,
    origo_base: Tuple[float, float] = (0.0, 0.0),
    min_dist: float = 0.4,
    max_dist: float = 30.0,
) -> Scan:
    """Cartesian base-frame points -> padded Scan (the
    rosPointCloudToDataContainer path: range^2 window filter plus the
    behind-robot rejection x<0 and dist^2<0.5, HectorMappingRos.cpp:524-531)."""
    pts = np.asarray(points_base, np.float32)
    d2 = pts[:, 0] ** 2 + pts[:, 1] ** 2
    keep = (d2 > np.float32(min_dist) ** 2) & (d2 < np.float32(max_dist) ** 2)
    keep &= ~((pts[:, 0] < 0.0) & (d2 < np.float32(0.5)))
    pts = (pts[keep] * np.float32(scale_to_map)).astype(np.float32)
    origo = (np.asarray(origo_base, np.float32)
             * np.float32(scale_to_map))
    return _pad(pts, tuple(origo), scale_to_map, max_beams)


def _pad(points: np.ndarray, origo, scale_to_map, max_beams: int) -> Scan:
    n = len(points)
    if n > max_beams:
        raise ValueError(f"scan has {n} beams > max_beams={max_beams}")
    padded = np.zeros((max_beams, 2), np.float32)
    padded[:n] = points
    mask = np.zeros(max_beams, bool)
    mask[:n] = True
    return Scan(points=jnp.asarray(padded),
                origo=jnp.asarray(np.asarray(origo, np.float32)),
                mask=jnp.asarray(mask))


def stack_scans(scans: Sequence[Scan]) -> Scan:
    """Stack per-scan pytrees into one Scan with a leading time axis, for
    ``run_log``'s lax.scan replay."""
    return Scan(
        points=jnp.stack([s.points for s in scans]),
        origo=jnp.stack([s.origo for s in scans]),
        mask=jnp.stack([s.mask for s in scans]),
    )


def save_log(path: str, ranges: np.ndarray, poses_true: Optional[np.ndarray]
             = None, laser: LaserModel = LaserModel()) -> None:
    """Persist a scan log: ranges f32[T, B] plus optional ground truth."""
    data = dict(
        ranges=np.asarray(ranges, np.float32),
        num_beams=laser.num_beams, angle_min=laser.angle_min,
        angle_increment=laser.angle_increment,
        range_min=laser.range_min, range_max=laser.range_max,
    )
    if poses_true is not None:
        data["poses_true"] = np.asarray(poses_true, np.float32)
    np.savez_compressed(path, **data)


def load_log(path: str):
    """Returns (ranges f32[T,B], LaserModel, poses_true or None)."""
    with np.load(path) as z:
        laser = LaserModel(
            num_beams=int(z["num_beams"]), angle_min=float(z["angle_min"]),
            angle_increment=float(z["angle_increment"]),
            range_min=float(z["range_min"]), range_max=float(z["range_max"]))
        poses = z["poses_true"] if "poses_true" in z else None
        return z["ranges"], laser, poses
