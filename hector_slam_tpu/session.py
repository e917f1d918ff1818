"""SlamSession: the host-side driver — the L5 layer of the reference
(HectorMappingRos, src/HectorMappingRos.cpp) re-imagined without ROS:
scan ingestion, start-estimate selection, pause/reset/initial-pose
controls, pose + map product publication via callbacks, trajectory
recording, and timing stats.

Control parity:
  - ``pause``/``resume``   <- pause_mapping service (:621-627)
  - ``reset``              <- syscommand "reset" (:393-400)
  - ``reset_with_pose``    <- restart_mapping_with_new_pose / reset_map
                              services (:402-433) and initialpose topic
  - ``set_initial_pose``   <- initialpose: applied to the NEXT scan only
                              (:285-292, initial_pose_set_ latch)
  - ``map_with_known_poses`` mode <- :318-321
  - timing stats           <- output_timing (:329-333)
  - map publication gating by update index <- publishMap (:440)
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .config import SlamConfig
from .core.slam import init_state, slam_step_jit
from .export.occupancy import grid_meta, to_occupancy_grid
from .export.pose_output import pose_stamped
from .export.trajectory import TrajectoryRecorder
from .io.scanlog import LaserModel, scan_from_ranges, scan_from_points
from .types import Scan, SlamState


class SlamSession:
    """Stateful convenience wrapper around the functional core. All the
    actual computation is the jitted ``slam_step``; this class only holds
    the latest state pytree and host-side bookkeeping."""

    def __init__(self, cfg: SlamConfig = SlamConfig(),
                 laser: LaserModel = LaserModel(),
                 map_with_known_poses: bool = False,
                 on_pose: Optional[Callable] = None,
                 on_map_update: Optional[Callable] = None):
        self.cfg = cfg
        self.laser = laser
        self.map_with_known_poses = map_with_known_poses
        self.on_pose = on_pose
        self.on_map_update = on_map_update
        self.trajectory = TrajectoryRecorder()
        self.state: SlamState = init_state(cfg)
        self.paused = False
        self._initial_pose: Optional[np.ndarray] = None
        self._scan_times_ms: List[float] = []
        self._published_update_count = -1
        self.meta = grid_meta(cfg.map)

    # ---- controls ----------------------------------------------------------

    def pause(self) -> None:
        self.paused = True

    def resume(self) -> None:
        self.paused = False

    def reset(self) -> None:
        """Full reset: fresh maps, zero pose (syscommand "reset")."""
        self.state = init_state(self.cfg)
        self.trajectory.reset()
        self._scan_times_ms.clear()
        self._published_update_count = -1

    def reset_with_pose(self, pose) -> None:
        """restart_mapping_with_new_pose: reset maps AND seed the pose."""
        self.reset()
        self.set_initial_pose(pose)

    def set_initial_pose(self, pose) -> None:
        """Latched like initial_pose_set_: consumed by the next scan."""
        self._initial_pose = np.asarray(pose, np.float32)

    # ---- scan processing ---------------------------------------------------

    def process_ranges(self, ranges, stamp: float = 0.0,
                       pose_hint=None) -> Optional[np.ndarray]:
        """Polar scan path (rosLaserScanToDataContainer)."""
        scan = scan_from_ranges(np.asarray(ranges, np.float32),
                                self.cfg.map.level_scale(0), self.laser,
                                self.cfg.max_beams)
        return self.process_scan(scan, stamp, pose_hint)

    def process_points(self, points_base, stamp: float = 0.0,
                       pose_hint=None, origo=(0.0, 0.0),
                       z_min: float = -1.0, z_max: float = 1.0,
                       min_dist: float = 0.4, max_dist: float = 30.0
                       ) -> Optional[np.ndarray]:
        """Cartesian point path (rosPointCloudToDataContainer,
        HectorMappingRos.cpp:509-542) with the reference's three filters:
        squared-range window (laser_min_dist/laser_max_dist params,
        :96-102,526), the behind-robot cull (skip x<0 points closer than
        sqrt(0.5) m — the robot's own body, :528-530), and the z-band for
        3D input (laser_z_min/max_value, :534-539)."""
        pts = np.asarray(points_base, np.float32)
        dist_sqr = pts[:, 0] ** 2 + pts[:, 1] ** 2
        keep = (dist_sqr > np.float32(min_dist) ** 2) \
            & (dist_sqr < np.float32(max_dist) ** 2) \
            & ~((pts[:, 0] < 0.0) & (dist_sqr < np.float32(0.5)))
        pts = pts[keep]
        if pts.shape[1] == 3:
            keep = (pts[:, 2] > z_min) & (pts[:, 2] < z_max)
            pts = pts[keep, :2]
        scan = scan_from_points(pts, self.cfg.map.level_scale(0),
                                self.cfg.max_beams, origo)
        return self.process_scan(scan, stamp, pose_hint)

    def process_scan(self, scan: Scan, stamp: float = 0.0,
                     pose_hint=None) -> Optional[np.ndarray]:
        """One scan through the engine. Returns the new world pose, or
        None while paused (scanCallback pause gate, :237-240)."""
        if self.paused:
            return None
        t0 = time.perf_counter()

        # start estimate selection (:285-315): explicit hint beats the
        # latched initial pose beats the last scan-match pose
        hint = None
        if pose_hint is not None:
            hint = jnp.asarray(np.asarray(pose_hint, np.float32))
        elif self._initial_pose is not None:
            hint = jnp.asarray(self._initial_pose)
            self._initial_pose = None

        self.state, metrics = slam_step_jit(
            self.state, scan, self.cfg, pose_hint=hint,
            map_without_matching=self.map_with_known_poses)
        pose = np.asarray(self.state.pose)
        self._scan_times_ms.append((time.perf_counter() - t0) * 1e3)

        self.trajectory.add(stamp, pose)
        if self.on_pose is not None:
            self.on_pose(pose_stamped(pose, np.asarray(self.state.covariance),
                                      stamp))
        if self.on_map_update is not None and bool(metrics.map_updated):
            self.on_map_update(self)
        return pose

    # ---- products ----------------------------------------------------------

    @property
    def pose(self) -> np.ndarray:
        return np.asarray(self.state.pose)

    @property
    def covariance(self) -> np.ndarray:
        """Raw scan-match Hessian (the reference's covariance output)."""
        return np.asarray(self.state.covariance)

    def occupancy_grid(self, level: int = 0,
                       only_if_changed: bool = False
                       ) -> Optional[np.ndarray]:
        """int8 map export; with only_if_changed, None is returned when
        the map has not been updated since the last export (publishMap's
        update-index gate, :440)."""
        count = int(self.state.map_update_count)
        if only_if_changed and count == self._published_update_count:
            return None
        self._published_update_count = count
        return to_occupancy_grid(self.state.log_odds[level])

    def save_geotiff(self, base_path: str, with_trajectory: bool = True,
                     objects=(), draw_fns=()) -> tuple:
        """syscommand "savegeotiff" equivalent (geotiff_node.cpp:255-262):
        renders the current level-0 map (+ recorded trajectory + objects
        of interest) to <base>.png + <base>.tfw. ``draw_fns`` are writer
        plugins (map_writer_plugin_interface.h:36-43): callables that
        receive the live exporter and draw before the file is written."""
        from .export.geotiff import write_geotiff
        # render directly from state: the reference's geotiff node pulls
        # the map via its own service call and does not consume the map
        # publisher's update-index gate (geotiff_node.cpp:126), so a
        # geotiff export must not disturb occupancy_grid(only_if_changed=
        # True) bookkeeping for a separate consumer
        occ = to_occupancy_grid(self.state.log_odds[0])
        path = self.trajectory.path() if with_trajectory else None
        if path is not None and not len(path):
            path = None
        return write_geotiff(occ, self.meta, base_path, path_world=path,
                             objects=objects, draw_fns=draw_fns)

    def timing_stats(self) -> dict:
        """output_timing equivalent, aggregated."""
        if not self._scan_times_ms:
            return {"count": 0}
        a = np.asarray(self._scan_times_ms)
        return {"count": len(a), "p50_ms": float(np.percentile(a, 50)),
                "p95_ms": float(np.percentile(a, 95)),
                "mean_ms": float(a.mean())}
