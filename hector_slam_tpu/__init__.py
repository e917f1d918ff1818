"""hector_slam_tpu: a TPU-native 2D LiDAR SLAM engine with the
capabilities of hector_slam (scan-matching + multi-resolution occupancy
grid mapping), built as a functional JAX/XLA/Pallas core.

See SURVEY.md for the structural analysis of the reference this is built
to, and BASELINE.md for performance targets.
"""

from .config import (BENCH_CONFIG, CITYFLYER_LOG_CONFIG, DEFAULT_CONFIG,
                     HEIGHT_MAPPING_CONFIG, MAPPING_BOX_CONFIG, PR2_CONFIG,
                     SINGLE_MAP_CONFIG, TUTORIAL_CONFIG, UGV_CONFIG,
                     MapConfig, MatchConfig, SlamConfig, UpdateConfig)
from .types import MatchResult, Scan, SlamState, StepMetrics
from .core.slam import init_state, run_log, run_log_jit, slam_step, slam_step_jit
from .core.matcher import match_pyramid, match_level
from .core.mapping import update_pyramid
from .core.debug import match_pyramid_debug, match_pyramid_debug_jit
from .export.occupancy import (grid_meta, map_extends, to_occupancy_grid,
                               to_occupancy_grid_jax, GridMeta)
from .export.images import map_to_image, map_tile_image, write_png, write_pgm
from .export.geotiff import GeotiffExporter, write_geotiff
from .export.trajectory import TrajectoryRecorder, RecoveryInfo
from .export.pose_output import (covariance_6x6, covariance_world_coords,
                                 pose_stamped, quaternion_to_yaw,
                                 yaw_to_quaternion)
from .io.checkpoint import load_state, save_state
from .query.raycast import (distance_to_obstacle,
                            distance_to_obstacle_batch,
                            get_distance_to_obstacle, get_search_position)
from .parallel.batch import (best_hypothesis, fleet_step, fleet_step_jit,
                             init_fleet, match_hypotheses,
                             match_hypotheses_jit)
from .parallel.onehot_match import (match_hypotheses_mxu,
                                    match_hypotheses_mxu_jit)
from .parallel.pallas_match import (match_hypotheses_pallas,
                                    match_hypotheses_pallas_jit)
from .parallel.recovery import auto_prune_top_k, prune_hypotheses_coarse
from .parallel.shared_map import (init_shared_fleet, shared_fleet_step,
                                  shared_fleet_step_jit)
from .query.raycast import get_normal
from .export.markers import arrow_marker, covariance_ellipse, pose_markers
from .session import SlamSession

__version__ = "0.1.0"

__all__ = [
    "BENCH_CONFIG", "CITYFLYER_LOG_CONFIG", "DEFAULT_CONFIG",
    "HEIGHT_MAPPING_CONFIG", "MAPPING_BOX_CONFIG", "PR2_CONFIG",
    "SINGLE_MAP_CONFIG", "TUTORIAL_CONFIG", "UGV_CONFIG",
    "MapConfig", "MatchConfig", "SlamConfig", "UpdateConfig",
    "MatchResult", "Scan", "SlamState", "StepMetrics",
    "init_state", "run_log", "run_log_jit", "slam_step", "slam_step_jit",
    "match_pyramid", "match_level", "update_pyramid",
    "match_pyramid_debug", "match_pyramid_debug_jit",
    "grid_meta", "map_extends", "to_occupancy_grid",
    "to_occupancy_grid_jax", "GridMeta",
    "map_to_image", "map_tile_image", "write_png", "write_pgm",
    "GeotiffExporter", "write_geotiff",
    "TrajectoryRecorder", "RecoveryInfo",
    "covariance_6x6", "covariance_world_coords", "pose_stamped",
    "quaternion_to_yaw", "yaw_to_quaternion",
    "load_state", "save_state",
    "distance_to_obstacle", "distance_to_obstacle_batch",
    "get_distance_to_obstacle", "get_search_position",
    "best_hypothesis", "fleet_step", "fleet_step_jit", "init_fleet",
    "match_hypotheses", "match_hypotheses_jit",
    "match_hypotheses_mxu", "match_hypotheses_mxu_jit",
    "match_hypotheses_pallas", "match_hypotheses_pallas_jit",
    "auto_prune_top_k", "prune_hypotheses_coarse",
    "init_shared_fleet", "shared_fleet_step", "shared_fleet_step_jit",
    "get_normal", "arrow_marker", "covariance_ellipse", "pose_markers",
    "SlamSession",
]
