"""hector_slam_tpu: a TPU-native 2D LiDAR SLAM engine with the
capabilities of hector_slam (scan-matching + multi-resolution occupancy
grid mapping), built as a functional JAX/XLA/Pallas core.

See SURVEY.md for the structural analysis of the reference this is built
to, and BASELINE.md for performance targets.
"""

from .config import (BENCH_CONFIG, DEFAULT_CONFIG, TUTORIAL_CONFIG,
                     MapConfig, MatchConfig, SlamConfig, UpdateConfig)
from .types import MatchResult, Scan, SlamState, StepMetrics
from .core.slam import init_state, run_log, run_log_jit, slam_step, slam_step_jit
from .core.matcher import match_pyramid, match_level
from .core.mapping import update_pyramid

__version__ = "0.1.0"

__all__ = [
    "BENCH_CONFIG", "DEFAULT_CONFIG", "TUTORIAL_CONFIG",
    "MapConfig", "MatchConfig", "SlamConfig", "UpdateConfig",
    "MatchResult", "Scan", "SlamState", "StepMetrics",
    "init_state", "run_log", "run_log_jit", "slam_step", "slam_step_jit",
    "match_pyramid", "match_level", "update_pyramid",
]
