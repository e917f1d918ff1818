"""Pytree types for the TPU-native hector-slam engine.

The whole SLAM state is one pytree (functional core — replaces the
reference's mutable GridMap + HectorSlamProcessor members,
slam_main/HectorSlamProcessor.h:141-147). Checkpoint/resume is therefore
"save the pytree".
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class Scan(NamedTuple):
    """A laser scan in the DataContainer convention
    (scan/DataPointContainer.h:92-96): beam endpoints in *map-scale units
    of the finest level* relative to the robot, plus the sensor origin
    ``origo`` in the same units. Fixed-size with a validity mask so the
    jitted step has a single static shape.
    """

    points: jnp.ndarray   # f32[N, 2]
    origo: jnp.ndarray    # f32[2]
    mask: jnp.ndarray     # bool[N] — True for real beams, False for padding


class MatchResult(NamedTuple):
    pose: jnp.ndarray      # f32[3] world (x, y, theta)
    hessian: jnp.ndarray   # f32[3, 3] raw H from the finest level
    #                        (the reference's "covariance", ScanMatcher.h:184)


class SlamState(NamedTuple):
    """Full engine state. ``log_odds`` is the multi-resolution pyramid as a
    tuple of independent grids (MapRepMultiMap semantics: levels are
    separately integrated, never downsampled — MapRepMultiMap.h:134-147).
    Grid layout: ``log_odds[level][y, x]`` (row-major flat index
    y*size_x + x, GridMapBase.h:143).
    """

    log_odds: Tuple[jnp.ndarray, ...]      # (f32[H_i, W_i], ...) per level
    pose: jnp.ndarray                      # f32[3] last scan-match pose (world)
    last_map_update_pose: jnp.ndarray      # f32[3] pose gate reference
    covariance: jnp.ndarray                # f32[3,3] last raw Hessian
    step: jnp.ndarray                      # i32[] scan counter
    map_update_count: jnp.ndarray          # i32[] number of accepted updates
    quads: Tuple[jnp.ndarray, ...] = ()    # (f32[H_i*W_i, 4], ...) per level:
    #   quad-packed probability grids derived from log_odds, recomputed
    #   only when the map-update gate fires — the TPU-native equivalent of
    #   the reference's epoch cache (GridMapCacheArray.h:69-72), which
    #   exists so the matcher never re-derives probabilities per scan.
    #   Cheap derived data: excluded from checkpoints (io/checkpoint.py)


class StepMetrics(NamedTuple):
    """Per-scan observability (replaces the reference's debug-info topic,
    src/HectorDebugInfoProvider.h:58-80)."""

    pose_delta: jnp.ndarray        # f32[3] pose change this step
    map_updated: jnp.ndarray       # bool[] gate decision
    hessian_det: jnp.ndarray       # f32[] det of final H
    num_valid_beams: jnp.ndarray   # i32[]
    truncated_free_cells: jnp.ndarray  # i32[] cells dropped by the
    #   max_ray_cells cap this step (0 under the default auto cap; the
    #   reference marks every cell, so nonzero == semantic divergence)
