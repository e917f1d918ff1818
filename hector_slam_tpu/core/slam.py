"""SLAM orchestration: the functional match -> gate -> map-update step.

Replaces HectorSlamProcessor (slam_main/HectorSlamProcessor.h:52-139) with
a pure function ``slam_step: (SlamState, Scan) -> (SlamState, StepMetrics)``
that jits to a single XLA program. There are no threads or mutexes
(HectorMapMutex.h / MapProcContainer.h:103-116 have no TPU equivalent):
state is immutable, snapshots are free.

Replicated behaviors:
  - map_without_matching accepts the pose hint verbatim and forces the map
    update (HectorSlamProcessor.h:77-81,89)
  - the map-update gate: integrate only if the pose moved more than the
    distance OR angle threshold since the last accepted update
    (HectorSlamProcessor.h:89-95, util/UtilFunctions.h:73-92)
  - reset seeds last_map_update_pose with FLT_MAX so the first scan always
    maps (HectorSlamProcessor.h:115-124)
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..types import Scan, SlamState, StepMetrics
from ..ops.solve3 import det3
from .grid import init_log_odds_pyramid, pose_difference_larger_than
from .interp import quad_pack_storage
from .mapping import update_pyramid
from .matcher import match_pyramid


def _quads_of(log_odds_pyramid, cell_model: str):
    """Per-level quad-packed prob grids — the matcher's cached view of the
    map (GridMapCacheArray epoch-cache equivalent, see core/interp.py)."""
    return tuple(quad_pack_storage(lo, cell_model) for lo in log_odds_pyramid)


def init_state(cfg: SlamConfig) -> SlamState:
    """Fresh state == HectorSlamProcessor::reset (HectorSlamProcessor.h:115)."""
    flt_max = jnp.float32(jnp.finfo(jnp.float32).max)
    log_odds = init_log_odds_pyramid(cfg.map, cfg.update.cell_model)
    return SlamState(
        log_odds=log_odds,
        pose=jnp.zeros(3, jnp.float32),
        last_map_update_pose=jnp.full((3,), flt_max, jnp.float32),
        covariance=jnp.zeros((3, 3), jnp.float32),
        step=jnp.zeros((), jnp.int32),
        map_update_count=jnp.zeros((), jnp.int32),
        quads=_quads_of(log_odds, cfg.update.cell_model),
    )


def slam_step(
    state: SlamState,
    scan: Scan,
    cfg: SlamConfig,
    pose_hint: Optional[jnp.ndarray] = None,
    map_without_matching: bool = False,
    beam_axis: Optional[str] = None,
    raster_backend: Optional[str] = None,
) -> Tuple[SlamState, StepMetrics]:
    """One scan update (HectorSlamProcessor::update, :71-113).

    ``pose_hint`` defaults to the last scan-match pose (the node's default
    start estimate, HectorMappingRos.cpp:313-315). ``map_without_matching``
    is static (it changes the traced program). ``beam_axis`` is the mesh
    axis name when the scan's beam dimension is sharded across devices
    (shard_map): normal equations and rasterized cell sets are then
    psum-combined over ICI. ``raster_backend`` forces the map-update
    scatter backend (see core/mapping.update_level) — vmapped callers
    (fleet_step) pass "xla" because a vmapped lax.cond lowers to select
    and would execute BOTH the seg and dense branches.
    """
    hint = state.pose if pose_hint is None else pose_hint

    if map_without_matching:
        new_pose = hint
        hessian = state.covariance
    else:
        result = match_pyramid(state.log_odds, hint, scan, cfg, beam_axis,
                               quads=state.quads)
        new_pose = result.pose
        hessian = result.hessian

    return _finish_step(state, scan, cfg, new_pose, hessian,
                        map_without_matching, beam_axis, raster_backend)


def _finish_step(
    state: SlamState,
    scan: Scan,
    cfg: SlamConfig,
    new_pose: jnp.ndarray,
    hessian: jnp.ndarray,
    map_without_matching: bool = False,
    beam_axis: Optional[str] = None,
    raster_backend: Optional[str] = None,
) -> Tuple[SlamState, StepMetrics]:
    """The gate -> conditional-map-update -> state-assembly tail of
    slam_step (HectorSlamProcessor.h:89-113), split out so the match and
    update phases can be timed as separate device programs
    (SlamSession(timing_mode="phases"), SURVEY.md §5 per-phase timing)."""
    do_update = pose_difference_larger_than(
        new_pose, state.last_map_update_pose,
        cfg.map_update_distance_thresh, cfg.map_update_angle_thresh)
    if map_without_matching:
        do_update = jnp.bool_(True)

    def with_update(pyramid):
        return update_pyramid(pyramid, new_pose, scan, cfg, beam_axis,
                              raster_backend)

    def without_update(pyramid):
        return tuple(pyramid), jnp.zeros((), jnp.int32)

    if beam_axis is None:
        new_log_odds, truncated = jax.lax.cond(
            do_update, with_update, without_update, state.log_odds)
    else:
        # inside shard_map a cond with collectives must run on all
        # replicas; the gate bit is identical everywhere (it derives from
        # the psum'd match), so select after an unconditional update
        updated, truncated = with_update(state.log_odds)
        new_log_odds = tuple(
            jnp.where(do_update, u, o)
            for u, o in zip(updated, state.log_odds))
        truncated = jnp.where(do_update, truncated, 0)
    new_last_update_pose = jnp.where(
        do_update, new_pose, state.last_map_update_pose)

    # refresh the cached prob/quad grids ONLY when the map changed — the
    # reference's epoch-cache invalidation (MapRepMultiMap.h:107-114);
    # non-gated scans (the steady state) pay nothing here. quad_pack has
    # no collectives, so this cond is safe inside shard_map too.
    new_quads = jax.lax.cond(
        do_update,
        lambda _: _quads_of(new_log_odds, cfg.update.cell_model),
        lambda _: state.quads,
        None)

    new_state = SlamState(
        log_odds=new_log_odds,
        pose=new_pose,
        last_map_update_pose=new_last_update_pose,
        covariance=hessian,
        step=state.step + 1,
        map_update_count=state.map_update_count + do_update.astype(jnp.int32),
        quads=new_quads,
    )
    num_valid = jnp.sum(scan.mask).astype(jnp.int32)
    if beam_axis is not None:
        # the scan's beam axis is sharded: metrics must reduce over it or
        # each replica reports only its local shard's count
        num_valid = jax.lax.psum(num_valid, beam_axis)
    metrics = StepMetrics(
        pose_delta=new_pose - state.pose,
        map_updated=do_update,
        hessian_det=det3(hessian),
        num_valid_beams=num_valid,
        truncated_free_cells=truncated,
    )
    return new_state, metrics


@partial(jax.jit, static_argnames=("cfg", "map_without_matching"),
         donate_argnums=(0,))
def slam_step_jit(state: SlamState, scan: Scan, cfg: SlamConfig,
                  pose_hint: Optional[jnp.ndarray] = None,
                  map_without_matching: bool = False):
    """Jitted per-scan step. The input state is donated: the log-odds
    pyramid is updated in place on-device (no HBM copy per scan)."""
    return slam_step(state, scan, cfg, pose_hint, map_without_matching)


@partial(jax.jit, static_argnames=("cfg", "map_without_matching"))
def match_phase_jit(state: SlamState, scan: Scan, cfg: SlamConfig,
                    pose_hint: Optional[jnp.ndarray] = None,
                    map_without_matching: bool = False):
    """The match half of slam_step as its own device program — the
    per-phase timing split SURVEY.md §5 prescribes (the reference's
    closest analog is output_timing, HectorMappingRos.cpp:329-333,
    which times only the whole callback). Returns (new_pose, hessian);
    feed them to update_phase_jit. Chaining the two phases produces the
    same result as slam_step (same ops, two programs)."""
    hint = state.pose if pose_hint is None else pose_hint
    if map_without_matching:
        return hint, state.covariance
    result = match_pyramid(state.log_odds, hint, scan, cfg,
                           quads=state.quads)
    return result.pose, result.hessian


@partial(jax.jit, static_argnames=("cfg", "map_without_matching"),
         donate_argnums=(0,))
def update_phase_jit(state: SlamState, scan: Scan, cfg: SlamConfig,
                     new_pose: jnp.ndarray, hessian: jnp.ndarray,
                     map_without_matching: bool = False):
    """The gate + map-update half of slam_step (see match_phase_jit)."""
    return _finish_step(state, scan, cfg, new_pose, hessian,
                        map_without_matching)


def run_log(state: SlamState, scans: Scan, cfg: SlamConfig):
    """Sequential replay over a stacked scan log (leading time axis) inside
    one jitted ``lax.scan`` — the whole-trajectory equivalent of the 40 Hz
    loop, with zero per-scan host round-trips.

    Returns (final state, poses f32[T,3], metrics stacked over T).
    """

    def body(st, sc):
        st, metrics = slam_step(st, sc, cfg)
        return st, (st.pose, metrics)

    final_state, (poses, metrics) = jax.lax.scan(body, state, scans)
    return final_state, poses, metrics


@partial(jax.jit, static_argnames=("cfg",))
def run_log_jit(state: SlamState, scans: Scan, cfg: SlamConfig):
    return run_log(state, scans, cfg)
