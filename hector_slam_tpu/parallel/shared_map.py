"""Shared-map fleet SLAM: R robots matching against and integrating
into ONE map pyramid (round-5, VERDICT stretch #9) — a genuinely
TPU-native capability past the reference's single-robot design
(HectorSlamProcessor is one map, one pose; SURVEY.md §2.4).

Why it is exact: the map update is built from commutative boolean cell
sets (core/mapping.py — free/occupied masks, occupied-wins,
once-per-scan dedup, OccGridMapBase.h:216-241 semantics). OR-combining
the per-robot sets before ONE log-odds application is the same algebra
the beam-sharded psum-OR path already uses (core/mapping.py
``beam_axis``), extended across the robot axis: every cell still
receives at most one free and one occupied delta per fleet step, and
occupied wins across robots exactly as it wins across beams. The
fleet-step semantics are therefore the reference's per-scan semantics
with "scan" = the union of all gated robots' scans.

Each robot keeps its own pose, covariance, and gate reference; robots
whose pose gate has not fired contribute nothing (their cell sets are
masked out). The shared pyramid and its quad cache update once per
step iff any gate fired.

Scaling note: matching is vmapped over robots (beams x robots fill the
VPU); rasterization materializes per-robot [H, W] boolean sets before
the OR-reduce — ~1 MB x levels per robot at 1024^2, fine for fleets of
tens of robots per chip; shard the robot axis (parallel/sharded.py
mesh) beyond that.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..core.cell_models import apply_update
from ..core.grid import pose_difference_larger_than
from ..core.mapping import rasterize_scan
from ..core.matcher import match_pyramid
from ..core.slam import _quads_of
from ..types import Scan, SlamState, StepMetrics


def init_shared_fleet(cfg: SlamConfig, num_robots: int,
                      start_poses=None) -> SlamState:
    """One shared pyramid; per-robot pose/covariance/gate leaves carry a
    leading robot axis. ``start_poses`` f32[R, 3] seeds each robot's
    world pose (a fleet needs one common frame — the caller knows the
    formation; defaults to all-zeros)."""
    from ..core.slam import init_state
    one = init_state(cfg)
    flt_max = jnp.float32(jnp.finfo(jnp.float32).max)
    poses = (jnp.zeros((num_robots, 3), jnp.float32)
             if start_poses is None
             else jnp.asarray(start_poses, jnp.float32))
    return one._replace(
        pose=poses,
        last_map_update_pose=jnp.full((num_robots, 3), flt_max,
                                      jnp.float32),
        covariance=jnp.zeros((num_robots, 3, 3), jnp.float32),
    )


def shared_fleet_step(
    state: SlamState,           # shared pyramid; pose [R,3] etc.
    scans: Scan,                # leading robot axis: points [R,N,2], ...
    cfg: SlamConfig,
    map_without_matching: bool = False,
    robot_axis=None,
) -> Tuple[SlamState, StepMetrics]:
    """One fleet step: every robot scan-matches against the SHARED map,
    per-robot pose gates fire independently, and all gated scans
    integrate into the shared pyramid as one combined update.

    ``robot_axis``: mesh axis name (or tuple of names) when the robot
    dimension is sharded across devices (inside shard_map, see
    sharded.make_shared_fleet_step): the boolean cell sets and the
    any-gate bit are then psum-OR-combined over ICI — the OR is
    commutative, so the sharded result is BIT-EQUAL to the
    single-device one (tests assert it)."""
    if map_without_matching:
        new_poses = state.pose
        hessians = state.covariance
    else:
        results = jax.vmap(
            lambda hint, pts, org, msk: match_pyramid(
                state.log_odds, hint,
                Scan(points=pts, origo=org, mask=msk), cfg,
                quads=state.quads))(
            state.pose, scans.points, scans.origo, scans.mask)
        new_poses = results.pose
        hessians = results.hessian

    gates = jax.vmap(lambda a, b: pose_difference_larger_than(
        a, b, cfg.map_update_distance_thresh,
        cfg.map_update_angle_thresh))(
        new_poses, state.last_map_update_pose)
    if map_without_matching:
        gates = jnp.ones_like(gates)
    any_gate = jnp.any(gates)
    if robot_axis is not None:
        any_gate = jax.lax.psum(
            any_gate.astype(jnp.int32), robot_axis) > 0

    mcfg = cfg.map

    def combined_update(_):
        new_levels = []
        truncated_total = jnp.zeros((), jnp.int32)
        for level, lo in enumerate(state.log_odds):
            factor = jnp.float32(1.0 / (2.0 ** level))
            pts = scans.points * factor if level > 0 else scans.points
            org = scans.origo * factor if level > 0 else scans.origo
            shape = lo.shape[-2:]
            free_r, occ_r, trunc_r = jax.vmap(
                lambda p, sp, so, sm: rasterize_scan(
                    shape, p, sp, so, sm, mcfg.top_left_offset,
                    mcfg.level_scale(level),
                    cfg.level_max_ray_cells(level)))(
                new_poses, pts, org, scans.mask)
            g = gates[:, None, None]
            free_set = jnp.any(free_r & g, axis=0)
            occ_set = jnp.any(occ_r & g, axis=0)
            if robot_axis is not None:
                # global OR across device-local robot shards (exact: the
                # masks commute, same algebra as the beam-axis psum-OR in
                # core/mapping.update_level)
                free_set = jax.lax.psum(
                    free_set.astype(jnp.int32), robot_axis) > 0
                occ_set = jax.lax.psum(
                    occ_set.astype(jnp.int32), robot_axis) > 0
            free_only = free_set & ~occ_set
            updated = apply_update(lo, free_only, occ_set,
                                   cfg.update.cell_model,
                                   cfg.update.log_odds_free,
                                   cfg.update.log_odds_occupied)
            new_levels.append(jnp.where(any_gate, updated, lo))
            truncated_total = truncated_total + jnp.sum(
                jnp.where(gates, trunc_r, 0))
        if robot_axis is not None:
            truncated_total = jax.lax.psum(truncated_total, robot_axis)
        return tuple(new_levels), truncated_total

    if robot_axis is None:
        # skip the whole R x L rasterization on no-gate steps (the
        # common case under the pose gate) — same pattern as
        # core/slam._finish_step
        new_log_odds, truncated_total = jax.lax.cond(
            any_gate, combined_update,
            lambda _: (tuple(state.log_odds), jnp.zeros((), jnp.int32)),
            None)
    else:
        # inside shard_map a cond around collectives must run on all
        # replicas; any_gate is identical everywhere (psum'd above), so
        # run unconditionally and select — the same trade
        # core/slam._finish_step makes for the beam axis
        new_log_odds, truncated_total = combined_update(None)
        truncated_total = jnp.where(any_gate, truncated_total, 0)

    new_quads = jax.lax.cond(
        any_gate,
        lambda _: _quads_of(new_log_odds, cfg.update.cell_model),
        lambda _: state.quads,
        None)
    new_last = jnp.where(gates[:, None], new_poses,
                         state.last_map_update_pose)

    from ..ops.solve3 import det3
    num_valid = jnp.sum(scans.mask, axis=-1).astype(jnp.int32)
    metrics = StepMetrics(
        pose_delta=new_poses - state.pose,
        map_updated=gates,
        hessian_det=jax.vmap(det3)(hessians),
        num_valid_beams=num_valid,
        truncated_free_cells=truncated_total,
    )
    new_state = state._replace(
        log_odds=new_log_odds,
        pose=new_poses,
        last_map_update_pose=new_last,
        covariance=hessians,
        step=state.step + 1,
        map_update_count=state.map_update_count + any_gate.astype(jnp.int32),
        quads=new_quads,
    )
    return new_state, metrics


shared_fleet_step_jit = jax.jit(shared_fleet_step,
                                static_argnames=("cfg",
                                                 "map_without_matching",
                                                 "robot_axis"),
                                donate_argnums=(0,))
