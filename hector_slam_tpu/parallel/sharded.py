"""Device-mesh execution: SPMD sharding of the SLAM workload over a
``jax.sharding.Mesh`` with XLA collectives riding ICI.

This is the §2.4 right-hand column of SURVEY.md — the TPU-native
replacement for the reference's process/topic decomposition:

  - **robot axis** ('robot'): data parallelism over independent
    trajectories; per-robot map pyramids are sharded on their leading
    axis, so each device holds only its robots' maps in HBM. No
    communication at all on this axis (the psum of metrics is optional).
  - **beam axis** ('beam'): model-parallel-style sharding of one scan's
    1081 beams; each device computes partial JtJ/JtR normal-equation
    blocks and partial rasterized cell sets, combined with ``psum`` over
    ICI (core/matcher.py, core/mapping.py take ``beam_axis``).
  - **hypothesis axis**: embarrassingly parallel — expressed as plain
    sharding annotations on the vmapped matcher (no collectives), see
    ``shard_hypotheses``.

Everything is a single jitted program over the mesh (pjit/shard_map);
there is no host-side communication."""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import SlamConfig
from ..types import Scan, SlamState
from ..core.slam import slam_step
from ..core.matcher import match_pyramid
from .batch import match_hypotheses


def make_mesh(n_devices: Optional[int] = None,
              robot_axis: Optional[int] = None) -> Mesh:
    """A ('robot', 'beam') mesh over the first n devices. The beam axis
    gets whatever factor of n the robot axis leaves (beam=2 for even n by
    default, beam=1 for odd/single)."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    if robot_axis is None:
        robot_axis = n // 2 if n % 2 == 0 and n > 1 else n
    beam_axis = n // robot_axis
    assert robot_axis * beam_axis == n, (robot_axis, beam_axis, n)
    import numpy as np
    arr = np.asarray(devs[:n]).reshape(robot_axis, beam_axis)
    return Mesh(arr, ("robot", "beam"))


def _state_specs(cfg: SlamConfig) -> SlamState:
    return SlamState(
        log_odds=tuple(P("robot", None, None)
                       for _ in range(cfg.map.levels)),
        pose=P("robot", None),
        last_map_update_pose=P("robot", None),
        covariance=P("robot", None, None),
        step=P("robot"),
        map_update_count=P("robot"),
        quads=tuple(P("robot", None, None)
                    for _ in range(cfg.map.levels)),
    )


def _scan_specs() -> Scan:
    return Scan(points=P("robot", "beam", None),
                origo=P("robot", None),
                mask=P("robot", "beam"))


def make_fleet_step(mesh: Mesh, cfg: SlamConfig):
    """Builds the jitted multi-chip fleet step:

      states: SlamState with leading robot axis R (R % mesh.robot == 0),
      scans:  Scan with leading robot axis and beam axis sharded over
              the 'beam' mesh axis.

    Inside each shard: vmap over the local robots; each robot's matcher
    and map update psum their partial normal equations / cell sets over
    the 'beam' axis. Output states keep the same sharding as inputs.
    """
    state_specs = _state_specs(cfg)
    scan_specs = _scan_specs()

    def local_step(state_blk: SlamState, scan_blk: Scan):
        def one(st, sc):
            new_st, metrics = slam_step(st, sc, cfg, beam_axis="beam")
            return new_st, metrics
        return jax.vmap(one)(state_blk, scan_blk)

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(state_specs, scan_specs),
        out_specs=(state_specs, _metrics_specs()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def _metrics_specs():
    from ..types import StepMetrics
    return StepMetrics(pose_delta=P("robot", None),
                       map_updated=P("robot"),
                       hessian_det=P("robot"),
                       num_valid_beams=P("robot"),
                       truncated_free_cells=P("robot"))


def shard_fleet_state(state: SlamState, mesh: Mesh,
                      cfg: SlamConfig) -> SlamState:
    """Places a host-built fleet state (leading robot axis) onto the mesh
    with per-leaf NamedShardings."""
    specs = _state_specs(cfg)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state, specs)


def shard_scan(scan: Scan, mesh: Mesh) -> Scan:
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        scan, _scan_specs())


_SHARED_AXIS = ("robot", "beam")    # shared-map fleet: robots over the
#   WHOLE mesh, one replicated pyramid


def _shared_fleet_state_specs(cfg: SlamConfig) -> SlamState:
    repl2 = P(None, None)
    return SlamState(
        log_odds=tuple(repl2 for _ in range(cfg.map.levels)),
        pose=P(_SHARED_AXIS, None),
        last_map_update_pose=P(_SHARED_AXIS, None),
        covariance=P(_SHARED_AXIS, None, None),
        step=P(),
        map_update_count=P(),
        quads=tuple(repl2 for _ in range(cfg.map.levels)),
    )


def _shared_fleet_scan_specs() -> Scan:
    return Scan(points=P(_SHARED_AXIS, None, None),
                origo=P(_SHARED_AXIS, None),
                mask=P(_SHARED_AXIS, None))


def make_shared_fleet_step(mesh: Mesh, cfg: SlamConfig):
    """Multi-chip SHARED-MAP fleet (parallel/shared_map.py over the
    mesh): the robot axis is sharded over ALL mesh devices, the one
    shared pyramid is replicated, and the per-step combined update
    psum-ORs the boolean cell sets over ICI — communication is
    1 bit/cell/level/step (as int32 psum), independent of fleet size.
    The discrete update algebra is EXACT vs the single-device
    shared_fleet_step (the OR is commutative; tests pin it on the
    virtual mesh).

    Takes (state from init_shared_fleet with R % n_devices == 0, scans
    with leading robot axis); returns the same structures."""
    from .shared_map import shared_fleet_step
    from ..types import StepMetrics
    metrics_specs = StepMetrics(pose_delta=P(_SHARED_AXIS, None),
                                map_updated=P(_SHARED_AXIS),
                                hessian_det=P(_SHARED_AXIS),
                                num_valid_beams=P(_SHARED_AXIS),
                                truncated_free_cells=P())

    def local_step(state_blk: SlamState, scans_blk: Scan):
        return shared_fleet_step(state_blk, scans_blk, cfg,
                                 robot_axis=_SHARED_AXIS)

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(_shared_fleet_state_specs(cfg),
                  _shared_fleet_scan_specs()),
        out_specs=(_shared_fleet_state_specs(cfg), metrics_specs),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def shard_shared_fleet_state(state: SlamState, mesh: Mesh,
                             cfg: SlamConfig) -> SlamState:
    """Places an init_shared_fleet state onto the mesh (robots sharded,
    pyramid replicated)."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state, _shared_fleet_state_specs(cfg))


def shard_shared_fleet_scan(scan: Scan, mesh: Mesh) -> Scan:
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        scan, _shared_fleet_scan_specs())


def shard_hypotheses(mesh: Mesh, cfg: SlamConfig):
    """Hypothesis-parallel matching: the H axis of ``begin_poses`` is
    sharded over the WHOLE mesh (both axes flattened); map and scan are
    replicated. Pure data parallelism — XLA inserts no collectives.
    Returns a jitted (pyramid, poses[H,3], scan) -> MatchResult."""
    hyp_sharding = NamedSharding(mesh, P(("robot", "beam"),))
    repl = NamedSharding(mesh, P())

    def fn(pyramid, begin_poses, scan):
        return match_hypotheses(pyramid, begin_poses, scan, cfg)

    return jax.jit(
        fn,
        in_shardings=(None, hyp_sharding, None),
        out_shardings=None,
        static_argnums=(),
    )
