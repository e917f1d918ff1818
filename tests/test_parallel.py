"""Batched + sharded execution tests on the 8-device virtual CPU mesh.

Invariant under test everywhere: parallel/sharded results must equal the
single-device sequential results (the sharding is an implementation
detail, not a semantics change) — modulo f32 psum ordering on the beam
axis, which we bound tightly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hector_slam_tpu.config import MapConfig, SlamConfig
from hector_slam_tpu.core.matcher import match_pyramid
from hector_slam_tpu.core.slam import init_state, slam_step
from hector_slam_tpu.io.scanlog import LaserModel, scan_from_ranges, stack_scans
from hector_slam_tpu.io.simulator import World, corridor_trajectory, simulate_trajectory
from hector_slam_tpu.parallel.batch import (best_hypothesis, fleet_step_jit,
                                            init_fleet, match_hypotheses_jit)
from hector_slam_tpu.parallel.sharded import (make_fleet_step, make_mesh,
                                              shard_fleet_state, shard_scan,
                                              shard_hypotheses)
from hector_slam_tpu.types import Scan

LASER = LaserModel(num_beams=181, angle_min=-1.5707964,
                   angle_increment=0.017453293, range_min=0.1,
                   range_max=10.0)
CFG = SlamConfig(
    map=MapConfig(resolution=0.05, size_x=256, size_y=256, levels=2),
    max_beams=256, max_ray_cells=256)


@pytest.fixture(scope="module")
def fixture():
    world = World.room(size=10.0)
    poses = corridor_trajectory(8, advance=0.05, weave=0.03)
    ranges = simulate_trajectory(world, poses, LASER)
    scale = CFG.map.level_scale(0)
    scans = [scan_from_ranges(r, scale, LASER, CFG.max_beams)
             for r in ranges]
    # build a map from the first few scans with known poses
    state = init_state(CFG)
    for sc, p in zip(scans[:4], poses[:4]):
        state, _ = slam_step(state, sc, CFG, pose_hint=jnp.asarray(p),
                             map_without_matching=True)
    return state, scans, poses


def test_eight_devices():
    assert len(jax.devices()) == 8


def test_match_hypotheses_equals_loop(fixture):
    state, scans, poses = fixture
    rng = np.random.default_rng(0)
    hyps = (poses[4] + rng.normal(0, 0.05, (16, 3))).astype(np.float32)
    batched = match_hypotheses_jit(state.log_odds, jnp.asarray(hyps),
                                   scans[4], CFG)
    for i in range(16):
        single = match_pyramid(state.log_odds, jnp.asarray(hyps[i]),
                               scans[4], CFG)
        np.testing.assert_allclose(np.asarray(batched.pose[i]),
                                   np.asarray(single.pose), atol=1e-5)


def test_best_hypothesis_improves(fixture):
    state, scans, poses = fixture
    rng = np.random.default_rng(1)
    hyps = (poses[4] + rng.normal(0, 0.08, (32, 3))).astype(np.float32)
    best_pose, best_H, res = best_hypothesis(state.log_odds,
                                             jnp.asarray(hyps), scans[4],
                                             CFG)
    assert np.isfinite(np.asarray(res)).all()
    err = np.linalg.norm(np.asarray(best_pose)[:2] - poses[4][:2])
    assert err < 0.1


def test_fleet_vmap_equals_sequential(fixture):
    state, scans, poses = fixture
    R = 4
    fleet = init_fleet(CFG, R)
    # different scan per robot
    scs = stack_scans(scans[:R])
    new_fleet, metrics = fleet_step_jit(fleet, scs, CFG)
    for r in range(R):
        st, m = slam_step(init_state(CFG), scans[r], CFG)
        np.testing.assert_allclose(np.asarray(new_fleet.pose[r]),
                                   np.asarray(st.pose), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(new_fleet.log_odds[0][r]),
                                      np.asarray(st.log_odds[0]))


def test_sharded_fleet_step_matches_vmap(fixture):
    """shard_map over ('robot','beam') == plain vmap, with psum-combined
    normal equations bounded by f32 ordering tolerance."""
    state, scans, poses = fixture
    mesh = make_mesh(8)  # robot=4, beam=2
    R = 8
    fleet = init_fleet(CFG, R)
    # seed each robot's map so matching has gradients: run one known-pose
    # update per robot first (vmap path)
    scs = stack_scans([scans[i % len(scans)] for i in range(R)])
    hints = jnp.asarray(np.tile(poses[0], (R, 1)), jnp.float32)
    seeded, _ = jax.jit(
        lambda f, s: jax.vmap(
            lambda st, sc: slam_step(st, sc, CFG, pose_hint=hints[0],
                                     map_without_matching=True))(f, s),
        static_argnums=())(fleet, scs)

    scs2 = stack_scans([scans[(i + 1) % len(scans)] for i in range(R)])

    # reference: vmap on one device
    want_fleet, want_metrics = jax.jit(
        lambda f, s: jax.vmap(lambda st, sc: slam_step(st, sc, CFG))(f, s)
    )(seeded, scs2)

    # sharded
    step = make_fleet_step(mesh, CFG)
    fleet_sh = shard_fleet_state(seeded, mesh, CFG)
    scs_sh = shard_scan(scs2, mesh)
    got_fleet, got_metrics = step(fleet_sh, scs_sh)

    np.testing.assert_allclose(np.asarray(got_fleet.pose),
                               np.asarray(want_fleet.pose), atol=2e-4)
    assert (np.asarray(got_metrics.map_updated)
            == np.asarray(want_metrics.map_updated)).all()
    # maps: identical wherever the (pose-dependent) rasterization agrees;
    # demand overwhelming agreement
    agree = np.mean(np.asarray(got_fleet.log_odds[0])
                    == np.asarray(want_fleet.log_odds[0]))
    assert agree > 0.999, agree


def test_sharded_hypotheses_matches_unsharded(fixture):
    state, scans, poses = fixture
    mesh = make_mesh(8)
    rng = np.random.default_rng(2)
    hyps = (poses[4] + rng.normal(0, 0.05, (32, 3))).astype(np.float32)
    fn = shard_hypotheses(mesh, CFG)
    got = fn(state.log_odds, jnp.asarray(hyps), scans[4])
    want = match_hypotheses_jit(state.log_odds, jnp.asarray(hyps),
                                scans[4], CFG)
    np.testing.assert_allclose(np.asarray(got.pose), np.asarray(want.pose),
                               atol=1e-6)
