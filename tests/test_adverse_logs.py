"""Accuracy-evidence breadth beyond the single corridor fixture
(round-4 VERDICT #4): two additional fixture families, each replayed
through BOTH the JAX engine (run_log_jit) and the native transcription
of the reference (ref_engine.cpp, itself bit-identical to the compiled
reference — tests/test_reference_binary.py), with the same parity bars
as tests/test_real_log.py:

  1. MULTI-ROOM LOOP: four rooms, four doorways, a 1.3-revolution loop
     that REVISITS already-mapped rooms — the matcher must localize
     against cells integrated hundreds of scans earlier.
  2. ADVERSE CORRIDOR: a dynamic obstacle present for a 50-scan window
     (then vanishing, leaving stale occupied cells), a 25-scan sector
     dropout burst, a total sensor blackout (empty scans — pins the
     reference's return-input behavior, ScanMatcher.h:189), and a
     featureless parallel-wall stretch that starves H of x-information.

The reference's own validation basis was replaying recorded sensor logs
(hector_slam_launch/launch/*_logfile_processing.launch,
hector_mapping/package.xml:7); these synthesized families cover the
failure content such logs contain.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hector_slam_tpu.config import MapConfig, SlamConfig
from hector_slam_tpu.core.slam import init_state, run_log_jit
from hector_slam_tpu.core import pose2d
from hector_slam_tpu.io.scanlog import LaserModel, scan_from_ranges, stack_scans
from hector_slam_tpu.io.simulator import (World, box, corridor_trajectory,
                                          loop_trajectory,
                                          simulate_trajectory)
from hector_slam_tpu.native import ref_oracle as ro

CFG = SlamConfig(
    map=MapConfig(resolution=0.05, size_x=512, size_y=512, levels=3),
    max_beams=576, max_ray_cells=384)
LASER = LaserModel(num_beams=541, angle_min=-2.356194490192345,
                   angle_increment=2 * 0.004363323129985824,
                   range_min=0.1, range_max=20.0)


def _replay_both(ranges):
    scale = CFG.map.level_scale(0)
    stacked = stack_scans([
        scan_from_ranges(r, scale, LASER, CFG.max_beams) for r in ranges])
    state, poses_jax, metrics = run_log_jit(init_state(CFG), stacked, CFG)
    pts = np.asarray(stacked.points)
    mask = np.asarray(stacked.mask)
    poses_ref, _, updated_ref, _ = ro.ref_run(
        pts, mask, np.zeros(2, np.float32), CFG.map.resolution,
        CFG.map.size_x, CFG.map.size_y, CFG.map.levels, want_map=False)
    return (np.asarray(poses_jax), metrics, state, poses_ref, updated_ref)


def _relative_truth(poses_true):
    """Ground truth in the SLAM frame (first pose = origin) — the world
    frame of the simulator is arbitrary; the engine's frame is defined
    by its zero start pose."""
    inv0 = pose2d.invert(np.asarray(poses_true[0], np.float64))
    return np.stack([pose2d.compose(inv0, np.asarray(p, np.float64))
                     for p in poses_true]).astype(np.float32)


@pytest.fixture(scope="module")
def loop_log():
    world = World.multi_room()
    poses_true = loop_trajectory(num_steps=280, weave=0.02)
    ranges = simulate_trajectory(world, poses_true, LASER,
                                 range_noise_std=0.01, seed=7)
    return _replay_both(ranges) + (_relative_truth(poses_true), ranges)


@pytest.fixture(scope="module")
def adverse_log():
    # clutter only in the first half: between the boxes (last at x=6)
    # and the thin pillars at x=8.5/10.5 the corridor is featureless
    # parallel walls — x-information comes only from the distant end cap.
    # Everything stays inside the 512^2 @ 0.05 m map's ±12.8 m span:
    # features beyond map bounds contribute NOTHING to H (out-of-bounds
    # queries return zeros) and cannot anchor the matcher.
    world = World.corridor(length=12.0, width=3.0, with_clutter=False)
    segs = [world.segments]
    for bx, by, s in [(2.0, -0.8, 0.4), (4.0, 0.7, 0.45), (6.0, -0.5, 0.3),
                      (8.5, -0.3, 0.12), (10.5, 0.4, 0.12)]:
        segs.append(np.asarray(box(bx, by, s), np.float64))
    world = World(np.concatenate(segs))
    poses_true = corridor_trajectory(180, advance=0.06, weave=0.03)
    transient = (np.asarray(box(4.6, -0.6, 0.35), np.float64), 30, 80)
    # the sector burst kills one SIDE of the scan (the forward view must
    # survive: in the featureless stretch it is the only x-constraint —
    # blinding it too loses track for good, in BOTH engines identically)
    ranges = simulate_trajectory(
        world, poses_true, LASER, range_noise_std=0.01, seed=9,
        transients=[transient],
        dropout_bursts=[(100, 125, 0, 180),       # side-sector burst
                        (150, 152, 0, LASER.num_beams)])  # total blackout
    return _replay_both(ranges) + (_relative_truth(poses_true),)


# ---- multi-room loop ------------------------------------------------------

def test_loop_pose_parity_vs_reference(loop_log):
    poses_jax, _, _, poses_ref = loop_log[:4]
    rmse = float(np.sqrt(np.mean((poses_jax[:, :2] - poses_ref[:, :2]) ** 2)))
    yaw_rmse = float(np.sqrt(np.mean(
        (poses_jax[:, 2] - poses_ref[:, 2]) ** 2)))
    assert rmse < 0.005, rmse
    assert yaw_rmse < 0.005, yaw_rmse


def test_loop_gate_parity(loop_log):
    _, metrics, state, _, updated_ref = loop_log[:5]
    np.testing.assert_array_equal(np.asarray(metrics.map_updated),
                                  updated_ref)
    assert int(state.map_update_count) == int(updated_ref.sum())


def test_loop_revisit_closes(loop_log):
    """After 1.3 revolutions the trajectory re-enters mapped rooms; the
    re-entry error against ground truth must stay small (the map anchors
    the matcher — open-loop drift cannot accumulate unboundedly on a
    revisited path)."""
    poses_jax, _, _, _, _, truth, _ = loop_log
    # the final 15% of scans retrace the first revolution's path
    err = np.linalg.norm(poses_jax[-20:, :2] - truth[-20:, :2], axis=1)
    assert float(err.max()) < 0.25, err.max()
    drift = float(np.sqrt(np.mean(
        (poses_jax[:, :2] - truth[:, :2]) ** 2)))
    assert drift < 0.25, drift


# ---- adverse corridor -----------------------------------------------------

def test_adverse_pose_parity_vs_reference(adverse_log):
    """Parity must survive dynamic obstacles, dropout bursts, blackouts
    and the featureless stretch (slightly looser than the clean-log bar:
    low-information H makes GN steps amplify f32 rounding)."""
    poses_jax, _, _, poses_ref, _, _ = adverse_log
    rmse = float(np.sqrt(np.mean((poses_jax[:, :2] - poses_ref[:, :2]) ** 2)))
    yaw_rmse = float(np.sqrt(np.mean(
        (poses_jax[:, 2] - poses_ref[:, 2]) ** 2)))
    assert rmse < 0.02, rmse
    assert yaw_rmse < 0.02, yaw_rmse


def test_adverse_gate_parity(adverse_log):
    _, metrics, state, _, updated_ref = adverse_log[:5]
    np.testing.assert_array_equal(np.asarray(metrics.map_updated),
                                  updated_ref)


def test_blackout_scans_return_input_pose(adverse_log):
    """ScanMatcher.h:189: an empty scan returns the input estimate —
    during the total blackout (scans 150-151) the pose must freeze
    exactly, and no map update can fire. (Two scans = 0.12 m of blind
    motion — within the coarse-level GN basin; longer blackouts lose
    track in BOTH engines identically, which is the algorithm, not the
    engine.)"""
    poses_jax, metrics, _, _, _, _ = adverse_log
    for t in range(150, 152):
        np.testing.assert_array_equal(poses_jax[t], poses_jax[149])
        assert not bool(np.asarray(metrics.map_updated)[t])
    assert int(np.asarray(metrics.num_valid_beams)[150]) == 0


def test_global_relocalization_unknown_position(loop_log):
    """Round-4 VERDICT missing #2 / next #3: a kidnapped robot with NO
    position prior anywhere in the mapped multi-room world must recover
    to <0.1 m via relocalize_global (free-cell x theta-grid sweep on the
    coarse level, then full-pyramid GN refine of the survivors)."""
    from hector_slam_tpu.session import SlamSession
    poses_jax, _, state, _, _, _, ranges = loop_log
    tracked = np.asarray(poses_jax[-1])

    sess = SlamSession(CFG, LASER)
    sess.state = state
    # teleport the believed pose to a DIFFERENT room with a wrong heading
    sess.state = sess.state._replace(
        pose=jnp.asarray(tracked + np.asarray([-5.0, -4.0, 2.0],
                                              np.float32)))
    scan = scan_from_ranges(ranges[-1], CFG.map.level_scale(0), LASER,
                            CFG.max_beams)
    out = sess.relocalize_global(scan=scan, n_positions=4096, n_theta=32,
                                 top_k=255, seed=4, method="quad")
    assert out["accepted"], out
    err = float(np.linalg.norm(out["pose"][:2] - tracked[:2]))
    assert err < 0.1, (err, out)
    d_yaw = float(np.arctan2(np.sin(out["pose"][2] - tracked[2]),
                             np.cos(out["pose"][2] - tracked[2])))
    assert abs(d_yaw) < 0.05, d_yaw
    assert out["n_free_cells"] > 100


def test_adverse_tracking_survives(adverse_log):
    """End-to-end sanity: despite all adverse content the trajectory
    stays anchored (the lone pillar re-constrains x after the
    featureless stretch)."""
    poses_jax, _, _, _, _, truth = adverse_log
    final_err = float(np.linalg.norm(poses_jax[-1, :2] - truth[-1, :2]))
    assert final_err < 1.0, final_err
