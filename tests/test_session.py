"""SlamSession driver: controls (pause/reset/initial pose), callbacks,
map publication gating, timing; pose2d algebra; alt cell models;
sigma-point covariance; config presets."""

import numpy as np
import jax.numpy as jnp
import pytest

from hector_slam_tpu.config import (HEIGHT_MAPPING_CONFIG, MapConfig,
                                    SINGLE_MAP_CONFIG, SlamConfig,
                                    UpdateConfig)
from hector_slam_tpu.core import pose2d
from hector_slam_tpu.core.cell_models import (apply_update,
                                              reflectance_prob_grid)
from hector_slam_tpu.core.covariance import (interp_map_value,
                                             likelihood_for_state,
                                             sigma_point_covariance_jit)
from hector_slam_tpu.core.slam import init_state, slam_step_jit
from hector_slam_tpu.io.scanlog import LaserModel, scan_from_ranges
from hector_slam_tpu.io.simulator import World, corridor_trajectory, simulate_trajectory
from hector_slam_tpu.session import SlamSession
from hector_slam_tpu.types import Scan

CFG = SlamConfig(
    map=MapConfig(resolution=0.05, size_x=256, size_y=256, levels=2),
    max_beams=384, max_ray_cells=256)
LASER = LaserModel(num_beams=271, angle_min=-2.356194490192345,
                   angle_increment=4 * 0.004363323129985824,
                   range_min=0.1, range_max=12.0)


@pytest.fixture(scope="module")
def log():
    world = World.corridor(length=8.0, width=3.0)
    poses = corridor_trajectory(12, advance=0.06, weave=0.03)
    return poses, simulate_trajectory(world, poses, LASER)


def test_session_basic_flow(log):
    poses, ranges = log
    got_poses = []
    maps_updated = []
    sess = SlamSession(CFG, LASER,
                       on_pose=lambda p: got_poses.append(p),
                       on_map_update=lambda s: maps_updated.append(1))
    for t, r in enumerate(ranges):
        p = sess.process_ranges(r, stamp=t * 0.025)
        assert p is not None
    assert len(got_poses) == len(ranges)
    assert len(maps_updated) >= 1            # first scan always maps
    assert len(sess.trajectory.path()) == len(ranges)
    st = sess.timing_stats()
    assert st["count"] == len(ranges) and st["p50_ms"] > 0
    err = np.linalg.norm(sess.pose[:2] - poses[len(ranges) - 1][:2])
    assert err < 0.12
    assert sess.covariance.shape == (3, 3)


def test_session_pause_resume(log):
    _, ranges = log
    sess = SlamSession(CFG, LASER)
    sess.pause()
    assert sess.process_ranges(ranges[0]) is None
    assert int(sess.state.step) == 0
    sess.resume()
    assert sess.process_ranges(ranges[0]) is not None
    assert int(sess.state.step) == 1


def test_session_initial_pose_latch(log):
    _, ranges = log
    sess = SlamSession(CFG, LASER, map_with_known_poses=True)
    sess.set_initial_pose([1.0, 2.0, 0.5])
    p1 = sess.process_ranges(ranges[0])
    np.testing.assert_allclose(p1, [1.0, 2.0, 0.5])
    # latched pose consumed: next scan starts from the last match pose
    p2 = sess.process_ranges(ranges[1])
    np.testing.assert_allclose(p2, p1)  # known poses: hint = last pose


def test_session_reset_with_pose(log):
    _, ranges = log
    sess = SlamSession(CFG, LASER, map_with_known_poses=True)
    sess.process_ranges(ranges[0])
    occ1 = sess.occupancy_grid()
    assert (occ1 != -1).sum() > 0
    sess.reset_with_pose([0.5, -0.5, 0.1])
    assert int(sess.state.step) == 0
    assert (sess.occupancy_grid() == -1).all()
    p = sess.process_ranges(ranges[0])
    np.testing.assert_allclose(p, [0.5, -0.5, 0.1])


def test_session_map_publication_gating(log):
    _, ranges = log
    sess = SlamSession(CFG, LASER)
    sess.process_ranges(ranges[0])
    assert sess.occupancy_grid(only_if_changed=True) is not None
    # no further map update -> gated export returns None
    assert sess.occupancy_grid(only_if_changed=True) is None
    assert sess.occupancy_grid() is not None  # ungated always works


def test_session_z_band_filter():
    sess = SlamSession(CFG, LASER)
    pts = np.asarray([[1.0, 0.0, 0.5], [1.0, 0.5, 3.0]], np.float32)
    # second point outside the z band must be dropped
    sess.process_points(pts, z_min=0.0, z_max=1.0)
    # can't see beams directly; check via a fresh known-pose session map
    sess2 = SlamSession(CFG, LASER, map_with_known_poses=True)
    sess2.process_points(pts, z_min=0.0, z_max=1.0)
    occ = sess2.occupancy_grid()
    assert (occ == 100).sum() == 1


def test_pose2d_algebra():
    a = np.asarray([1.0, 2.0, np.pi / 2])
    b = np.asarray([1.0, 0.0, 0.1])
    c = pose2d.compose(a, b)
    np.testing.assert_allclose(c, [1.0, 3.0, np.pi / 2 + 0.1], atol=1e-12)
    ident = pose2d.compose(a, pose2d.invert(a))
    np.testing.assert_allclose(ident, [0, 0, 0], atol=1e-12)
    # map->odom: composing with odom->base must give map->base
    map_base = np.asarray([2.0, 1.0, 0.7])
    odom_base = np.asarray([0.5, -0.2, 0.3])
    m2o = pose2d.map_to_odom(map_base, odom_base)
    np.testing.assert_allclose(pose2d.compose(m2o, odom_base), map_base,
                               atol=1e-12)


def test_simple_count_model_golden():
    """Hand-checked deltas from GridMapSimpleCount.h:101-148."""
    storage = jnp.full((4, 4), 0.5, jnp.float32)
    free = jnp.zeros((4, 4), bool).at[1, 1].set(True)
    occ = jnp.zeros((4, 4), bool).at[2, 2].set(True)
    out = np.asarray(apply_update(storage, free, occ, "simple_count",
                                  0.0, 0.0))
    assert abs(out[1, 1] - 0.4) < 1e-6
    assert abs(out[2, 2] - 0.65) < 1e-6
    # clamps: occupied stops above 1 - 0.15 - 0.0015
    hi = jnp.full((1, 1), 0.86, jnp.float32)
    out2 = np.asarray(apply_update(hi, jnp.zeros((1, 1), bool),
                                   jnp.ones((1, 1), bool), "simple_count",
                                   0.0, 0.0))
    assert out2[0, 0] == np.float32(0.86)  # 0.86 >= 0.8485 limit
    lo = jnp.full((1, 1), 0.05, jnp.float32)
    out3 = np.asarray(apply_update(lo, jnp.ones((1, 1), bool),
                                   jnp.zeros((1, 1), bool), "simple_count",
                                   0.0, 0.0))
    assert out3[0, 0] == np.float32(0.05)  # 0.05 <= 0.099 limit


def test_reflectance_model_golden():
    storage = jnp.zeros((2, 4, 4), jnp.float32)
    free = jnp.zeros((4, 4), bool).at[1, 1].set(True)
    occ = jnp.zeros((4, 4), bool).at[2, 2].set(True)
    out = apply_update(storage, free, occ, "reflectance", 0.0, 0.0)
    out = apply_update(out, free, occ, "reflectance", 0.0, 0.0)
    out = apply_update(out, occ, free, "reflectance", 0.0, 0.0)  # swap
    prob = np.asarray(reflectance_prob_grid(out))
    # cell (1,1): visited 3 (2 free + 1 occ), reflected 1 -> 1/3
    assert abs(prob[1, 1] - 1.0 / 3.0) < 1e-6
    # cell (2,2): visited 3, reflected 2 -> 2/3
    assert abs(prob[2, 2] - 2.0 / 3.0) < 1e-6
    assert prob[0, 0] == 0.5  # unvisited


def test_simple_count_slam_end_to_end(log):
    """The whole engine runs with the alternative cell model. The
    simple-count contrast (+-0.15 per hit from 0.5) is too weak to
    bootstrap tracking from a single scan (the reference never tuned this
    unused model), so build the map with known poses first, then verify
    scan matching localizes against it."""
    poses, ranges = log
    cfg = SlamConfig(
        map=MapConfig(resolution=0.05, size_x=256, size_y=256, levels=2),
        update=UpdateConfig(cell_model="simple_count"),
        max_beams=384, max_ray_cells=256)
    state = init_state(cfg)
    assert float(state.log_odds[0][0, 0]) == 0.5
    for r, p in zip(ranges, poses):
        sc = scan_from_ranges(r, cfg.map.level_scale(0), LASER,
                              cfg.max_beams)
        state, _ = slam_step_jit(state, sc, cfg, pose_hint=jnp.asarray(p),
                                 map_without_matching=True)
    lo = np.asarray(state.log_odds[0])
    assert (lo > 0.5).sum() > 50 and (lo < 0.5).sum() > 1000
    # localization: perturbed start must converge to the true pose
    from hector_slam_tpu.core.matcher import match_pyramid
    start = poses[5] + np.asarray([0.05, -0.04, 0.03], np.float32)
    sc = scan_from_ranges(ranges[5], cfg.map.level_scale(0), LASER,
                          cfg.max_beams)
    res = match_pyramid(state.log_odds, jnp.asarray(start), sc, cfg)
    err = np.linalg.norm(np.asarray(res.pose)[:2] - poses[5][:2])
    assert err < 0.02, err


def test_sigma_point_covariance(log):
    poses, ranges = log
    sess = SlamSession(CFG, LASER, map_with_known_poses=True)
    for r, p in zip(ranges, poses):
        sess.process_ranges(r, pose_hint=p)
    from hector_slam_tpu.core.grid import world_to_map_pose
    pm = world_to_map_pose(jnp.asarray(poses[5]), CFG.map.top_left_offset,
                           CFG.map.level_scale(0))
    sc = scan_from_ranges(ranges[5], CFG.map.level_scale(0), LASER,
                          CFG.max_beams)
    cov = np.asarray(sigma_point_covariance_jit(
        sess.state.log_odds[0], pm, sc))
    assert cov.shape == (3, 3)
    np.testing.assert_allclose(cov, cov.T, atol=1e-5)
    assert np.all(np.diag(cov) >= 0)
    lh = float(likelihood_for_state(sess.state.log_odds[0], pm, sc))
    assert 0.0 < lh <= 1.0
    v = float(interp_map_value(sess.state.log_odds[0],
                               pm[:2][None] * 0 + 128.0)[0])
    assert 0.0 <= v <= 1.0


def test_config_presets():
    assert HEIGHT_MAPPING_CONFIG.map_update_distance_thresh == 0.0
    assert SINGLE_MAP_CONFIG.map.levels == 1
    assert SINGLE_MAP_CONFIG.match.iterations_finest == 20


def test_map_to_odom_transform():
    """map->odom = T(pose) * T(odom->base)^-1 (HectorMappingRos.cpp:372):
    composing it back with odom->base recovers the slam pose."""
    from hector_slam_tpu.core.pose2d import map_to_odom_transform
    rng = np.random.default_rng(4)
    for _ in range(10):
        pose = rng.uniform(-3, 3, 3)
        odom = rng.uniform(-3, 3, 3)
        m2o = map_to_odom_transform(pose, odom)
        # compose m2o * odom->base
        c, s = np.cos(m2o[2]), np.sin(m2o[2])
        x = m2o[0] + c * odom[0] - s * odom[1]
        y = m2o[1] + s * odom[0] + c * odom[1]
        th = m2o[2] + odom[2]
        np.testing.assert_allclose([x, y, th], pose, atol=1e-5)


def test_session_save_geotiff(tmp_path):
    """syscommand 'savegeotiff' parity through the session facade."""
    from hector_slam_tpu.config import MapConfig, SlamConfig
    from hector_slam_tpu.session import SlamSession
    from hector_slam_tpu.io.scanlog import LaserModel
    from hector_slam_tpu.io.simulator import (World, corridor_trajectory,
                                              simulate_trajectory)
    import os
    cfg = SlamConfig(map=MapConfig(resolution=0.1, size_x=128, size_y=128,
                                   levels=2), max_beams=128,
                     max_ray_cells=64)
    laser = LaserModel(num_beams=91, angle_min=-1.57,
                       angle_increment=0.0349, range_min=0.1,
                       range_max=5.0)
    sess = SlamSession(cfg, laser)
    world = World.room(size=5.0)
    poses = corridor_trajectory(3, advance=0.05, weave=0.0)
    for r in simulate_trajectory(world, poses, laser):
        sess.process_ranges(r)
    png, tfw = sess.save_geotiff(str(tmp_path / "session_map"))
    assert os.path.exists(png) and os.path.exists(tfw)


def test_phases_timing_mode_identical_results():
    """timing_mode='phases' splits match/update into two device programs
    for per-phase timing (SURVEY.md §5) and must produce the same
    trajectory as the single-program step."""
    from hector_slam_tpu.config import MapConfig, SlamConfig
    from hector_slam_tpu.session import SlamSession
    from hector_slam_tpu.io.scanlog import LaserModel
    from hector_slam_tpu.io.simulator import (World, corridor_trajectory,
                                              simulate_trajectory)
    cfg = SlamConfig(map=MapConfig(resolution=0.1, size_x=128, size_y=128,
                                   levels=2), max_beams=128,
                     max_ray_cells=64)
    laser = LaserModel(num_beams=91, angle_min=-1.57,
                       angle_increment=0.0349, range_min=0.1,
                       range_max=5.0)
    world = World.room(size=5.0)
    poses = corridor_trajectory(5, advance=0.05, weave=0.0)
    ranges = simulate_trajectory(world, poses, laser)

    s1 = SlamSession(cfg, laser)
    s2 = SlamSession(cfg, laser, timing_mode="phases")
    p1 = [s1.process_ranges(r) for r in ranges]
    p2 = [s2.process_ranges(r) for r in ranges]
    # same ops in two programs: identical up to FMA-contraction ulps
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=1e-5, atol=1e-5)
    st = s2.timing_stats()
    assert st["count"] == 5
    for k in ("match_p50_ms", "update_p50_ms", "match_mean_ms",
              "update_mean_ms"):
        assert k in st and st[k] >= 0.0
    assert "match_p50_ms" not in s1.timing_stats()

    import pytest
    with pytest.raises(ValueError):
        SlamSession(cfg, laser, timing_mode="bogus")


def test_relocalize_recovers_kidnapped_robot():
    """Round-2 VERDICT next-step #4: kidnap the robot mid-log; one
    relocalize() call must recover the pose within a scan."""
    from hector_slam_tpu.config import MapConfig, SlamConfig
    from hector_slam_tpu.session import SlamSession
    from hector_slam_tpu.io.scanlog import LaserModel
    from hector_slam_tpu.io.simulator import (World, corridor_trajectory,
                                              simulate_trajectory)
    cfg = SlamConfig(map=MapConfig(resolution=0.05, size_x=256, size_y=256,
                                   levels=2), max_beams=192,
                     max_ray_cells=256)
    laser = LaserModel(num_beams=181, angle_min=-1.57,
                       angle_increment=np.pi / 180, range_min=0.1,
                       range_max=8.0)
    sess = SlamSession(cfg, laser)
    world = World.corridor(length=10.0, width=3.0)
    poses_true = corridor_trajectory(20, advance=0.05, weave=0.02)
    ranges = simulate_trajectory(world, poses_true, laser,
                                 range_noise_std=0.003)
    for r in ranges:
        sess.process_ranges(r)
    good_pose = sess.pose.copy()

    # kidnap: teleport the believed pose well outside GN's basin
    sess.state = sess.state._replace(
        pose=jnp.asarray(good_pose + np.asarray([0.6, -0.5, 0.25],
                                                np.float32)))
    out = sess.relocalize(n_hypotheses=256, sigma_xy=0.6, sigma_theta=0.3,
                          seed=3, use_pallas=False)
    assert out["accepted"]
    err = np.linalg.norm(out["pose"][:2] - good_pose[:2])
    assert err < 0.1, (err, out)
    assert abs(float(out["pose"][2] - good_pose[2])) < 0.05
    # the next scan must keep tracking from the recovered pose
    p_next = sess.process_ranges(ranges[-1])
    assert np.linalg.norm(p_next[:2] - good_pose[:2]) < 0.1

    # no scan processed yet -> clear error
    fresh = SlamSession(cfg, laser)
    import pytest
    with pytest.raises(ValueError):
        fresh.relocalize()


def _kidnap_session(seed_shift=(0.6, -0.5, 0.25)):
    """Shared fixture builder: a tracked corridor session whose believed
    pose is then teleported outside GN's basin."""
    cfg = SlamConfig(map=MapConfig(resolution=0.05, size_x=256, size_y=256,
                                   levels=2), max_beams=192,
                     max_ray_cells=256)
    laser = LaserModel(num_beams=181, angle_min=-1.57,
                       angle_increment=np.pi / 180, range_min=0.1,
                       range_max=8.0)
    sess = SlamSession(cfg, laser)
    world = World.corridor(length=10.0, width=3.0)
    poses_true = corridor_trajectory(20, advance=0.05, weave=0.02)
    ranges = simulate_trajectory(world, poses_true, laser,
                                 range_noise_std=0.003)
    for r in ranges:
        sess.process_ranges(r)
    good = sess.pose.copy()
    sess.state = sess.state._replace(
        pose=jnp.asarray(good + np.asarray(seed_shift, np.float32)))
    return sess, good


@pytest.mark.parametrize("method,kwargs", [
    ("pallas", {"pallas_interpret": True}),
    ("mxu", {}),
])
def test_relocalize_production_methods(method, kwargs):
    """Round-3 VERDICT #4/#9: the kidnap recovery must work through the
    PRODUCTION batched matchers — the Pallas VMEM path (exact branch the
    TPU runs, via Mosaic interpret mode) and the MXU path with
    auto_num_buckets wiring — not just the quad-gather fallback."""
    sess, good = _kidnap_session()
    out = sess.relocalize(n_hypotheses=256, sigma_xy=0.6, sigma_theta=0.3,
                          seed=3, method=method, **kwargs)
    assert out["accepted"]
    err = np.linalg.norm(out["pose"][:2] - good[:2])
    assert err < 0.1, (err, out)
    assert abs(float(out["pose"][2] - good[2])) < 0.05
    assert 0.0 <= out["fast_path_fraction"] <= 1.0
    assert out["overflow_steps"] >= 0


def test_relocalize_strict_accept_keeps_pose():
    """Round-3 ADVICE #2: no strict improvement -> accepted False, pose
    AND covariance untouched. n_hypotheses=1 makes the incumbent the only
    competitor, so res[best] == res[0] by construction."""
    sess, _ = _kidnap_session(seed_shift=(0.0, 0.0, 0.0))
    pose_before = sess.pose.copy()
    cov_before = sess.covariance.copy()
    out = sess.relocalize(n_hypotheses=1, method="quad")
    assert not out["accepted"]
    assert out["improvement"] == 0.0
    np.testing.assert_array_equal(sess.pose, pose_before)
    np.testing.assert_array_equal(sess.covariance, cov_before)

    with pytest.raises(ValueError):
        sess.relocalize(method="bogus")


def test_relocalize_coarse_pruning_recovers():
    """Round-5 (VERDICT #1): at n >= 512 relocalize auto-prunes by
    coarsest-level residual and refines only the survivors — the kidnap
    recovery must still succeed, the incumbent must still be the
    acceptance bar, and an explicit prune_top_k=0 (no pruning) must find
    an equally good pose."""
    sess, good = _kidnap_session()
    out = sess.relocalize(n_hypotheses=512, sigma_xy=0.6, sigma_theta=0.3,
                          seed=3, method="quad")   # auto-prune kicks in
    assert out["accepted"]
    err = np.linalg.norm(out["pose"][:2] - good[:2])
    assert err < 0.1, (err, out)

    sess2, _ = _kidnap_session()
    out2 = sess2.relocalize(n_hypotheses=512, sigma_xy=0.6,
                            sigma_theta=0.3, seed=3, method="quad",
                            prune_top_k=0)
    # pruning may drop redundant challengers but not recovery quality
    assert out2["accepted"]
    assert abs(out["residual"] - out2["residual"]) < 0.1 * max(
        out2["residual"], 1.0), (out["residual"], out2["residual"])

    from hector_slam_tpu.parallel.recovery import auto_prune_top_k
    assert auto_prune_top_k(256) == 0
    assert auto_prune_top_k(512) == 128
    assert auto_prune_top_k(1024) == 256
    assert auto_prune_top_k(4096) == 1024


def test_relocalize_cascade_pallas_interpret():
    """The wide-spread pallas path is prune -> CASCADE (coarse-only
    refine, one-chunk re-selection, fine refine — parallel/recovery.py):
    n=1024 auto-prunes to 256 survivors (> the 128 mid-selection, so
    both cascade stages execute), through the exact production branch in
    Mosaic interpret mode. Recovery must match the quad path's bar."""
    sess, good = _kidnap_session()
    out = sess.relocalize(n_hypotheses=1024, sigma_xy=0.6,
                          sigma_theta=0.3, seed=3, method="pallas",
                          pallas_interpret=True)
    assert out["accepted"], out
    err = np.linalg.norm(out["pose"][:2] - good[:2])
    assert err < 0.1, (err, out)
    assert abs(float(out["pose"][2] - good[2])) < 0.05
    assert 0.0 <= out["fast_path_fraction"] <= 1.0


def test_slam_cloud(log):
    """slam_cloud product (HectorMappingRos.cpp:193,276-278): base frame
    = the container's points in meters; map frame = those transformed by
    the matched pose."""
    poses, ranges = log
    sess = SlamSession(CFG, LASER)
    with pytest.raises(ValueError):
        sess.slam_cloud()
    for t, r in enumerate(ranges):
        sess.process_ranges(r, stamp=t * 0.025)

    cloud_b = sess.slam_cloud(frame="base")
    scan = sess._last_scan
    keep = np.asarray(scan.mask, bool)
    expect_b = np.asarray(scan.points)[keep] / CFG.map.level_scale(0)
    np.testing.assert_allclose(cloud_b, expect_b, atol=1e-6)
    assert len(cloud_b) > 100

    cloud_m = sess.slam_cloud(frame="map")
    pose = sess.pose
    c, s = np.cos(pose[2]), np.sin(pose[2])
    expect_m = np.c_[pose[0] + c * expect_b[:, 0] - s * expect_b[:, 1],
                     pose[1] + s * expect_b[:, 0] + c * expect_b[:, 1]]
    np.testing.assert_allclose(cloud_m, expect_m, atol=1e-5)
    # corridor walls at y = +-1.5 m: map-frame cloud must hug them
    wall = np.abs(np.abs(cloud_m[:, 1]) - 1.5) < 0.2
    assert wall.mean() > 0.5, wall.mean()

    with pytest.raises(ValueError):
        sess.slam_cloud(frame="laser0")


def test_scanmatch_odom(log):
    """scanmatch_odom product (HectorMappingRos.cpp:93,124,351-356)."""
    _, ranges = log
    sess = SlamSession(CFG, LASER)
    for t, r in enumerate(ranges):
        sess.process_ranges(r, stamp=1000.0 + t * 0.025)
    odom = sess.scanmatch_odom()
    assert odom["frame_id"] == "map"
    assert odom["child_frame_id"] == "base_link"
    assert odom["stamp"] == 1000.0 + (len(ranges) - 1) * 0.025
    np.testing.assert_allclose(odom["position"][:2], sess.pose[:2],
                               atol=1e-6)
    assert odom["covariance"].shape == (6, 6)
    # reference leaves twist unset -> zeros
    np.testing.assert_array_equal(odom["twist"], np.zeros(6))


def test_odom_start_estimate(log):
    """pose_hint_from_odom math + the process_scan(odom_pose=) path
    (use_tf_pose_start_estimate, HectorMappingRos.cpp:291-309)."""
    poses, ranges = log
    sess = SlamSession(CFG, LASER)
    # no previous odometry -> None (reference tf-exception fallback)
    assert sess.pose_hint_from_odom([0.0, 0.0, 0.0]) is None
    # delta composition: +0.1 m odom-x at believed yaw pi/2 -> +0.1 world-y
    sess.state = sess.state._replace(
        pose=jnp.asarray([1.0, 2.0, np.pi / 2], jnp.float32))
    hint = sess.pose_hint_from_odom([0.1, 0.0, 0.0])
    np.testing.assert_allclose(hint, [1.0, 2.1, np.pi / 2], atol=1e-5)

    # end-to-end: noise-free odometry equal to ground truth keeps the
    # engine tracking (hint = truth-propagated start estimate)
    sess2 = SlamSession(CFG, LASER)
    for p, r in zip(poses, ranges):
        sess2.process_ranges(r, odom_pose=p)
    err = np.linalg.norm(sess2.pose[:2] - poses[len(ranges) - 1][:2])
    assert err < 0.12, err


def test_reflectance_slam_end_to_end(log):
    """Round-3 VERDICT weak #7: the 2-channel reflectance storage must
    flow through slam_step/update_pyramid end to end, not just the golden
    unit test. Mirrors the simple-count e2e: map with known poses, then
    localize a perturbed start against the built map."""
    poses, ranges = log
    cfg = SlamConfig(
        map=MapConfig(resolution=0.05, size_x=256, size_y=256, levels=2),
        update=UpdateConfig(cell_model="reflectance"),
        max_beams=384, max_ray_cells=256)
    state = init_state(cfg)
    assert state.log_odds[0].shape == (2, 256, 256)   # [visited, reflected]
    for r, p in zip(ranges, poses):
        sc = scan_from_ranges(r, cfg.map.level_scale(0), LASER,
                              cfg.max_beams)
        state, m = slam_step_jit(state, sc, cfg, pose_hint=jnp.asarray(p),
                                 map_without_matching=True)
    prob = np.asarray(reflectance_prob_grid(state.log_odds[0]))
    # occupancy classification: walls reflected, corridor interior free
    assert (prob > 0.5).sum() > 50, (prob > 0.5).sum()
    assert (prob < 0.5).sum() > 1000, (prob < 0.5).sum()
    from hector_slam_tpu.core.matcher import match_pyramid
    start = poses[5] + np.asarray([0.05, -0.04, 0.03], np.float32)
    sc = scan_from_ranges(ranges[5], cfg.map.level_scale(0), LASER,
                          cfg.max_beams)
    res = match_pyramid(state.log_odds, jnp.asarray(start), sc, cfg)
    err = np.linalg.norm(np.asarray(res.pose)[:2] - poses[5][:2])
    assert err < 0.02, err


def test_geotiff_autosave(log, tmp_path):
    """Periodic geotiff autosave (geotiff_node.cpp:79-86 timer): saves
    every period seconds of scan-stamp time, overwriting one base name;
    first save one period after the first scan."""
    import os
    _, ranges = log
    base = str(tmp_path / "automap")
    sess = SlamSession(CFG, LASER, geotiff_save_period=0.1,
                       geotiff_base_path=base)
    # scans at 25 ms: saves expected at stamps >= 0.1 and >= 0.2...
    for t, r in enumerate(ranges):
        sess.process_ranges(r, stamp=t * 0.025)
    assert os.path.exists(base + ".png") and os.path.exists(base + ".tfw")
    # disabled by default: no files
    sess2 = SlamSession(CFG, LASER)
    for t, r in enumerate(ranges[:3]):
        sess2.process_ranges(r, stamp=t * 0.025)
    assert not os.path.exists("GeoTiffMap.png")


def test_relocalize_auto_method():
    """Auto method: pallas on TPU, quad elsewhere (measured round 4:
    routing by spread buys nothing — at kidnap-scale spreads the pallas
    driver with its exact fallback still edges the MXU matcher)."""
    sess, _ = _kidnap_session()
    # CPU backend here -> auto resolves to quad (fraction None)
    out = sess.relocalize(n_hypotheses=128, seed=1)
    assert out["fast_path_fraction"] is None


def test_launch_variant_presets():
    """Launch-variant preset parity (hector_slam_launch/launch/*): engine
    parameters mirrored exactly; each preset builds a valid engine."""
    from hector_slam_tpu.config import (CITYFLYER_LOG_CONFIG,
                                        MAPPING_BOX_CONFIG, PR2_CONFIG,
                                        TUTORIAL_CONFIG, UGV_CONFIG)
    c = CITYFLYER_LOG_CONFIG
    assert c.map.size_x == 2048 and c.map.levels == 3
    assert c.map.start_coords == (0.75, 0.25)
    assert c.update.update_factor_occupied == 0.95
    assert c.map_update_distance_thresh == 0.3
    assert c.map_update_angle_thresh == 0.03
    assert MAPPING_BOX_CONFIG.map.levels == 3
    assert MAPPING_BOX_CONFIG.map_update_angle_thresh == 0.06
    assert UGV_CONFIG.map.levels == 1
    assert UGV_CONFIG.update.update_factor_free == 0.3
    assert PR2_CONFIG is TUTORIAL_CONFIG
    # every preset initializes (off-center start shifts the world offset)
    st = init_state(UGV_CONFIG)
    assert len(st.log_odds) == 1
    off = CITYFLYER_LOG_CONFIG.map.top_left_offset
    assert abs(off[0] - 0.05 * 2048 * 0.75) < 1e-9
    assert abs(off[1] - 0.05 * 2048 * 0.25) < 1e-9


def test_relocalize_global_simple_count_cell_model():
    """Round-5 review regression: free-cell sampling must classify with
    the session's OWN cell model. With cell_model="simple_count" the
    storage holds probabilities (free in (0, 0.5)); the former
    log-odds-threshold classification saw zero free cells and raised on
    a perfectly well-mapped session."""
    cfg = SlamConfig(
        map=MapConfig(resolution=0.05, size_x=256, size_y=256, levels=2),
        max_beams=192, max_ray_cells=256,
        update=UpdateConfig(cell_model="simple_count"))
    laser = LaserModel(num_beams=181, angle_min=-1.57,
                       angle_increment=np.pi / 180, range_min=0.1,
                       range_max=8.0)
    sess = SlamSession(cfg, laser)
    world = World.corridor(length=10.0, width=3.0)
    poses_true = corridor_trajectory(15, advance=0.05, weave=0.02)
    for r in simulate_trajectory(world, poses_true, laser,
                                 range_noise_std=0.003):
        sess.process_ranges(r)
    out = sess.relocalize_global(n_positions=256, n_theta=8, top_k=128,
                                 method="quad", seed=1)
    assert out["n_free_cells"] > 50, out
    assert np.isfinite(out["residual"])
