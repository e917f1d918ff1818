"""Gauss-Newton matcher vs oracle: single steps, the +1 iteration count,
dtheta clamp, guard, pyramid chain (ScanMatcher.h, MapRepMultiMap.h)."""

import numpy as np
import jax.numpy as jnp

from hector_slam_tpu.config import MapConfig, SlamConfig
from hector_slam_tpu.core.interp import quad_pack_storage
from hector_slam_tpu.core.matcher import gn_step, match_level, match_pyramid


def _quad(lo):
    arr = jnp.asarray(lo)
    return quad_pack_storage(arr, "log_odds"), arr.shape
from hector_slam_tpu.ops.solve3 import solve3, det3
from hector_slam_tpu.oracle import oracle_np as on
from hector_slam_tpu.types import Scan


def _world_with_wall(size=64, res=0.1):
    """An oracle map with a painted wall + matching raw array."""
    off = (res * size * 0.5, res * size * 0.5)
    m = on.OracleMap(size, size, res, off)
    # vertical wall at x=44..45, plus a horizontal one for observability
    m.log_odds[10:54, 44] = 2.0
    m.log_odds[12, 10:50] = 2.0
    return m, off


def _scan_hitting_wall(m, pose_true, n=80):
    """Synthesize beam endpoints on the painted walls in map-scale units
    relative to the true pose."""
    ys = np.linspace(12.0, 52.0, n // 2)
    wall1 = np.stack([np.full_like(ys, 44.0), ys], -1)
    xs = np.linspace(11.0, 49.0, n - n // 2)
    wall2 = np.stack([xs, np.full_like(xs, 12.0)], -1)
    pts_map = np.concatenate([wall1, wall2]).astype(np.float32)
    # back to robot frame of pose_true (map coords)
    pm = m.world_to_map_pose(pose_true)
    c, s = np.cos(pm[2]), np.sin(pm[2])
    rel = pts_map - pm[:2]
    pts = np.stack([c * rel[:, 0] + s * rel[:, 1],
                    -s * rel[:, 0] + c * rel[:, 1]], -1).astype(np.float32)
    return pts


def test_solve3_matches_oracle_inv():
    rng = np.random.default_rng(0)
    for _ in range(20):
        A = rng.normal(0, 1, (3, 3)).astype(np.float32)
        H = A @ A.T + np.eye(3, dtype=np.float32)
        b = rng.normal(0, 1, 3).astype(np.float32)
        got = np.asarray(solve3(jnp.asarray(H), jnp.asarray(b)))
        want = on.inv3_f32(H) @ b
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(float(det3(jnp.asarray(H))),
                                   float(np.linalg.det(H.astype(np.float64))),
                                   rtol=1e-4)


def test_gn_step_matches_oracle():
    m, off = _world_with_wall()
    pose_true = np.array([0.3, -0.2, 0.15], np.float32)
    pts = _scan_hitting_wall(m, pose_true)
    est_map = m.world_to_map_pose(pose_true + np.array([0.08, -0.05, 0.04],
                                                       np.float32))
    want_est, want_H = on.gn_step(m, est_map, pts)
    got_est, got_H = gn_step(*_quad(m.log_odds), jnp.asarray(est_map),
                             jnp.asarray(pts), jnp.ones(len(pts), bool))
    np.testing.assert_allclose(np.asarray(got_H), want_H, rtol=5e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(got_est), want_est, rtol=1e-4,
                               atol=2e-4)


def test_gn_guard_zero_hessian():
    """Empty/far map -> H diagonal zero -> estimate unchanged
    (ScanMatcher.h:201)."""
    lo = jnp.zeros((32, 32), jnp.float32)
    est = jnp.asarray([16.0, 16.0, 0.0], jnp.float32)
    pts = jnp.asarray(np.random.default_rng(0).uniform(-5, 5, (20, 2)),
                      jnp.float32)
    new_est, H = gn_step(*_quad(lo), est, pts, jnp.ones(20, bool))
    np.testing.assert_array_equal(np.asarray(new_est), np.asarray(est))
    assert np.isfinite(np.asarray(new_est)).all()
    assert (np.asarray(H) == 0.0).all()


def test_dtheta_clamp():
    """Construct a step whose raw dtheta exceeds 0.2: the applied change
    must be exactly +-0.2 (ScanMatcher.h:209-215). Use a synthetic H/dTr
    through the same code path by monkeypatching is overkill — instead
    verify via the oracle on a rotationally aggressive scan and assert the
    two implementations agree on the clamped step."""
    m, off = _world_with_wall()
    pose_true = np.array([0.0, 0.0, 0.0], np.float32)
    pts = _scan_hitting_wall(m, pose_true)
    # a large angular offset start
    est_map = m.world_to_map_pose(np.array([0.0, 0.0, 0.8], np.float32))
    want_est, _ = on.gn_step(m, est_map, pts)
    got_est, _ = gn_step(*_quad(m.log_odds), jnp.asarray(est_map),
                         jnp.asarray(pts), jnp.ones(len(pts), bool))
    np.testing.assert_allclose(np.asarray(got_est), want_est, atol=2e-3)


def test_match_level_matches_oracle():
    m, off = _world_with_wall()
    pose_true = np.array([0.25, -0.15, 0.1], np.float32)
    pts = _scan_hitting_wall(m, pose_true)
    begin_world = pose_true + np.array([0.06, 0.04, -0.05], np.float32)
    want_pose, want_H = on.match_data(m, begin_world, pts, 5)
    got_pose, got_H = match_level(
        *_quad(m.log_odds), jnp.asarray(begin_world), jnp.asarray(pts),
        jnp.ones(len(pts), bool), 5, off, 10.0, 0.1)
    np.testing.assert_allclose(np.asarray(got_pose), want_pose, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_H), want_H, rtol=2e-3, atol=5e-2)
    # and the matcher actually converged toward the truth
    assert np.linalg.norm(np.asarray(got_pose)[:2] - pose_true[:2]) < \
        np.linalg.norm(begin_world[:2] - pose_true[:2])


def test_match_level_empty_scan_returns_input():
    lo = jnp.zeros((32, 32), jnp.float32)
    begin = jnp.asarray([1.0, 2.0, 3.0], jnp.float32)
    pose, H = match_level(*_quad(lo), begin, jnp.zeros((16, 2), jnp.float32),
                          jnp.zeros(16, bool), 5, (1.6, 1.6), 10.0, 0.1)
    np.testing.assert_array_equal(np.asarray(pose), np.asarray(begin))
    assert (np.asarray(H) == 0.0).all()


def test_match_pyramid_matches_oracle():
    """Full coarse->fine chain vs OracleMultiMap on identical pyramids."""
    size, res = 64, 0.1
    mm = on.OracleMultiMap(res, size, size, 3)
    rng = np.random.default_rng(5)
    # paint identical structure in all oracle levels (independent maps)
    for lvl, m in enumerate(mm.maps):
        f = 2 ** lvl
        m.log_odds[10 // f + 1:54 // f, 44 // f] = 2.0
        m.log_odds[12 // f, 10 // f + 1:50 // f] = 2.0

    pose_true = np.array([0.3, -0.1, 0.05], np.float32)
    pts = _scan_hitting_wall(mm.maps[0], pose_true)
    begin = pose_true + np.array([0.07, -0.06, 0.06], np.float32)
    want_pose, want_H = mm.match_data(begin, pts)

    cfg = SlamConfig(map=MapConfig(resolution=res, size_x=size, size_y=size,
                                   levels=3), max_ray_cells=128)
    n_pad = 128
    padded = np.zeros((n_pad, 2), np.float32)
    padded[: len(pts)] = pts
    mask = np.zeros(n_pad, bool)
    mask[: len(pts)] = True
    scan = Scan(points=jnp.asarray(padded), origo=jnp.zeros(2, jnp.float32),
                mask=jnp.asarray(mask))
    pyramid = tuple(jnp.asarray(m.log_odds) for m in mm.maps)
    result = match_pyramid(pyramid, jnp.asarray(begin), scan, cfg)
    np.testing.assert_allclose(np.asarray(result.pose), want_pose, atol=1e-3)
    np.testing.assert_allclose(np.asarray(result.hessian), want_H,
                               rtol=5e-3, atol=0.1)
