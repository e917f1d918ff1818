"""Cross-validation: native C oracle vs NumPy oracle vs JAX engine.

The native oracle reproduces the reference's serial f32 order exactly, so
- NumPy oracle must match it almost bit-exactly on interp (same formulas,
  scalar order) and very tightly on accumulations,
- the JAX engine must match within documented reduction-order tolerance,
- trajectory-level: full-log runs must track each other."""

import numpy as np
import jax.numpy as jnp
import pytest

from hector_slam_tpu.core.interp import interp_with_derivatives, hessian_derivs
from hector_slam_tpu.native.ref_oracle import ref_hessian, ref_interp, ref_run
from hector_slam_tpu.oracle import oracle_np as on


def test_native_builds_and_interp_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    lo = rng.normal(0, 2, (32, 32)).astype(np.float32)
    coords = rng.uniform(-1, 33, (500, 2)).astype(np.float32)

    m = on.OracleMap(32, 32, 1.0, (0.0, 0.0))
    m.log_odds[:] = lo
    want = np.stack([m.interp_with_derivatives(c) for c in coords])
    got = ref_interp(lo, coords)
    # identical scalar formula chains; only exp/sin implementations may
    # differ by an ulp
    np.testing.assert_allclose(got, want, atol=5e-7)


def test_native_hessian_vs_numpy_and_jax():
    rng = np.random.default_rng(1)
    lo = rng.normal(0, 2, (32, 32)).astype(np.float32)
    pts = rng.uniform(-8, 8, (200, 2)).astype(np.float32)
    pose = np.array([16.0, 15.0, 0.3], np.float32)

    H_c, d_c = ref_hessian(lo, pose, pts)

    m = on.OracleMap(32, 32, 1.0, (0.0, 0.0))
    m.log_odds[:] = lo
    H_np, d_np = m.complete_hessian_derivs(pose, pts)
    # same serial accumulation order -> near bit-identical
    np.testing.assert_allclose(H_np, H_c, rtol=1e-6, atol=2e-5)
    np.testing.assert_allclose(d_np, d_c, rtol=1e-6, atol=2e-5)

    H_j, d_j = hessian_derivs(jnp.asarray(lo), jnp.asarray(pose),
                              jnp.asarray(pts), jnp.ones(len(pts), bool))
    # tree-reduction vs serial: documented tolerance
    np.testing.assert_allclose(np.asarray(H_j), H_c, rtol=1e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(d_j), d_c, rtol=1e-3, atol=2e-2)


def test_native_full_run_matches_numpy_oracle_trajectory():
    """20-scan corridor: native vs NumPy oracle processors must agree to
    f32-ulp level (same serial semantics)."""
    from hector_slam_tpu.io.scanlog import LaserModel, scan_from_ranges
    from hector_slam_tpu.io.simulator import (World, corridor_trajectory,
                                              simulate_trajectory)
    laser = LaserModel(num_beams=181, angle_min=-1.5707964,
                       angle_increment=0.017453293, range_min=0.1,
                       range_max=10.0)
    world = World.corridor(length=8.0, width=3.0)
    poses = corridor_trajectory(20, advance=0.06, weave=0.04)
    ranges = simulate_trajectory(world, poses, laser)
    res, size = 0.05, 256
    scale = float(np.float32(1.0) / np.float32(res))

    scans = [scan_from_ranges(r, scale, laser, 256) for r in ranges]
    pts = np.stack([np.asarray(s.points) for s in scans])
    mask = np.stack([np.asarray(s.mask) for s in scans])

    c_poses, c_H, c_upd, c_map = ref_run(
        pts, mask, np.zeros(2, np.float32), res, size, size, 2)

    proc = on.OracleProcessor(resolution=res, size_x=size, size_y=size,
                              levels=2)
    np_poses = []
    np_upd = []
    for t in range(len(scans)):
        before = proc.last_map_update_pose.copy()
        p = proc.update(pts[t][mask[t]], np.zeros(2, np.float32),
                        proc.last_scan_match_pose)
        np_poses.append(p.copy())
        np_upd.append(
            not np.array_equal(before, proc.last_map_update_pose))
    np_poses = np.asarray(np_poses)

    assert list(c_upd) == np_upd
    np.testing.assert_allclose(c_poses, np_poses, atol=2e-4)
    # final maps agree cell-for-cell (discrete decisions identical)
    mismatch = np.mean(c_map != proc.map_rep.maps[0].log_odds)
    assert mismatch < 0.001, mismatch


def test_native_known_poses_mode():
    """map_without_matching: hints accepted verbatim, updates forced."""
    rng = np.random.default_rng(2)
    T, N = 5, 64
    pts = rng.uniform(-40, 40, (T, N, 2)).astype(np.float32)
    mask = np.ones((T, N), bool)
    hints = rng.uniform(-1, 1, (T, 3)).astype(np.float32)
    poses, H, upd, _ = ref_run(pts, mask, np.zeros(2, np.float32),
                               0.05, 128, 128, 1, pose_hints=hints,
                               known_poses=True, want_map=False)
    np.testing.assert_array_equal(poses, hints)
    assert upd.all()
