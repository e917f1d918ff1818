"""Tests for the Pallas VMEM matcher kernel (ops/pallas_interp.py) and its
batched pyramid driver (parallel/pallas_match.py).

Strategy: the kernel runs in interpret mode on CPU. Exactness is pinned
against a float64 NumPy oracle of the cited reference formulas
(OccGridMapUtil.h:64-104, :287-347) — the kernel must be AT LEAST as
accurate as the exact-semantics quad-gather path (it is Kahan-compensated,
so normally better). Direct kernel-vs-quad comparisons use a tolerance
because the two XLA programs may contract the pose transform's
multiply-adds differently (FMA) — a 1-ulp difference in tx at coordinate
~1000 is ~1e-4 absolute, which can flip a boundary cell.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import hector_slam_tpu as hs
from hector_slam_tpu.types import Scan
from hector_slam_tpu.core.interp import hessian_derivs_quad, quad_pack
from hector_slam_tpu.ops.pallas_interp import (
    interp_moments_pallas, repair_moments)
from hector_slam_tpu.parallel.pallas_match import (
    MatchDiag, gn_step_pallas, match_hypotheses_pallas,
    pallas_level_supported)
from hector_slam_tpu.parallel.batch import match_hypotheses


H = W = 256


def _workload(rng, n=64, b=256, sigma_xy=1.0, sigma_t=0.02, theta=0.3):
    grid_np = rng.random((H, W)).astype(np.float32)
    grid = jnp.asarray(grid_np)
    quad = quad_pack(grid)
    ang = np.linspace(-2.0, 2.0, n)
    r = 60.0 + 10 * np.sin(5 * ang)
    pts_np = np.c_[r * np.cos(ang), r * np.sin(ang)].astype(np.float32)
    pts = jnp.asarray(pts_np)
    mask_np = np.r_[np.ones(n - 4, bool), np.zeros(4, bool)]
    mask = jnp.asarray(mask_np)
    base = np.array([128.0, 128.0, theta], np.float32)
    poses_np = (base + np.c_[rng.normal(0, sigma_xy, (b, 2)),
                             rng.normal(0, sigma_t, b)]).astype(np.float32)
    poses_np = poses_np[np.argsort(poses_np[:, 2])]
    return grid_np, grid, quad, pts_np, pts, mask_np, mask, poses_np


def _oracle_f64(grid_np, poses_np, pts_np, mask_np, txty=None):
    """getCompleteHessianDerivs in float64 (the cited formulas verbatim).

    ``txty``: optional f32 (tx, ty, sin, cos) from the product's own
    transform — using them pins the CELL CHOICE to the f32 program (a f64
    transform can floor to a different cell on boundary queries, which is
    a rounding-of-inputs artifact, not an accumulation error), so only
    interp/accumulation accuracy is measured."""
    g = grid_np.astype(np.float64)
    p = poses_np.astype(np.float64)
    pt = pts_np.astype(np.float64)
    h, w = g.shape
    if txty is None:
        s, c = np.sin(p[:, 2]), np.cos(p[:, 2])
        tx = c[:, None] * pt[None, :, 0] + (-s[:, None] * pt[None, :, 1]
                                            + p[:, 0:1])
        ty = s[:, None] * pt[None, :, 0] + (c[:, None] * pt[None, :, 1]
                                            + p[:, 1:2])
    else:
        tx, ty, s, c = [np.asarray(a, np.float64) for a in txty]
    inb = ((tx >= 0) & (tx <= w - 2) & (ty >= 0) & (ty <= h - 2)
           & mask_np[None, :])
    xi = np.clip(tx.astype(np.int64), 0, w - 2)
    yi = np.clip(ty.astype(np.int64), 0, h - 2)
    fx, fy = tx - xi, ty - yi
    p00, p10 = g[yi, xi], g[yi, xi + 1]
    p01, p11 = g[yi + 1, xi], g[yi + 1, xi + 1]
    xfi, yfi = 1 - fx, 1 - fy
    val = (p00 * xfi + p10 * fx) * yfi + (p01 * xfi + p11 * fx) * fy
    gx = -((p00 - p10) * xfi + (p01 - p11) * fx)
    gy = -((p00 - p01) * yfi + (p10 - p11) * fy)
    val, gx, gy = [np.where(inb, a, 0.0) for a in (val, gx, gy)]
    rot = ((-s[:, None] * pt[None, :, 0] - c[:, None] * pt[None, :, 1]) * gx
           + (c[:, None] * pt[None, :, 0] - s[:, None] * pt[None, :, 1]) * gy)
    jac = np.stack([gx, gy, rot], -1)
    hess = np.einsum("bnj,bnk->bjk", jac, jac)
    dtr = np.einsum("bnj,bn->bj", jac, 1 - val)
    return hess, dtr


def test_kernel_matches_f64_oracle_at_least_as_well_as_quad(rng):
    (grid_np, grid, quad, pts_np, pts,
     mask_np, mask, poses_np) = _workload(rng)
    poses = jnp.asarray(poses_np)

    mom = interp_moments_pallas(grid, (H, W), poses, pts, mask,
                                s_per=128, interpret=True)
    hk, dk, _, ovf = repair_moments(quad, (H, W), poses, pts, mask,
                                    mom.hess, mom.dtr, 4096, 128, 24, 256)
    assert not bool(ovf)

    f = jax.vmap(lambda p: hessian_derivs_quad(quad, (H, W), p, pts, mask))
    hq, dq = f(poses)

    ho, do = _oracle_f64(grid_np, poses_np, pts_np, mask_np)
    h_scale = np.abs(ho).max()
    d_scale = np.abs(do).max()
    err_k = np.abs(np.asarray(hk) - ho).max() / h_scale
    err_q = np.abs(np.asarray(hq) - ho).max() / h_scale
    errd_k = np.abs(np.asarray(dk) - do).max() / d_scale
    errd_q = np.abs(np.asarray(dq) - do).max() / d_scale
    # kernel is Kahan-compensated: must be at least as accurate (small
    # slack for per-query FMA-contraction differences between programs)
    assert err_k < 1e-4 and errd_k < 1e-4
    assert err_k <= 2 * err_q + 1e-6
    assert errd_k <= 2 * errd_q + 1e-6


def test_fast_path_fully_engaged_for_tight_spread(rng):
    _, grid, quad, _, pts, _, mask, poses_np = _workload(
        rng, sigma_xy=0.5, sigma_t=0.005)
    poses = jnp.asarray(poses_np)
    mom = interp_moments_pallas(grid, (H, W), poses, pts, mask,
                                s_per=128, interpret=True)
    assert int(mom.bad_count) == 0
    # every valid in-bounds query took the fast path
    diag = MatchDiag(jnp.int32(0), jnp.int32(0),
                     jnp.float32(poses.shape[0] * pts.shape[0]),
                     jnp.float32(0))
    assert float(diag.fast_path_fraction()) == 1.0


def test_granular_repair_fixes_window_overflow(rng):
    # wide xy spread: many queries overflow the 24-row windows
    (grid_np, grid, quad, pts_np, pts,
     mask_np, mask, poses_np) = _workload(rng, sigma_xy=12.0, sigma_t=0.05)
    poses = jnp.asarray(poses_np)
    mom = interp_moments_pallas(grid, (H, W), poses, pts, mask,
                                s_per=128, interpret=True)
    assert int(mom.bad_count) > 0, "workload must actually overflow"
    hk, dk, n_bad, ovf = repair_moments(
        quad, (H, W), poses, pts, mask, mom.hess, mom.dtr,
        k_budget=32768, s_per=128, wr=24, wc=256)
    assert int(n_bad) == int(mom.bad_count)
    assert not bool(ovf)

    from hector_slam_tpu.ops.pallas_interp import _transform_batch
    txty = _transform_batch(jnp.asarray(poses_np), pts)
    ho, do = _oracle_f64(grid_np, poses_np, pts_np, mask_np, txty=txty)
    err = np.abs(np.asarray(hk) - ho).max() / np.abs(ho).max()
    errd = np.abs(np.asarray(dk) - do).max() / np.abs(do).max()
    assert err < 1e-4 and errd < 1e-4


def test_budget_overflow_reports_and_full_fallback_is_exact(rng):
    _, grid, quad, _, pts, _, mask, poses_np = _workload(
        rng, sigma_xy=12.0, sigma_t=0.05)
    poses = jnp.asarray(poses_np)
    mom = interp_moments_pallas(grid, (H, W), poses, pts, mask,
                                s_per=128, interpret=True)
    n_bad_true = int(mom.bad_count)
    assert n_bad_true > 4
    _, _, n_bad, ovf = repair_moments(
        quad, (H, W), poses, pts, mask, mom.hess, mom.dtr,
        k_budget=4, s_per=128, wr=24, wc=256)
    assert bool(ovf) and int(n_bad) == n_bad_true

    # gn_step_pallas with an overflowing budget must route through the
    # full quad-gather fallback: identical to the explicit quad GN step
    est = poses
    new_est, hess, diag = gn_step_pallas(
        grid, quad, (H, W), est, pts, mask, s_per=128, k_budget=4,
        interpret=True)
    from hector_slam_tpu.parallel.pallas_match import _gn_step_quad
    exp_est, exp_hess = _gn_step_quad(quad, (H, W), est, pts, mask)
    # both run the same vmap(hessian_derivs_quad), but as two separately
    # compiled programs: FMA contraction of the pose transform may differ
    # by 1 ulp, flipping boundary cells — ulp-level pose tolerance, and
    # hessians equal up to one query's contribution
    np.testing.assert_allclose(np.asarray(new_est), np.asarray(exp_est),
                               rtol=1e-5, atol=1e-4)
    scale = np.abs(np.asarray(exp_hess)).max()
    assert np.abs(np.asarray(hess) - np.asarray(exp_hess)).max() < 1e-2 * scale
    assert int(diag.overflow_steps) == 1
    assert int(diag.repaired_queries) == 0
    # an overflow step must read as SLOW, not fast (round-3 ADVICE #1)
    assert float(diag.fast_path_fraction()) == 0.0


def test_match_hypotheses_pallas_vs_quad_driver(rng):
    """End-to-end pyramid match: the Pallas driver must land on the same
    poses as the vmap quad-gather driver (within GN-trajectory tolerance:
    per-iteration moments differ by f32 reduction order)."""
    cfg = hs.SlamConfig(
        map=hs.MapConfig(resolution=0.05, size_x=H, size_y=W, levels=2),
        max_ray_cells=256)
    state = hs.init_state(cfg)
    # build a map from a synthetic scan so matching has structure
    from hector_slam_tpu.io.scanlog import LaserModel, scan_from_ranges
    from hector_slam_tpu.io.simulator import World, simulate_trajectory
    laser = LaserModel(num_beams=181, angle_min=-1.57,
                       angle_increment=np.pi / 180, range_max=8.0)
    world = World.corridor(length=8.0, width=3.0)
    poses_true = np.zeros((8, 3), np.float32)
    poses_true[:, 0] = np.linspace(0, 0.4, 8)
    ranges = simulate_trajectory(world, poses_true, laser,
                                 range_noise_std=0.0)
    scans = [scan_from_ranges(r, 1 / cfg.map.resolution, laser,
                              cfg.max_beams) for r in ranges]
    for sc in scans:
        state, _ = hs.slam_step_jit(state, sc, cfg)

    rng2 = np.random.default_rng(7)
    b = 256
    hyp = (np.asarray(state.pose)
           + np.c_[rng2.normal(0, 0.03, (b, 2)),
                   rng2.normal(0, 0.02, b)]).astype(np.float32)
    hyp = jnp.asarray(hyp)
    sc = scans[-1]

    res_q = match_hypotheses(state.log_odds, hyp, sc, cfg)
    (res_p, diag) = match_hypotheses_pallas(
        state.log_odds, hyp, sc, cfg, s_per=128, interpret=True,
        quads=state.quads)
    err = np.abs(np.asarray(res_p.pose) - np.asarray(res_q.pose)).max()
    assert err < 2e-3, err
    assert int(diag.total_queries) > 0
    # level 1 (128x128) is statically unsupported (w < wc) and runs the
    # quad path — its 4 GN steps must COUNT AS SLOW, so the honest
    # fraction is the finest level's 6 steps out of 10 = 0.6 (minus any
    # repaired queries on the fast level)
    frac = float(diag.fast_path_fraction())
    assert 0.55 < frac <= 0.6 + 1e-6, frac


def test_unsupported_level_geometry_falls_back():
    # 100x100 grid breaks the 8/128 tiling rules -> static quad fallback
    assert not pallas_level_supported((100, 100))
    assert not pallas_level_supported((2048, 2048))   # > VMEM budget
    assert pallas_level_supported((1024, 1024))
    assert pallas_level_supported((256, 256))


def test_empty_scan_returns_input_pose(rng):
    cfg = hs.SlamConfig(
        map=hs.MapConfig(resolution=0.05, size_x=H, size_y=W, levels=2),
        max_ray_cells=256)
    state = hs.init_state(cfg)
    n = 64
    sc = Scan(points=jnp.zeros((n, 2), jnp.float32),
              origo=jnp.zeros(2, jnp.float32),
              mask=jnp.zeros(n, bool))
    hyp = jnp.asarray(rng.normal(0, 0.1, (128, 3)).astype(np.float32))
    res, _ = match_hypotheses_pallas(state.log_odds, hyp, sc, cfg,
                                     s_per=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(res.pose), np.asarray(hyp))


def test_hypothesis_padding(rng):
    """B not a multiple of 128 gets padded with pose copies and sliced
    back; results for the real hypotheses are unaffected."""
    _, grid, quad, _, pts, _, mask, poses_np = _workload(rng, b=256)
    cfg = hs.SlamConfig(
        map=hs.MapConfig(resolution=0.05, size_x=H, size_y=W, levels=1),
        max_ray_cells=256)
    lo = (jnp.zeros((H, W), jnp.float32),)
    sc = Scan(points=pts, origo=jnp.zeros(2, jnp.float32), mask=mask)
    hyp_all = jnp.asarray(poses_np[:200])   # not a multiple of 128
    res, _ = match_hypotheses_pallas(lo, hyp_all, sc, cfg,
                                     s_per=128, interpret=True)
    assert res.pose.shape == (200, 3)
