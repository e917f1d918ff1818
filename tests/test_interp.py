"""Unit tests: bilinear interpolation + quirk gradients vs the NumPy oracle
and hand-computed golden values (OccGridMapUtil.h:287-347)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hector_slam_tpu.core.interp import interp_with_derivatives, hessian_derivs
from hector_slam_tpu.oracle.oracle_np import OracleMap


def make_map(seed=0, size=32):
    m = OracleMap(size, size, 0.1, (1.6, 1.6))
    rng = np.random.default_rng(seed)
    m.log_odds[:] = rng.normal(0.0, 2.0, m.log_odds.shape).astype(np.float32)
    return m


def test_golden_handcomputed_gradient_quirk():
    """On a grid where only P10 = (y=0,x=1) is occupied, at coords
    (0.25, 0.75): p00=p01=p11=0.5, p10=sigmoid(2).
    dx1 = 0.5-p10, dx2 = 0, dy1 = 0, dy2 = p10-0.5.
    quirk: gx = -(dx1*(1-fx) + dx2*fx), gy = -(dy1*(1-fy) + dy2*fy)."""
    lo = np.zeros((4, 4), np.float32)
    lo[0, 1] = 2.0
    p10 = np.float32(np.exp(2.0) / (np.exp(2.0) + 1.0))
    fx, fy = np.float32(0.25), np.float32(0.75)
    v, gx, gy = interp_with_derivatives(
        jnp.asarray(lo), jnp.asarray([[0.25, 0.75]], np.float32))
    expected_v = (0.5 * (1 - fx) + p10 * fx) * (1 - fy) + 0.5 * fy
    expected_gx = -((0.5 - p10) * (1 - fx) + 0.0 * fx)
    expected_gy = -(0.0 * (1 - fy) + (p10 - 0.5) * fy)
    np.testing.assert_allclose(float(v[0]), expected_v, rtol=1e-6)
    np.testing.assert_allclose(float(gx[0]), expected_gx, rtol=1e-6)
    np.testing.assert_allclose(float(gy[0]), expected_gy, rtol=1e-6)


def test_interp_matches_oracle_random():
    m = make_map()
    rng = np.random.default_rng(1)
    coords = rng.uniform(-1.0, 33.0, (500, 2)).astype(np.float32)
    got = np.stack(interp_with_derivatives(
        jnp.asarray(m.log_odds), jnp.asarray(coords)), axis=-1)
    want = np.stack([m.interp_with_derivatives(c) for c in coords])
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_bounds_rule_size_minus_2():
    """pointOutOfMapBounds rejects coords > size-2 strictly
    (MapDimensionProperties.h:65-73): 30.0 is in bounds on a 32-grid,
    30.0001 is not."""
    m = make_map()
    lo = jnp.asarray(m.log_odds)
    v_in, _, _ = interp_with_derivatives(
        lo, jnp.asarray([[30.0, 10.0]], np.float32))
    v_out, gx_out, gy_out = interp_with_derivatives(
        lo, jnp.asarray([[30.0001, 10.0]], np.float32))
    assert float(v_in[0]) != 0.0
    assert float(v_out[0]) == 0.0 and float(gx_out[0]) == 0.0 \
        and float(gy_out[0]) == 0.0
    # negative side
    v_neg = interp_with_derivatives(
        lo, jnp.asarray([[-0.0001, 10.0]], np.float32))[0]
    assert float(v_neg[0]) == 0.0


def test_hessian_matches_oracle():
    m = make_map(seed=3)
    rng = np.random.default_rng(4)
    pts = rng.uniform(-8.0, 8.0, (200, 2)).astype(np.float32)
    pose_map = np.array([16.0, 15.0, 0.3], np.float32)
    H_want, dTr_want = m.complete_hessian_derivs(pose_map, pts)
    H_got, dTr_got = hessian_derivs(
        jnp.asarray(m.log_odds), jnp.asarray(pose_map), jnp.asarray(pts),
        jnp.ones(len(pts), bool))
    # Tolerance note: the C++/oracle accumulates serially in f32 while the
    # TPU path reduces as a matmul tree; on cancellation-heavy off-diagonal
    # sums (~200 terms of O(1) with alternating sign) the ordering alone
    # produces O(sum|terms| * N * eps) ~ 3e-3 absolute differences
    # (SURVEY.md §7 "Hard parts"). Verified: both agree with a float64
    # serial reference to ~1e-4.
    np.testing.assert_allclose(np.asarray(H_got), H_want, rtol=1e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(dTr_got), dTr_want, rtol=1e-3,
                               atol=2e-2)


def test_hessian_mask_equals_dropping_points():
    """Padded beams must contribute exactly zero."""
    m = make_map(seed=5)
    rng = np.random.default_rng(6)
    pts = rng.uniform(-8.0, 8.0, (64, 2)).astype(np.float32)
    mask = np.zeros(64, bool)
    mask[:40] = True
    pose = jnp.asarray([14.0, 17.0, -0.7], jnp.float32)
    lo = jnp.asarray(m.log_odds)
    H_a, d_a = hessian_derivs(lo, pose, jnp.asarray(pts), jnp.asarray(mask))
    H_b, d_b = hessian_derivs(lo, pose, jnp.asarray(pts[:40]),
                              jnp.ones(40, bool))
    np.testing.assert_allclose(np.asarray(H_a), np.asarray(H_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_a), np.asarray(d_b), atol=1e-5)


def test_quad_path_bitwise_equal_to_four_gathers():
    """interp_quad over a quad-packed grid must be bit-identical to the
    4-gather path (same f32 values, same math)."""
    from hector_slam_tpu.core.interp import (hessian_derivs_quad,
                                             interp_quad, quad_pack_storage)
    rng = np.random.default_rng(7)
    lo = jnp.asarray(rng.normal(0, 1.5, (48, 40)), jnp.float32)
    coords = jnp.asarray(
        np.stack([rng.uniform(-2, 42, 300), rng.uniform(-2, 50, 300)], -1),
        jnp.float32)
    want = np.stack(interp_with_derivatives(lo, coords))
    quad = quad_pack_storage(lo, "log_odds")
    got = np.stack(interp_quad(quad, lo.shape, coords))
    np.testing.assert_array_equal(got, want)

    pose = jnp.asarray([20.0, 18.0, 0.3], jnp.float32)
    pts = jnp.asarray(rng.uniform(-15, 15, (64, 2)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=64) > 0.2)
    H_a, d_a = hessian_derivs(lo, pose, pts, mask)
    H_b, d_b = hessian_derivs_quad(quad, lo.shape, pose, pts, mask)
    np.testing.assert_array_equal(np.asarray(H_a), np.asarray(H_b))
    np.testing.assert_array_equal(np.asarray(d_a), np.asarray(d_b))
