"""On-device validation of the Pallas VMEM matcher (round-3 VERDICT #2).

Runs the Mosaic-COMPILED kernel (interpret=False) on the attached TPU at
a small shape and at the bench shape, asserts its numerics against the
exact quad-gather path and a float64 oracle of the cited reference
formulas (OccGridMapUtil.h:64-104, :287-347) — the same bar the
interpret-mode CPU tests apply — and writes a JSON artifact
(PALLAS_TPU_VALIDATION.json) recording shapes, errors, fast-path
engagement and honestly-timed per-GN-iteration cost.

Timing uses the chained-scan protocol (see PERF.md): K iterations inside
one jitted lax.scan with per-iteration-varying poses, scalar fetch,
two chain lengths differenced to cancel the ~22 ms tunnel RTT.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/verify_pallas_tpu.py
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from hector_slam_tpu.core.interp import hessian_derivs_quad, quad_pack
from hector_slam_tpu.ops.pallas_interp import (_transform_batch,
                                               interp_moments_pallas,
                                               repair_moments)
from hector_slam_tpu.parallel.pallas_match import (gn_step_pallas,
                                                   match_hypotheses_pallas_jit)


def oracle_f64(grid_np, poses_np, pts_np, mask_np, txty=None):
    """getCompleteHessianDerivs in float64 (mirrors tests/test_pallas_match).

    ``txty`` pins the cell choice to the product's own f32 transform so
    only interp/accumulation accuracy is measured (boundary queries can
    floor to a different cell under a f64 transform)."""
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


def validate_shape(name, H, W, B, N, s_per, seed=0, time_it=False):
    rng = np.random.default_rng(seed)
    grid_np = rng.random((H, W)).astype(np.float32)
    grid = jnp.asarray(grid_np)
    quad = quad_pack(grid)
    ang = np.linspace(-2.35, 2.35, N)
    r = 0.35 * min(H, W) + 5 * np.sin(5 * ang)
    pts_np = np.c_[r * np.cos(ang), r * np.sin(ang)].astype(np.float32)
    mask_np = np.r_[np.ones(N - 4, bool), np.zeros(4, bool)]
    poses_np = np.c_[
        H / 2 + rng.normal(0, 1.0, (B, 2)),
        np.sort(rng.normal(0, 0.02, B))].astype(np.float32)
    poses = jnp.asarray(poses_np)
    pts = jnp.asarray(pts_np)
    mask = jnp.asarray(mask_np)

    # 1. compiled kernel moments + granular repair vs f64 oracle and quad
    mom = interp_moments_pallas(grid, (H, W), poses, pts, mask,
                                s_per=s_per, interpret=False)
    hk, dk, n_bad, ovf = repair_moments(quad, (H, W), poses, pts, mask,
                                        mom.hess, mom.dtr, 32768, s_per,
                                        24, 256)
    jax.block_until_ready(hk)
    assert not bool(ovf), "budget overflow at validation spread"

    f = jax.jit(jax.vmap(
        lambda p: hessian_derivs_quad(quad, (H, W), p, pts, mask)))
    hq, dq = f(poses)

    txty = _transform_batch(poses, pts)
    ho, do = oracle_f64(grid_np, poses_np, pts_np, mask_np, txty=txty)
    h_scale = np.abs(ho).max()
    d_scale = np.abs(do).max()
    err_k = float(np.abs(np.asarray(hk) - ho).max() / h_scale)
    err_q = float(np.abs(np.asarray(hq) - ho).max() / h_scale)
    errd_k = float(np.abs(np.asarray(dk) - do).max() / d_scale)
    errd_q = float(np.abs(np.asarray(dq) - do).max() / d_scale)
    assert err_k < 1e-4 and errd_k < 1e-4, (err_k, errd_k)
    assert err_k <= 2 * err_q + 1e-6, (err_k, err_q)
    assert errd_k <= 2 * errd_q + 1e-6, (errd_k, errd_q)

    # 2. one compiled GN step vs the quad-gather GN step
    est_p, hess_p, diag = jax.jit(
        lambda e: gn_step_pallas(grid, quad, (H, W), e, pts, mask,
                                 s_per=s_per, interpret=False))(poses)
    from hector_slam_tpu.parallel.pallas_match import _gn_step_quad
    est_q, hess_q = jax.jit(
        lambda e: _gn_step_quad(quad, (H, W), e, pts, mask))(poses)
    step_err = float(np.abs(np.asarray(est_p) - np.asarray(est_q)).max())
    assert step_err < 1e-3, step_err

    out = {
        "shape": [H, W], "hypotheses": B, "beams": N, "s_per": s_per,
        "window_overflow_queries": int(n_bad),
        "fast_path_fraction": float(diag.fast_path_fraction()),
        "max_rel_err_hess_kernel_vs_f64": err_k,
        "max_rel_err_hess_quad_vs_f64": err_q,
        "max_rel_err_dtr_kernel_vs_f64": errd_k,
        "max_rel_err_dtr_quad_vs_f64": errd_q,
        "gn_step_pose_diff_vs_quad": step_err,
    }

    if time_it:
        def make_chain(k):
            @jax.jit
            def chain(p):
                def body(carry, i):
                    est = p.at[:, 0].add(1e-6 * carry)
                    est, hh, _ = gn_step_pallas(
                        grid, quad, (H, W), est, pts, mask,
                        s_per=s_per, interpret=False)
                    return jnp.sum(est) * 1e-9 + carry * 0, ()
                c, _ = jax.lax.scan(body, jnp.float32(0.), jnp.arange(k))
                return c
            return lambda: float(chain(poses))
        per = []
        for _ in range(2):
            t = {}
            for k in (4, 16):
                fn = make_chain(k)
                fn()
                t0 = time.perf_counter()
                fn()
                t[k] = time.perf_counter() - t0
            per.append((t[16] - t[4]) / 12)
        out["gn_step_ms"] = round(min(per) * 1e3, 3)
        out["ns_per_query"] = round(min(per) / (B * N) * 1e9, 3)
    print(f"[{name}] OK:", json.dumps(out))
    return out


def validate_pyramid():
    """Full pyramid driver at the bench config, compiled — pallas vs the
    quad driver on diff quantiles and best-residual quality (max pose
    diff is NOT asserted: non-converged GN trajectories are chaotic).
    Returns the results dict; raises AssertionError on failure."""
    from hector_slam_tpu.config import BENCH_CONFIG
    from hector_slam_tpu.parallel.batch import match_hypotheses_jit
    from hector_slam_tpu.types import Scan
    rng = np.random.default_rng(1)
    cfg = BENCH_CONFIG
    pyr = []
    for i in range(3):
        n = 1024 >> i
        g = np.zeros((n, n), np.float32)
        yy, xx = np.mgrid[0:n, 0:n]
        rr = np.sqrt((xx - n / 2) ** 2 + (yy - n / 2) ** 2)
        g[(rr > 180 / 2 ** i) & (rr < 183 / 2 ** i)] = 2.0
        pyr.append(jnp.asarray(g))
    pyr = tuple(pyr)
    N = cfg.max_beams
    ang = np.linspace(-2.35, 2.35, N).astype(np.float32)
    pts = (np.stack([np.cos(ang), np.sin(ang)], -1)
           * (180.0 + rng.uniform(-1, 1, (N, 1)))).astype(np.float32)
    scan = Scan(points=jnp.asarray(pts), origo=jnp.zeros(2, jnp.float32),
                mask=jnp.ones(N, bool))
    B = 512
    hyp = jnp.asarray(rng.normal(0, .05, (B, 3)), jnp.float32)
    res_p, diag = match_hypotheses_pallas_jit(pyr, hyp, scan, cfg)
    res_q = match_hypotheses_jit(pyr, hyp, scan, cfg)
    diffs = np.abs(np.asarray(res_p.pose) - np.asarray(res_q.pose)).max(-1)
    # GN trajectories of NON-converged hypotheses are chaotic: a 1-ulp
    # FMA/cell difference between two separately compiled programs can
    # grow visibly over 14 steps for iterates bouncing on the sharp ring.
    # The meaningful contract for multi-hypothesis use is (a) the bulk of
    # hypotheses land on the same poses and (b) the best residual found
    # is equally good — that is what relocalize() consumes.
    from hector_slam_tpu.parallel.batch import residual_for_poses
    r_p = np.asarray(residual_for_poses(pyr[0], res_p.pose, scan, cfg))
    r_q = np.asarray(residual_for_poses(pyr[0], res_q.pose, scan, cfg))
    out = {
        "hypotheses": B,
        "pose_diff_vs_quad_p50": float(np.percentile(diffs, 50)),
        "pose_diff_vs_quad_p90": float(np.percentile(diffs, 90)),
        "pose_diff_vs_quad_max": float(diffs.max()),
        "best_residual_pallas": float(r_p.min()),
        "best_residual_quad": float(r_q.min()),
        "fast_path_fraction": float(diag.fast_path_fraction()),
        "overflow_steps": int(diag.overflow_steps),
    }
    assert np.percentile(diffs, 90) < 2e-3, out
    assert abs(r_p.min() - r_q.min()) < 0.05 * max(r_q.min(), 1.0), out
    print("[pyramid] OK:", json.dumps(out))
    return out


def main():
    dev = jax.devices()[0]
    print("device:", dev)
    results = {"device": str(dev), "interpret": False}
    results["small"] = validate_shape("small 256^2", 256, 256, 256, 128,
                                      s_per=128)
    results["bench"] = validate_shape("bench 1024^2", 1024, 1024, 4096,
                                      1152, s_per=512, time_it=True)
    results["pyramid"] = validate_pyramid()

    with open("PALLAS_TPU_VALIDATION.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote PALLAS_TPU_VALIDATION.json")


if __name__ == "__main__":
    main()
