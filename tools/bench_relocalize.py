"""Kidnap-scale relocalization throughput on the TPU (round-5 VERDICT
#1). Round 4 measured 9.8k matches/s at sigma 0.5 m / 0.3 rad, B=1024:
the initial spread geometrically overflows the VMEM matcher windows on
the fine levels and every GN step demotes to the exact quad fallback
(measured here: ~5.2 ms per demoted step at B=1024 — no ordering or
sampling trick fixes the geometry). Round 5's answer is COARSE PRUNING
(parallel/recovery.py): one cheap coarsest-level residual pass scores
all B hypotheses, and only the top-k clustered survivors run the full
GN pyramid — where the kernel stays engaged.

Measurement notes (hard-won):
  - chained-scan protocol with SALTED arguments (a fresh scalar per
    timed call) and K=16 vs K=64 differencing — short chains sit inside
    the tunnel's noise floor;
  - the chain carry is nan_to_num'd: degenerate hypotheses (singular H
    past the reference's guard) produce NaN poses, and a NaN carry
    poisons every later iteration's input into a no-work NaN pipeline
    that inflates rates 20x (this invalidated the first round-5
    numbers).

Writes RELOCALIZE_TPU.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_relocalize.py
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main() -> None:
    from hector_slam_tpu.config import BENCH_CONFIG
    from hector_slam_tpu.core.slam import init_state, slam_step_jit
    from hector_slam_tpu.io.scanlog import LaserModel, scan_from_ranges
    from hector_slam_tpu.io.simulator import (World, corridor_trajectory,
                                              simulate_trajectory)
    from hector_slam_tpu.parallel.pallas_match import match_hypotheses_pallas
    from hector_slam_tpu.parallel.recovery import (cascade_refine,
                                                   prune_hypotheses_coarse)

    cfg = BENCH_CONFIG
    laser = LaserModel()
    world = World.corridor(length=18.0, width=3.0)
    poses_true = corridor_trajectory(10, advance=0.12, weave=0.03)
    ranges = simulate_trajectory(world, poses_true, laser,
                                 range_noise_std=0.005)
    scale = cfg.map.level_scale(0)
    scans = [scan_from_ranges(r, scale, laser, cfg.max_beams)
             for r in ranges]
    state = init_state(cfg)
    for sc, p in zip(scans, poses_true):
        state, _ = slam_step_jit(state, sc, cfg, pose_hint=jnp.asarray(p),
                                 map_without_matching=True)

    B = 1024
    SIGMA_XY, SIGMA_TH = 0.5, 0.3
    K_BUDGET = 8192
    TOP_K = 256
    rng = np.random.default_rng(0)
    base = np.asarray(poses_true[-1], np.float32)
    scan = scans[-1]

    def stratified_batch():
        g = B // 128
        thetas = base[2] + SIGMA_TH * (-2.0 + 4.0 * (np.arange(g) + 0.5) / g)
        h = np.c_[base[0] + rng.normal(0, SIGMA_XY, B),
                  base[1] + rng.normal(0, SIGMA_XY, B),
                  np.repeat(thetas, 128)].astype(np.float32)
        h[0] = base
        return h

    def body_pruned(pyramid, hyp):
        # the relocalize(method="pallas") wide-spread path: group
        # pruning + cascaded coarse->select->fine refinement
        surv = prune_hypotheses_coarse(pyramid, hyp, scan, cfg, TOP_K,
                                       quads=state.quads)
        result, diag = cascade_refine(
            pyramid, surv, scan, cfg, k_budget=K_BUDGET,
            quads=state.quads)
        return result, diag

    def body_raw(pyramid, hyp):
        return match_hypotheses_pallas(pyramid, hyp, scan, cfg,
                                       k_budget=K_BUDGET,
                                       quads=state.quads)

    def measure(body_fn):
        def make_chain(k):
            batches = jnp.asarray(np.stack(
                [stratified_batch() for _ in range(k)]))

            @jax.jit
            def chain(pyramid, salt):
                def body(carry, hyp):
                    result, diag = body_fn(pyramid, hyp + salt + 0.0 * carry)
                    return (jnp.nan_to_num(jnp.mean(result.pose, axis=0)),
                            (diag.overflow_steps,
                             diag.fast_path_fraction()))
                carry, (ovf, frac) = jax.lax.scan(
                    body, jnp.zeros(3, jnp.float32), batches)
                return jnp.sum(carry), jnp.mean(frac), jnp.sum(ovf)

            def run(i):
                c, frac, ovf = chain(state.log_odds,
                                     jnp.float32(i) * 1e-6)
                return float(c), float(frac), int(ovf)
            return run

        fs = {k: make_chain(k) for k in (16, 64)}
        for f in fs.values():
            f(0)
        best, frac = 1e9, None
        for i in range(1, 4):
            t = {}
            for k in (16, 64):
                t0 = time.perf_counter()
                _, frac, _ = fs[k](i * 3 + k)
                t[k] = time.perf_counter() - t0
            best = min(best, (t[64] - t[16]) / 48)
        return B / best, frac

    rate_pruned, frac_pruned = measure(body_pruned)
    print(f"pruned (top-{TOP_K}): {rate_pruned:,.0f} matches/s, "
          f"fast-path frac {frac_pruned:.3f}", flush=True)
    rate_raw, frac_raw = measure(body_raw)
    print(f"raw B={B}:       {rate_raw:,.0f} matches/s, "
          f"fast-path frac {frac_raw:.3f}", flush=True)

    # the product API end-to-end (host round-trips included), and its
    # recovery correctness at this spread
    from hector_slam_tpu.session import SlamSession
    sess = SlamSession(cfg, laser)
    sess.state = state
    sess._last_scan = scan
    sess.state = sess.state._replace(
        pose=jnp.asarray(base + np.asarray([0.6, -0.5, 0.25], np.float32)))
    out = sess.relocalize(n_hypotheses=B, sigma_xy=SIGMA_XY,
                          sigma_theta=SIGMA_TH, seed=1, method="pallas")
    err = float(np.linalg.norm(out["pose"][:2] - base[:2]))
    rec = {
        "hypotheses": B, "sigma_xy": SIGMA_XY, "sigma_theta": SIGMA_TH,
        "k_budget": K_BUDGET, "prune_top_k": TOP_K,
        "matches_per_sec_pruned": round(rate_pruned, 1),
        "fast_path_fraction_pruned": round(frac_pruned, 4),
        "matches_per_sec_raw": round(rate_raw, 1),
        "fast_path_fraction_raw": round(frac_raw, 4),
        "round4_baseline_raw_iid": 9800.0,
        "session_accepted": out["accepted"],
        "session_recovered_err_m": round(err, 4),
        "session_fast_path_fraction": out["fast_path_fraction"],
    }
    print(json.dumps(rec))
    with open("RELOCALIZE_TPU.json", "w") as fh:
        json.dump(rec, fh, indent=1)
    print("wrote RELOCALIZE_TPU.json")


if __name__ == "__main__":
    main()
