"""Benchmark: batched scan-matches/s/chip (BASELINE.json config 4 shape).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The workload: 4096 perturbed start poses per batch, each running the full
3-level coarse-to-fine Gauss-Newton pyramid (6+4+4 = 14 GN iterations,
1081-beam scans padded to 1152) against a 1024^2 @ 0.05 m map built from
simulated UTM-30LX data, via the Pallas VMEM matcher
(parallel/pallas_match.py — the grid stays resident in VMEM and the
bilinear fetch is an in-register lane shuffle; granular quad-gather
repair for window-overflow queries). The theta-bucketed one-hot MXU
matcher (parallel/onehot_match.py) is the documented fallback; run with
HECTOR_BENCH_MATCHER=mxu to measure it.
``vs_baseline`` is the honest headline: the ratio to BASELINE.json's
>=10,000 matches/s/chip target for this exact workload. The reference's
only published capability — sequential matching at the sensor's 40 Hz
scan rate (hector_mapping/package.xml:7) — is reported as the secondary
``vs_sensor_rate_40hz`` field.

Timing methodology (important on remote/tunneled TPU backends): repeated
dispatches of an identical executable+arguments can be served from a
result cache and ``block_until_ready`` may not reflect device completion,
so naive rep loops over-report wildly. Instead the batch is re-run K times
INSIDE one jitted ``lax.scan`` with per-iteration-varying hypothesis
perturbations (nothing can be hoisted or cached), a scalar is fetched to
force completion, and the fixed fetch/dispatch overhead is cancelled by
differencing two chain lengths.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from hector_slam_tpu.config import BENCH_CONFIG
    from hector_slam_tpu.core.slam import init_state, slam_step_jit
    from hector_slam_tpu.io.scanlog import LaserModel, scan_from_ranges
    from hector_slam_tpu.io.simulator import (World, corridor_trajectory,
                                              simulate_trajectory)
    from hector_slam_tpu.parallel.onehot_match import match_hypotheses_mxu
    from hector_slam_tpu.parallel.pallas_match import match_hypotheses_pallas

    variant = os.environ.get("HECTOR_BENCH_MATCHER", "pallas")
    if variant == "pallas":
        def matcher(pyr, poses, sc, cfg):
            return match_hypotheses_pallas(pyr, poses, sc, cfg)[0]
    else:
        matcher = match_hypotheses_mxu

    cfg = BENCH_CONFIG
    laser = LaserModel()  # 1081-beam UTM-30LX
    world = World.corridor(length=18.0, width=3.0)
    poses_true = corridor_trajectory(10, advance=0.12, weave=0.03)
    ranges = simulate_trajectory(world, poses_true, laser,
                                 range_noise_std=0.005)
    scale = cfg.map.level_scale(0)
    scans = [scan_from_ranges(r, scale, laser, cfg.max_beams)
             for r in ranges]

    # build the map with known poses (map_without_matching mode)
    state = init_state(cfg)
    for sc, p in zip(scans, poses_true):
        state, _ = slam_step_jit(state, sc, cfg, pose_hint=jnp.asarray(p),
                                 map_without_matching=True)

    B = 4096
    rng = np.random.default_rng(0)
    base = jnp.asarray(poses_true[-1], jnp.float32)
    scan = scans[-1]

    def make_chain(k: int, match_fn):
        seeds = jnp.asarray(rng.normal(0, 0.05, (k, B, 3)), jnp.float32)

        @jax.jit
        def chain(pyramid, sc):
            def body(carry, seed):
                result = match_fn(
                    pyramid, base + seed + 0.0 * carry.sum(), sc, cfg)
                # nan_to_num: a degenerate hypothesis (nonzero-but-
                # singular H, exactly as the reference's guard allows,
                # ScanMatcher.h:201-205) yields a NaN pose; a NaN carry
                # would poison every later iteration's input through
                # `seed + 0*carry` and silently turn the chain into a
                # no-work NaN pipeline (measured: rates inflate 20x+)
                return jnp.nan_to_num(jnp.mean(result.pose, axis=0)), ()

            carry, _ = jax.lax.scan(body, jnp.zeros(3, jnp.float32), seeds)
            return jnp.sum(carry)

        return lambda: float(chain(state.log_odds, sc=scan))

    def measure(match_fn):
        k_short, k_long = 4, 16
        per_batch = []
        for _ in range(3):
            times = {}
            for k in (k_short, k_long):
                f = make_chain(k, match_fn)
                f()  # compile + warm
                t0 = time.perf_counter()
                f()
                times[k] = time.perf_counter() - t0
            per_batch.append((times[k_long] - times[k_short])
                             / (k_long - k_short))
        return min(per_batch)

    def transient(e: Exception) -> bool:
        # only the known transient failure modes of the remote Mosaic
        # compile service qualify for retry/fallback (round-4 ADVICE #3:
        # a genuine kernel bug must produce an error, not a silently
        # valid-looking MXU record)
        msg = f"{type(e).__name__}: {e}"
        # context-qualified patterns only: a bare "500" would match shape
        # or element counts in genuine kernel errors and silently mask
        # them behind the MXU fallback
        return any(s in msg for s in (
            "response body closed", "Socket closed", "HTTP 500",
            "status: 500", "Internal Server Error",
            "UNAVAILABLE", "DEADLINE_EXCEEDED", "RESOURCE_EXHAUSTED",
            "Connection reset", "transient"))

    try:
        dt = measure(matcher)
    except Exception as e:   # noqa: BLE001
        if not transient(e):
            raise
        import sys
        print(f"bench: {variant} matcher failed ({e!r:.200}), retrying",
              file=sys.stderr)
        try:
            dt = measure(matcher)
        except Exception as e2:   # noqa: BLE001
            if variant == "mxu" or not transient(e2):
                raise
            print("bench: falling back to the MXU matcher",
                  file=sys.stderr)
            variant = "mxu-fallback"
            dt = measure(match_hypotheses_mxu)

    matches_per_s = B / dt
    target_rate = 10000.0  # BASELINE.json: >=10k matches/s/chip
    sensor_rate = 40.0     # reference: 40 Hz sequential (package.xml:7)
    print(json.dumps({
        "metric": "batched_scan_matches_per_sec_per_chip",
        "value": round(matches_per_s, 1),
        "unit": "matches/s (1081-beam, 3-level pyramid, 1024^2 @ 0.05 m)",
        "vs_baseline": round(matches_per_s / target_rate, 2),
        "baseline": "BASELINE.json >=10k matches/s/chip target",
        "vs_sensor_rate_40hz": round(matches_per_s / sensor_rate, 1),
        "matcher": variant,
    }))


if __name__ == "__main__":
    main()
