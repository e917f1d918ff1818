"""On-TPU whole-log replay of the committed 435-scan UTM-30LX fixture:
accuracy (pose RMSE vs the CPU-f32 replay that is itself pinned to the
compiled reference) and honest per-scan device time with the round-4
segment-compacted update backend. Writes REPLAY_TPU.json.

Timing: run_log_jit is already one lax.scan over the log; timing two
different log lengths and differencing cancels the fixed dispatch/fetch
RTT, and every iteration consumes a different scan (nothing cacheable).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_replay_tpu.py
"""
import json
import os
import time

import numpy as np
import jax

from hector_slam_tpu.config import BENCH_CONFIG
from hector_slam_tpu.core.slam import init_state, run_log_jit
from hector_slam_tpu.io.scanlog import load_log, scan_from_ranges, stack_scans

FIXTURE = os.path.join(os.path.dirname(__file__), "..", "tests",
                       "fixtures", "corridor_utm30lx.npz")


def main():
    ranges, laser, poses_true = load_log(FIXTURE)
    cfg = BENCH_CONFIG
    scale = cfg.map.level_scale(0)
    scans = [scan_from_ranges(r, scale, laser, cfg.max_beams)
             for r in ranges]
    stacked = stack_scans(scans)
    n = len(ranges)

    t0 = time.time()
    state, poses_tpu, metrics = run_log_jit(init_state(cfg), stacked, cfg)
    jax.block_until_ready(poses_tpu)
    wall_full = time.time() - t0
    updates = int(np.asarray(metrics.map_updated).sum())

    # accuracy vs ground truth (open-loop drift; CPU replay measured
    # 0.290 m RMSE — the TPU replay must match that behavior)
    p = np.asarray(poses_tpu)
    drift = float(np.sqrt(np.mean(
        (p[:, :2] - np.asarray(poses_true)[:, :2]) ** 2)))

    # honest per-scan time: difference two log lengths (fresh states)
    half = stack_scans(scans[: n // 2])
    times = {}
    for name, log in (("half", half), ("full", stacked)):
        f = jax.jit(lambda st, lg: run_log_jit(st, lg, cfg)[1])
        f(init_state(cfg), log).block_until_ready()   # compile+warm
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            f(init_state(cfg), log).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        times[name] = best
    per_scan_ms = (times["full"] - times["half"]) / (n - n // 2) * 1e3

    out = {
        "device": str(jax.devices()[0]),
        "scans": n,
        "beams": int(stacked.points.shape[1]),
        "config": "1024^2 @ 0.05 m, 3 levels (BASELINE config 3)",
        "map_updates": updates,
        "drift_rmse_vs_ground_truth_m": round(drift, 4),
        "per_scan_device_ms": round(per_scan_ms, 3),
        "scan_rate_hz": round(1e3 / per_scan_ms, 1),
        "first_run_wall_s": round(wall_full, 1),
    }
    print(json.dumps(out))
    assert drift < 0.35, out   # CPU replay: 0.290 m open-loop drift
    assert updates > 50, out
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "REPLAY_TPU.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote REPLAY_TPU.json")


if __name__ == "__main__":
    main()
