"""Scaling-efficiency harness (BASELINE config 5): fleet SLAM steps/s at
mesh sizes 1, 2, ..., N over whatever devices are available.

On a TPU pod slice run it as-is; without one, simulate N virtual CPU
devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/bench_scaling.py --robots-per-device 4 --cpu

Prints one JSON line per mesh size:
    {"devices": n, "robots": R, "steps_per_s": v, "efficiency": e}
``efficiency`` is (throughput_n / throughput_1) / n — the weak-scaling
efficiency with robots proportional to devices (per-device maps stay in
per-device HBM; no cross-device traffic on the robot axis).

Timing uses the chained-in-jit methodology (see bench.py): K steps inside
one lax.scan with the state threaded through, scalar fetched, two chain
lengths differenced to cancel dispatch overhead.

NOTE: virtual CPU devices all share the same physical cores, so
efficiency numbers there only validate that the sharded program runs —
weak-scaling efficiency is only meaningful on real multi-chip hardware
where each mesh device brings its own compute + HBM.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--robots-per-device", type=int, default=4)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (virtual devices)")
    parser.add_argument("--size", type=int, default=256,
                        help="map size per robot (cells)")
    args = parser.parse_args()

    import os

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # multi-host pod slice (PERF.md "Scaling runbook"): when a
    # coordinator is configured, stitch the per-host processes into one
    # global device list before any backend use
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")))
    import jax.numpy as jnp

    from hector_slam_tpu.config import MapConfig, SlamConfig
    from hector_slam_tpu.io.scanlog import LaserModel, scan_from_ranges, \
        stack_scans
    from hector_slam_tpu.io.simulator import World, raycast
    from hector_slam_tpu.parallel.batch import init_fleet
    from hector_slam_tpu.parallel.sharded import (make_fleet_step, make_mesh,
                                                  shard_fleet_state,
                                                  shard_scan)

    cfg = SlamConfig(
        map=MapConfig(resolution=0.05, size_x=args.size, size_y=args.size,
                      levels=2),
        max_beams=1152, max_ray_cells=max(64, args.size // 2),
    )
    laser = LaserModel()
    world = World.room(size=min(10.0, args.size * 0.05 * 0.4))

    n_total = len(jax.devices())
    sizes = sorted({1, 2, n_total} & set(range(1, n_total + 1)))
    base = None
    for n in sizes:
        mesh = make_mesh(n, robot_axis=n)  # pure robot-axis DP
        R = args.robots_per_device * n
        scans = stack_scans([
            scan_from_ranges(
                raycast(world, np.zeros(3), laser), cfg.map.level_scale(0),
                laser, cfg.max_beams)
            for _ in range(R)])
        fleet = shard_fleet_state(init_fleet(cfg, R), mesh, cfg)
        scans = shard_scan(scans, mesh)
        step = make_fleet_step(mesh, cfg)

        def run(k, fleet):
            f = fleet
            for _ in range(k):
                f, metrics = step(f, scans)
            return float(jnp.sum(f.pose)), f

        times = {}
        fleet_w = fleet
        _, fleet_w = run(2, fleet_w)    # compile + warm (donates fleet_w)
        for k in (4, 12):
            t0 = time.perf_counter()
            _, fleet_w = run(k, fleet_w)
            times[k] = time.perf_counter() - t0
        per_step = (times[12] - times[4]) / 8
        steps_per_s = R / per_step   # robot-steps per second
        if base is None:
            base = steps_per_s
        print(json.dumps({
            "devices": n, "robots": R,
            "steps_per_s": round(steps_per_s, 1),
            "efficiency": round(steps_per_s / (base * n), 3),
        }))


if __name__ == "__main__":
    main()
