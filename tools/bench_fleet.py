"""Single-chip fleet throughput (round-5, VERDICT #7): measured
robots x steps/s for `parallel.batch.fleet_step_jit` (R independent
robots, per-robot 1024^2 x 3-level map pyramids in HBM) — turns the
"128 robots/chip" HBM arithmetic in PERF.md into a measured number.

Protocol: chained-scan (K steps of the whole fleet inside one jitted
lax.scan over per-step-varying scans), scalar fetch, K=4 vs K=16
differenced, NaN-proofed carry. Per-robot scans differ (each robot gets
its own noise draw and pose offset along the corridor).

Writes FLEET_TPU.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_fleet.py [--robots 16,64,128]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main() -> None:
    from hector_slam_tpu.config import BENCH_CONFIG
    from hector_slam_tpu.io.scanlog import LaserModel, scan_from_ranges, stack_scans
    from hector_slam_tpu.io.simulator import (World, corridor_trajectory,
                                              simulate_trajectory)
    from hector_slam_tpu.parallel.batch import fleet_step, init_fleet
    from hector_slam_tpu.types import Scan

    ap = argparse.ArgumentParser()
    ap.add_argument("--robots", default="16,64,128")
    args = ap.parse_args()
    sizes = [int(s) for s in args.robots.split(",")]

    cfg = BENCH_CONFIG
    laser = LaserModel()
    world = World.corridor(length=18.0, width=3.0)
    scale = cfg.map.level_scale(0)

    rows = []
    for R in sizes:
        # per-robot trajectories: staggered corridor offsets
        poses = corridor_trajectory(20, advance=0.06, weave=0.03)
        scans_t = []
        for t in range(20):
            per_robot = []
            for r in range(R):
                p = poses[t] + np.asarray([0.02 * r, 0.0, 0.0], np.float32)
                rg = simulate_trajectory(world, p[None], laser,
                                         range_noise_std=0.005,
                                         seed=t * 1000 + r)[0]
                per_robot.append(scan_from_ranges(rg, scale, laser,
                                                  cfg.max_beams))
            scans_t.append(stack_scans(per_robot))
        # stack time axis: [T, R, ...]
        scans_stack = Scan(
            points=jnp.stack([s.points for s in scans_t]),
            origo=jnp.stack([s.origo for s in scans_t]),
            mask=jnp.stack([s.mask for s in scans_t]))

        fleet0 = init_fleet(cfg, R)

        def make_chain(k):
            @jax.jit
            def chain(fleet, salt):
                def body(carry, sc):
                    st, salt_c = carry
                    sc2 = Scan(points=sc.points + 0.0 * salt_c,
                               origo=sc.origo, mask=sc.mask)
                    st, metrics = fleet_step(st, sc2, cfg)
                    return (st, jnp.nan_to_num(
                        jnp.mean(st.pose)) * 0.0 + salt_c), ()
                (st, _), _ = jax.lax.scan(
                    body, (fleet, salt),
                    jax.tree.map(lambda x: x[:k], scans_stack))
                return jnp.sum(st.pose) + st.map_update_count.sum()
            return lambda i: float(chain(fleet0, jnp.float32(i) * 1e-9))

        fs = {k: make_chain(k) for k in (4, 16)}
        for f in fs.values():
            f(0)
        best = 1e9
        for i in range(1, 4):
            t = {}
            for k in (4, 16):
                t0 = time.perf_counter()
                fs[k](i * 3 + k)
                t[k] = time.perf_counter() - t0
            best = min(best, (t[16] - t[4]) / 12)
        row = {"robots": R, "ms_per_fleet_step": round(best * 1e3, 3),
               "robot_steps_per_sec": round(R / best, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {"config": "1024^2 @ 0.05 m, 3 levels, 1081-beam scans",
           "rows": rows}
    with open("FLEET_TPU.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote FLEET_TPU.json")


if __name__ == "__main__":
    main()
