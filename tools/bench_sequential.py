"""Sequential per-scan device cost (BASELINE configs 1-3) with the
round-4 Pallas raster backend vs the XLA scatter path.

Measures, with the honest chained protocol (K slam steps inside one
lax.scan, state threaded through, scalar fetched, two chain lengths
differenced):
  - full slam_step with the map update forced ON every step
    (map_without_matching-style worst case = the known-poses /
    height-mapping rate ceiling), per raster backend;
  - match-only step (gate closed) for reference.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_sequential.py [--res 0.05]
"""
import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=float, default=0.05)
    args = ap.parse_args()

    from hector_slam_tpu.config import MapConfig, SlamConfig
    from hector_slam_tpu.core.mapping import update_pyramid
    from hector_slam_tpu.core.matcher import match_pyramid
    from hector_slam_tpu.core.slam import init_state, slam_step_jit
    from hector_slam_tpu.io.scanlog import LaserModel, scan_from_ranges
    from hector_slam_tpu.io.simulator import (World, corridor_trajectory,
                                              simulate_trajectory)

    cfg = SlamConfig(
        map=MapConfig(resolution=args.res, size_x=1024, size_y=1024,
                      levels=3),
        max_ray_cells=0)   # auto cap
    laser = LaserModel()
    world = World.corridor(length=18.0, width=3.0)
    poses = corridor_trajectory(10, advance=0.1, weave=0.02)
    ranges = simulate_trajectory(world, poses, laser, range_noise_std=0.005)
    scans = [scan_from_ranges(r, cfg.map.level_scale(0), laser,
                              cfg.max_beams) for r in ranges]
    state = init_state(cfg)
    for sc, p in zip(scans, poses):
        state, _ = slam_step_jit(state, sc, cfg, pose_hint=jnp.asarray(p),
                                 map_without_matching=True)
    sc = scans[-1]
    pose = jnp.asarray(poses[-1], jnp.float32)

    def chain_time(body_fn):
        def make(k):
            @jax.jit
            def chain(p):
                def body(carry, i):
                    return body_fn(p + 1e-6 * carry) * 1e-9 + carry * 0, ()
                c, _ = jax.lax.scan(body, jnp.float32(0.), jnp.arange(k))
                return c
            return lambda: float(chain(pose))
        per = []
        for _ in range(2):
            t = {}
            for k in (4, 16):
                f = make(k)
                f()
                t0 = time.perf_counter()
                f()
                t[k] = time.perf_counter() - t0
            per.append((t[16] - t[4]) / 12)
        return min(per) * 1e3

    results = {"config": f"1024^2 @ {args.res} m, 3 levels, "
                         f"K={cfg.level_max_ray_cells(0)}"}

    def match_body(p):
        res = match_pyramid(state.log_odds, p, sc, cfg)
        return jnp.sum(res.pose)
    results["match_ms"] = round(chain_time(match_body), 3)

    for backend in ("xla", "seg"):
        def upd_body(p, b=backend):
            pyr, t = update_pyramid(state.log_odds, p, sc, cfg,
                                    raster_backend=b)
            return jnp.sum(pyr[0]) * 1e-6 + t.astype(jnp.float32)
        results[f"update_{backend}_ms"] = round(chain_time(upd_body), 3)

    # correctness of the COMPILED kernel on this chip: cell sets equal
    p1, t1 = jax.jit(lambda p: update_pyramid(
        state.log_odds, p, sc, cfg, raster_backend="xla"))(pose)
    p2, t2 = jax.jit(lambda p: update_pyramid(
        state.log_odds, p, sc, cfg, raster_backend="seg"))(pose)
    equal = all(bool(jnp.array_equal(a, b)) for a, b in zip(p1, p2))
    results["compiled_cell_sets_equal"] = equal
    assert equal, "seg raster diverges from dense scatter when compiled!"

    results["speedup_update"] = round(
        results["update_xla_ms"] / results["update_seg_ms"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
