"""On-TPU compile + correctness + honest timing of the Pallas raster
kernel (ops/pallas_raster.py) vs the XLA scatter path, at the bench and
default map-update shapes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_raster_tpu.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from hector_slam_tpu.config import MapConfig, SlamConfig
from hector_slam_tpu.core.mapping import rasterize_scan, rasterize_scan_pallas
from hector_slam_tpu.io.scanlog import LaserModel, scan_from_ranges
from hector_slam_tpu.io.simulator import World, corridor_trajectory, \
    simulate_trajectory


def run_shape(name, resolution, k_cap):
    cfg = SlamConfig(map=MapConfig(resolution=resolution, size_x=1024,
                                   size_y=1024, levels=1),
                     max_ray_cells=k_cap)
    laser = LaserModel()
    world = World.corridor(length=18.0, width=3.0)
    poses = corridor_trajectory(3, advance=0.1, weave=0.02)
    ranges = simulate_trajectory(world, poses, laser,
                                 range_noise_std=0.005)
    sc = scan_from_ranges(ranges[-1], cfg.map.level_scale(0), laser,
                          cfg.max_beams)
    pose = jnp.asarray(poses[-1])
    shape = (1024, 1024)
    args = (shape, pose, sc.points, sc.origo, sc.mask,
            cfg.map.top_left_offset, cfg.map.level_scale(0), k_cap)

    t0 = time.time()
    f_x, o_x, t_x = jax.jit(
        lambda p: rasterize_scan(shape, p, sc.points, sc.origo, sc.mask,
                                 cfg.map.top_left_offset,
                                 cfg.map.level_scale(0), k_cap))(pose)
    jax.block_until_ready(f_x)
    print(f"[{name}] xla compiled+ran in {time.time()-t0:.1f}s")
    t0 = time.time()
    f_p, o_p, t_p = jax.jit(
        lambda p: rasterize_scan_pallas(
            shape, p, sc.points, sc.origo, sc.mask,
            cfg.map.top_left_offset, cfg.map.level_scale(0), k_cap))(pose)
    jax.block_until_ready(f_p)
    print(f"[{name}] pallas compiled+ran in {time.time()-t0:.1f}s")
    same_f = bool(jnp.array_equal(f_x, f_p))
    same_o = bool(jnp.array_equal(o_x, o_p))
    n_free = int(jnp.sum(f_x))
    print(f"[{name}] free cells: {n_free}, sets equal: free={same_f} "
          f"occ={same_o}")
    assert same_f and same_o

    # honest chained timing: pose perturbed per iteration
    def make_chain(fn, k):
        @jax.jit
        def chain(p):
            def body(carry, i):
                f, o, t = fn(shape, p + 1e-6 * carry, sc.points, sc.origo,
                             sc.mask, cfg.map.top_left_offset,
                             cfg.map.level_scale(0), k_cap)
                return jnp.sum(f.astype(jnp.float32)) * 1e-9 + carry * 0, ()
            c, _ = jax.lax.scan(body, jnp.float32(0.), jnp.arange(k))
            return c
        return lambda: float(chain(pose))

    out = {}
    for nm, fn in (("xla", rasterize_scan),
                   ("pallas", rasterize_scan_pallas)):
        per = []
        for _ in range(2):
            t = {}
            for k in (4, 16):
                f = make_chain(fn, k)
                f()
                t0 = time.perf_counter()
                f()
                t[k] = time.perf_counter() - t0
            per.append((t[16] - t[4]) / 12)
        out[nm] = min(per) * 1e3
        print(f"[{name}] {nm}: {out[nm]:.2f} ms/rasterization")
    print(f"[{name}] speedup: {out['xla']/out['pallas']:.2f}x")


run_shape("bench 0.05m K=640", 0.05, 640)
run_shape("default 0.025m K=1216", 0.025, 1216)
