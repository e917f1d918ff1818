"""Design-point sweep for the MXU matcher on the real chip.

Times match_hypotheses_mxu variants (patch geometry, one-hot dtype,
bucket count) with the honest chained-scan protocol (see PERF.md):
K iterations inside one jitted lax.scan with varying inputs, scalar
fetch, two chain lengths differenced.

Usage: python tools/bench_matcher_variants.py [B]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from hector_slam_tpu.config import BENCH_CONFIG
    from hector_slam_tpu.core.slam import init_state, slam_step_jit
    from hector_slam_tpu.io.scanlog import LaserModel, scan_from_ranges
    from hector_slam_tpu.io.simulator import (World, corridor_trajectory,
                                              simulate_trajectory)
    from hector_slam_tpu.parallel.onehot_match import match_hypotheses_mxu

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
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
    base = jnp.asarray(poses_true[-1], jnp.float32)
    scan = scans[-1]
    rng = np.random.default_rng(0)

    def measure(**kw):
        def make_chain(k):
            seeds = jnp.asarray(rng.normal(0, 0.05, (k, B, 3)), jnp.float32)

            @jax.jit
            def chain(pyramid, sc):
                def body(carry, seed):
                    r = match_hypotheses_mxu(
                        pyramid, base + seed + 0.0 * carry.sum(), sc, cfg,
                        **kw)
                    return jnp.mean(r.pose, axis=0), ()
                carry, _ = jax.lax.scan(body, jnp.zeros(3, jnp.float32),
                                        seeds)
                return jnp.sum(carry)

            return lambda: float(chain(state.log_odds, sc=scan))

        per = []
        for _ in range(2):
            times = {}
            for k in (4, 16):
                f = make_chain(k)
                f()
                t0 = time.perf_counter()
                f()
                times[k] = time.perf_counter() - t0
            per.append((times[16] - times[4]) / 12.0)
        return B / min(per)

    variants = [
        ("baseline 64x256 f32oh", {}),
        ("64x256 bf16oh", dict(onehot_bf16=True)),
        ("64x128 f32oh", dict(patch_w=128)),
        ("32x128 f32oh", dict(patch_h=32, patch_w=128)),
        ("32x128 bf16oh", dict(patch_h=32, patch_w=128, onehot_bf16=True)),
        ("32x128 bf16oh G32", dict(patch_h=32, patch_w=128,
                                   onehot_bf16=True, num_buckets=32)),
        ("64x256 bf16oh G32", dict(onehot_bf16=True, num_buckets=32)),
    ]
    sel = os.environ.get("VARIANTS", "")
    if sel:
        idx = [int(i) for i in sel.split(",")]
        variants = [variants[i] for i in idx]
    for name, kw in variants:
        try:
            rate = measure(**kw)
            print(f"{name:28s} {rate:10.0f} matches/s")
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
