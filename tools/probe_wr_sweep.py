"""Sweep the Pallas matcher's window geometry (wr rows, bpb beams/block)
at the bench shape: kernel cost scales with the slab loop (wr/8) so
wr=16 should cut ~1/3 off the in-kernel work IF the 8-row slack still
absorbs the spread (fast-path fraction stays ~1).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_wr_sweep.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from hector_slam_tpu.config import BENCH_CONFIG
from hector_slam_tpu.parallel.pallas_match import (match_hypotheses_pallas,
                                                   match_hypotheses_pallas_jit)
from hector_slam_tpu.types import Scan

cfg = BENCH_CONFIG
rng = np.random.default_rng(0)
pyr = []
for i in range(3):
    n = 1024 >> i
    g = np.zeros((n, n), np.float32)
    yy, xx = np.mgrid[0:n, 0:n]
    r = np.sqrt((xx - n / 2) ** 2 + (yy - n / 2) ** 2)
    g[(r > 180 / 2 ** i) & (r < 183 / 2 ** i)] = 2.0
    pyr.append(jnp.asarray(g))
pyr = tuple(pyr)
B, N = 4096, cfg.max_beams
ang = np.linspace(-2.35, 2.35, N).astype(np.float32)
pts = (np.stack([np.cos(ang), np.sin(ang)], -1)
       * (180.0 + rng.uniform(-1, 1, (N, 1)))).astype(np.float32)
scan = Scan(points=jnp.asarray(pts), origo=jnp.zeros(2, jnp.float32),
            mask=jnp.ones(N, bool))
base = jnp.zeros(3, jnp.float32)


def timed(wr, bpb):
    # engagement first (cheap single call)
    poses = jnp.asarray(rng.normal(0, .05, (B, 3)), jnp.float32)
    _, diag = match_hypotheses_pallas_jit(pyr, poses, scan, cfg, wr=wr,
                                          bpb=bpb)
    frac = float(diag.fast_path_fraction())
    ovf = int(diag.overflow_steps)

    def make(k):
        seeds = jnp.asarray(np.random.default_rng(1).normal(0, .05, (k, B, 3)),
                            jnp.float32)

        @jax.jit
        def chain(pyramid, sc):
            def body(carry, seed):
                res, _ = match_hypotheses_pallas(
                    pyramid, base + seed + 0.0 * carry.sum(), sc, cfg,
                    wr=wr, bpb=bpb)
                return jnp.mean(res.pose, axis=0), ()
            c, _ = jax.lax.scan(body, jnp.zeros(3, jnp.float32), seeds)
            return jnp.sum(c)
        return lambda: float(chain(pyr, sc=scan))

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
    dt = min(per)
    print(f"wr={wr} bpb={bpb}: {B/dt:,.0f} matches/s "
          f"({dt*1e3:.1f} ms/batch), frac={frac:.4f} ovf={ovf}")
    return B / dt


# timed(24, 8)  # baseline measured: 76.7k on the ring workload
timed(16, 8)
timed(16, 16)

# MEASURED (2026-08-21, ring workload): wr=24 bpb=8 -> 76.7k matches/s,
# frac=1.0; wr=16 bpb=8 -> 22.0k, frac=0.57, 6 overflow steps — the
# 8-row slack of wr=16 cannot absorb the GN-iterate spread, so every
# overflowing step pays the full quad fallback. wr=24 stays the default.
