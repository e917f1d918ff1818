"""Decompose the on-TPU cost of one batched Pallas GN step (round-4
perf investigation). One compiled chain per program; the SAME executable
is fed tight-spread (repair cond not taken) and wide-spread (repair cond
taken) data so data-dependent cost is isolated without recompiles.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_gn_step_cost.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from hector_slam_tpu.parallel.pallas_match import gn_step_pallas
from hector_slam_tpu.ops.pallas_interp import (_transform_batch,
                                               _window_bases,
                                               bad_query_corrections,
                                               repair_moments)
from hector_slam_tpu.core.interp import quad_pack

H = W = 1024
K = 16
rng = np.random.default_rng(0)
grid = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
quad = quad_pack(grid)
B, N = 4096, 1152
ang = np.linspace(-2.35, 2.35, N)
pts = np.c_[180 * np.cos(ang), 180 * np.sin(ang)].astype(np.float32)
mask = np.ones(N, bool)
ptsj, maskj = jnp.asarray(pts), jnp.asarray(mask)
tight = np.c_[512 + rng.normal(0, .2, (B, 2)),
              np.sort(rng.normal(0, .01, B))].astype(np.float32)
wide = np.c_[512 + rng.normal(0, 1., (B, 2)),
             np.sort(rng.normal(0, .05, B))].astype(np.float32)
tightj, widej = jnp.asarray(tight), jnp.asarray(wide)


def timeit(f, *a):
    f(*a)   # compile+warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        f(*a)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


@jax.jit
def chain_gn(p, pt, m, g_, q_):
    def body(carry, i):
        est = p.at[:, 0].add(1e-6 * carry)
        est, hess, d = gn_step_pallas(g_, q_, (H, W), est, pt, m, s_per=512)
        return jnp.sum(est) * 1e-9 + carry * 0, ()
    c, _ = jax.lax.scan(body, jnp.float32(0.), jnp.arange(K))
    return c


def run_gn(p):
    return float(chain_gn(p, ptsj, maskj, grid, quad))


t_tight = timeit(run_gn, tightj)
t_wide = timeit(run_gn, widej)
print(f"chain16 gn_step  tight: {t_tight:8.1f} ms  -> {t_tight/K:6.2f} ms/step")
print(f"chain16 gn_step  wide:  {t_wide:8.1f} ms  -> {t_wide/K:6.2f} ms/step")
print(f"repair-cond marginal cost: {(t_wide-t_tight)/K:6.2f} ms/step")


@jax.jit
def chain_repair(p, pt, m, q_):
    hess0 = jnp.zeros((B, 3, 3), jnp.float32)
    dtr0 = jnp.zeros((B, 3), jnp.float32)

    def body(carry, i):
        pp = p.at[:, 0].add(1e-6 * carry)
        h, d, nb, ovf = repair_moments(q_, (H, W), pp, pt, m,
                                       hess0, dtr0, 4096, 512, 24, 256)
        return jnp.sum(h) * 1e-9 + carry * 0, ()
    c, _ = jax.lax.scan(body, jnp.float32(0.), jnp.arange(K))
    return c


def run_rep(p):
    return float(chain_repair(p, ptsj, maskj, quad))


t_rt = timeit(run_rep, tightj)
t_rw = timeit(run_rep, widej)
print(f"chain16 repair_moments tight: {t_rt:8.1f} ms -> {t_rt/K:6.2f} ms/step")
print(f"chain16 repair_moments wide:  {t_rw:8.1f} ms -> {t_rw/K:6.2f} ms/step")


@jax.jit
def chain_corr(p, pt, m, q_):
    def body(carry, i):
        pp = p.at[:, 0].add(1e-6 * carry)
        tx, ty, s, c = _transform_batch(pp, pt)
        _, _, bad = _window_bases(tx, ty, m, (H, W), 512, 24, 256)
        h, d = bad_query_corrections(q_, (H, W), tx, ty, s, c, pt,
                                     bad, 4096)
        return jnp.sum(h) * 1e-9 + carry * 0, ()
    c, _ = jax.lax.scan(body, jnp.float32(0.), jnp.arange(K))
    return c


def run_corr(p):
    return float(chain_corr(p, ptsj, maskj, quad))


t_cw = timeit(run_corr, widej)
print(f"chain16 corrections-uncond wide: {t_cw:8.1f} ms -> {t_cw/K:6.2f} ms/step")
