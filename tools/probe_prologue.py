"""Round-5 probe: decompose the batched Pallas GN step into kernel vs
prologue (transform + window bases + sort/unsort + solve) at the bench
shape, with the honest chained-scan protocol (per-iteration-varying
inputs, scalar fetch, K=4 vs K=16 chain differencing — PERF.md
methodology).

Run: python tools/probe_prologue.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from hector_slam_tpu.parallel.pallas_match import gn_step_pallas
from hector_slam_tpu.ops.pallas_interp import (_transform_batch,
                                               _window_bases,
                                               interp_moments_pallas)
from hector_slam_tpu.core.interp import quad_pack
from hector_slam_tpu.ops.solve3 import solve3

H = W = 1024
rng = np.random.default_rng(0)
grid = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
quad = quad_pack(grid)
B, N = 4096, 1152
S_PER = 512
ang = np.linspace(-2.35, 2.35, N)
pts = np.c_[180 * np.cos(ang), 180 * np.sin(ang)].astype(np.float32)
mask = np.ones(N, bool)
ptsj, maskj = jnp.asarray(pts), jnp.asarray(mask)
tight = np.c_[512 + rng.normal(0, .2, (B, 2)),
              np.sort(rng.normal(0, .01, B))].astype(np.float32)
tightj = jnp.asarray(tight)


def diff_time(make_chain):
    """compile both chains, difference K=4 vs K=16, best of 3."""
    best = 1e9
    fs = {k: make_chain(k) for k in (4, 16)}
    for f in fs.values():
        f()  # compile+warm
    for _ in range(3):
        times = {}
        for k, f in fs.items():
            t0 = time.perf_counter()
            f()
            times[k] = time.perf_counter() - t0
        best = min(best, (times[16] - times[4]) / 12)
    return best * 1e3


def chain_full(k):
    seeds = jnp.asarray(rng.normal(0, 1e-4, (k, B, 3)), jnp.float32)

    @jax.jit
    def chain(p):
        def body(carry, seed):
            est, hess, d = gn_step_pallas(
                grid, quad, (H, W), p + seed + 0 * carry, ptsj, maskj,
                s_per=S_PER)
            return jnp.sum(est) * 1e-9, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.), seeds)
        return c
    return lambda: float(chain(tightj))


def chain_kernel_only(k):
    """kernel + its shared prologue, no sort/repair/solve."""
    seeds = jnp.asarray(rng.normal(0, 1e-4, (k, B, 3)), jnp.float32)

    @jax.jit
    def chain(p):
        def body(carry, seed):
            pm = p + seed + 0 * carry
            mom = interp_moments_pallas(grid, (H, W), pm, ptsj, maskj,
                                        s_per=S_PER)
            return jnp.sum(mom.dtr) * 1e-9, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.), seeds)
        return c
    return lambda: float(chain(tightj))


def chain_prologue_only(k):
    """transform + window bases (the XLA pre-pass), no kernel."""
    seeds = jnp.asarray(rng.normal(0, 1e-4, (k, B, 3)), jnp.float32)

    @jax.jit
    def chain(p):
        def body(carry, seed):
            pm = p + seed + 0 * carry
            tx, ty, s, c = _transform_batch(pm, ptsj)
            y0, x0, bad = _window_bases(tx, ty, maskj, (H, W),
                                        S_PER, 24, 256)
            return (jnp.sum(tx[0, :1]) + jnp.sum(y0[:1])
                    + jnp.sum(bad[0, :1])) * 1e-9, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.), seeds)
        return c
    return lambda: float(chain(tightj))


def chain_transpose_tax(k):
    """transform + the tx.T/ty.T materialization the kernel launch needs."""
    seeds = jnp.asarray(rng.normal(0, 1e-4, (k, B, 3)), jnp.float32)

    @jax.jit
    def chain(p):
        def body(carry, seed):
            pm = p + seed + 0 * carry
            tx, ty, s, c = _transform_batch(pm, ptsj)
            return (jnp.sum(tx.T[:1, :1]) + jnp.sum(ty.T[:1, :1])) * 1e-9, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.), seeds)
        return c
    return lambda: float(chain(tightj))


def chain_sort_solve(k):
    """argsort + gather + inverse-argsort + unsort-gathers + solve."""
    seeds = jnp.asarray(rng.normal(0, 1e-4, (k, B, 3)), jnp.float32)
    hess0 = jnp.asarray(
        rng.normal(0, 1, (B, 3, 3)).astype(np.float32))
    dtr0 = jnp.asarray(rng.normal(0, 1, (B, 3)).astype(np.float32))

    @jax.jit
    def chain(p):
        def body(carry, seed):
            pm0 = p + seed + 0 * carry
            order = jnp.argsort(pm0[:, 2])
            pm = pm0[order]
            inv = jnp.argsort(order)
            hess = hess0[inv] + pm[:, :1, None]
            dtr = dtr0[inv]
            guard = (hess[:, 0, 0] != 0.) & (hess[:, 1, 1] != 0.)
            safe = jnp.where(guard[:, None, None], hess,
                             jnp.eye(3, dtype=jnp.float32)[None])
            s = jax.vmap(solve3)(safe, dtr)
            return jnp.sum(s) * 1e-9, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.), seeds)
        return c
    return lambda: float(chain(tightj))


if __name__ == "__main__":
    for name, mk in [("gn_step full", chain_full),
                     ("kernel+shared-prologue", chain_kernel_only),
                     ("prologue only (transform+bases)", chain_prologue_only),
                     ("transform + transpose", chain_transpose_tax),
                     ("sort+unsort+solve", chain_sort_solve)]:
        print(f"{name:36s}: {diff_time(mk):7.3f} ms/step", flush=True)
