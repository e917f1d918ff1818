"""Probe: can Mosaic do per-element dynamic VMEM stores fast enough to
beat XLA's ~150 M/s scatter for the map-update rasterization?

Designs probed (all paint a [1024, 1024] grid from flat cell indices):
  A. scalar loop of dynamic single-element stores (fori_loop over cells)
  B. per-(beam,row) run painting: one aligned [1,128] masked RMW per run

Run CPU-interpret first for correctness, then on TPU for timing:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_mosaic_store.py [cpu]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CPU = len(sys.argv) > 1 and sys.argv[1] == "cpu"
if CPU:
    jax.config.update("jax_platforms", "cpu")

H = W = 1024
NK = 64 * 1024          # stores per launch (probe scale)


def make_store_kernel(nk):
    def kern(ys_ref, xs_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[...] = jnp.zeros((H, W), jnp.float32)

        def body(i, _):
            y = ys_ref[i]
            x = xs_ref[i]
            out_ref[y, x] = 1.0
            return 0

        jax.lax.fori_loop(0, nk, body, 0)
    return kern


def probe_scalar_store():
    rng = np.random.default_rng(0)
    ys = jnp.asarray(rng.integers(0, H, NK), jnp.int32)
    xs = jnp.asarray(rng.integers(0, W, NK), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[],
        out_specs=pl.BlockSpec((H, W), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    f = pl.pallas_call(
        make_store_kernel(NK),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        interpret=CPU,
    )
    jf = jax.jit(lambda a, b: f(a, b).sum())
    t0 = time.time()
    v = float(jf(ys, xs))
    print(f"A compile+run: {time.time()-t0:.1f}s painted={v:.0f} "
          f"(expect ~{len(np.unique(np.asarray(ys)*W+np.asarray(xs)))})")
    if not CPU:
        for _ in range(3):
            t0 = time.perf_counter()
            float(jf(ys, xs))
            dt = time.perf_counter() - t0
        print(f"A per-store: {dt/NK*1e9:.2f} ns ({NK/dt/1e6:.0f} M/s) "
              f"[includes ~22ms RTT: {dt*1e3:.1f} ms total]")


NRUNS = 16 * 1024


def make_run_kernel(nruns):
    """One masked [1,128] RMW per run: row r, aligned col base c0
    (multiple of 128), lane interval [lo, hi]."""
    def kern(row_ref, c0_ref, lo_ref, hi_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[...] = jnp.zeros((H, W), jnp.float32)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(i, _):
            r = row_ref[i]
            c0 = pl.multiple_of(c0_ref[i], 128)
            cur = out_ref[pl.ds(r, 1), pl.ds(c0, 128)]
            m = (lanes >= lo_ref[i]) & (lanes <= hi_ref[i])
            out_ref[pl.ds(r, 1), pl.ds(c0, 128)] = jnp.where(m, 1.0, cur)
            return 0

        jax.lax.fori_loop(0, nruns, body, 0)
    return kern


def probe_run_store():
    rng = np.random.default_rng(1)
    rows = rng.integers(0, H, NRUNS).astype(np.int32)
    c0 = (rng.integers(0, W // 128, NRUNS) * 128).astype(np.int32)
    lo = rng.integers(0, 120, NRUNS).astype(np.int32)
    hi = np.minimum(lo + rng.integers(0, 8, NRUNS), 127).astype(np.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=[],
        out_specs=pl.BlockSpec((H, W), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    f = pl.pallas_call(
        make_run_kernel(NRUNS),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        interpret=CPU,
    )
    jf = jax.jit(lambda *a: f(*a).sum())
    args = tuple(jnp.asarray(a) for a in (rows, c0, lo, hi))
    t0 = time.time()
    v = float(jf(*args))
    exp = np.zeros((H, W))
    for r, c, l, h in zip(rows, c0, lo, hi):
        exp[r, c + l:c + h + 1] = 1
    print(f"B compile+run: {time.time()-t0:.1f}s painted={v:.0f} "
          f"(expect {exp.sum():.0f})")
    assert v == exp.sum(), "run painting incorrect"
    if not CPU:
        for _ in range(3):
            t0 = time.perf_counter()
            float(jf(*args))
            dt = time.perf_counter() - t0
        print(f"B per-run: {dt/NRUNS*1e9:.2f} ns ({NRUNS/dt/1e6:.1f} M runs/s) "
              f"[total {dt*1e3:.1f} ms]")


probe_scalar_store()
probe_run_store()
