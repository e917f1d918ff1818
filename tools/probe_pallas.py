"""Microbenchmark of Pallas/Mosaic primitive costs on the attached TPU.

Measures the candidate building blocks for the VMEM matcher kernel
(ROADMAP #1). Timing: vary REPS inside one kernel with a loop-carried
dependency (nothing hoistable), difference two chain lengths to cancel
the ~20-50 ms dispatch jitter of the tunneled backend; work at the high
rep count is sized >= 200 ms so jitter is <5%.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_pallas.py
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _time_call(f, args):
    # the tunneled backend's block_until_ready does not reflect device
    # completion — a host-side scalar FETCH inside the timed region is
    # the only reliable completion barrier (see PERF.md)
    t0 = time.perf_counter()
    out = f(*args)
    float(jnp.sum(out))
    return time.perf_counter() - t0


def probe(name, make_kernel, reps_lo, reps_hi, units_per_rep=1.0):
    try:
        f_lo, args_lo = make_kernel(reps_lo)
        f_hi, args_hi = make_kernel(reps_hi)
        a_lo, a_hi = args_lo(), args_hi()
        _time_call(f_lo, a_lo)   # compile + warm
        _time_call(f_hi, a_hi)

        def _fresh(args_fn):
            # pre-transfer fresh inputs BEFORE the timed region: varying
            # inputs defeat the tunnel's identical-dispatch cache, while
            # the up-front device_put keeps host->device transfer out of
            # the min-of-3 estimate (it cancels in the lo/hi difference
            # but adds jitter)
            a = [jax.device_put(x) for x in args_fn()]
            jax.block_until_ready(a)
            return a

        t_lo = min(_time_call(f_lo, _fresh(args_lo)) for _ in range(3))
        t_hi = min(_time_call(f_hi, _fresh(args_hi)) for _ in range(3))
        dt = (t_hi - t_lo) / (reps_hi - reps_lo)
        print(f"{name}: {dt*1e9:.1f} ns/rep | {dt*1e9/units_per_rep:.3f} "
              f"ns/unit | lo={t_lo*1e3:.1f}ms hi={t_hi*1e3:.1f}ms")
        sys.stdout.flush()
        return dt
    except Exception as e:
        msg = str(e).split(chr(10))[0][:160]
        print(f"{name}: FAILED: {type(e).__name__}: {msg}")
        sys.stdout.flush()
        return None


def gather_tiles(axis=1, tiles=64, op_shape=(8, 128)):
    """take_along_axis over `tiles` static [8,128] slices of a resident
    buffer, per rep. units = total selected elements per rep."""
    th, tw = op_shape
    buf_shape = (th * tiles, tw)
    mod = op_shape[axis]

    def make(reps):
        def kern(p_ref, idx_ref, o_ref):
            def body(i, acc):
                parts = []
                for t in range(tiles):
                    p = p_ref[t * th:(t + 1) * th, :]
                    ix = (idx_ref[t * th:(t + 1) * th, :] + i) % mod
                    parts.append(jnp.take_along_axis(
                        p + acc[:th] * jnp.float32(1e-30), ix, axis=axis))
                return acc + jnp.concatenate(parts, axis=0)

            o_ref[:] = jax.lax.fori_loop(
                0, reps, body, jnp.zeros(buf_shape, jnp.float32))

        f = jax.jit(lambda p, idx: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(buf_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(p, idx))

        def args():
            rng = np.random.default_rng(int(time.time_ns()) % 2**31)
            return (jnp.asarray(rng.random(buf_shape), jnp.float32),
                    jnp.asarray(rng.integers(0, mod, buf_shape), jnp.int32))
        return f, args
    return make


def gather_big(shape, axis):
    """One take_along_axis on a bigger-than-tile operand per rep."""
    mod = shape[axis]

    def make(reps):
        def kern(p_ref, idx_ref, o_ref):
            def body(i, acc):
                g = jnp.take_along_axis(
                    p_ref[:] + acc * jnp.float32(1e-30),
                    (idx_ref[:] + i) % mod, axis=axis)
                return acc + g

            o_ref[:] = jax.lax.fori_loop(
                0, reps, body, jnp.zeros(shape, jnp.float32))

        f = jax.jit(lambda p, idx: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(p, idx))

        def args():
            rng = np.random.default_rng(int(time.time_ns()) % 2**31)
            return (jnp.asarray(rng.random(shape), jnp.float32),
                    jnp.asarray(rng.integers(0, mod, shape), jnp.int32))
        return f, args
    return make


def matmul_stationary(m=8192, k=128, n=128):
    """Chained bf16 A@W, W stationary across reps. units = bf16 MACs."""
    def make(reps):
        def kern(a_ref, w_ref, o_ref):
            w = w_ref[:]

            def body(i, a):
                c = jnp.dot(a, w, preferred_element_type=jnp.float32)
                return c.astype(jnp.bfloat16)

            o_ref[:] = jax.lax.fori_loop(
                0, reps, body, a_ref[:]).astype(jnp.float32)

        f = jax.jit(lambda a, w: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, w))

        def args():
            rng = np.random.default_rng(int(time.time_ns()) % 2**31)
            return (jnp.asarray(rng.random((m, k)) * 0.1, jnp.bfloat16),
                    jnp.asarray(rng.random((k, n)) * 0.01, jnp.bfloat16))
        return f, args
    return make


def dyn_slice(grid_hw=(1024, 1024), patch=(32, 128), mode="both"):
    """Dynamic-offset slice loads from a VMEM-resident grid.
    mode: 'both' = dynamic y and x; 'y' = dynamic y, x static 0;
    'xal' = x aligned to 128.

    Note: each iteration's slice offset depends only on the loop index
    (the accumulator feeds only the adds), so Mosaic may pipeline loads
    across iterations — this probe measures slice THROUGHPUT, not
    serialized latency."""
    gh, gw = grid_hw
    ph, pw = patch

    def make(reps):
        def kern(g_ref, ys_ref, xs_ref, o_ref):
            def body(i, acc):
                j = i % 512
                y0 = ys_ref[j]
                if mode == "y":
                    sl = g_ref[pl.ds(y0, ph), 0:pw]
                elif mode == "xal":
                    x0 = (xs_ref[j] // pw) * pw
                    sl = g_ref[pl.ds(y0, ph), pl.ds(x0, pw)]
                else:
                    sl = g_ref[pl.ds(y0, ph), pl.ds(xs_ref[j], pw)]
                return acc + sl

            o_ref[:] = jax.lax.fori_loop(
                0, reps, body, jnp.zeros(patch, jnp.float32))

        f = jax.jit(lambda g, ys, xs: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(patch, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(g, ys, xs))

        def args():
            rng = np.random.default_rng(int(time.time_ns()) % 2**31)
            return (jnp.asarray(rng.random(grid_hw), jnp.float32),
                    jnp.asarray(rng.integers(0, gh - ph, 512), jnp.int32),
                    jnp.asarray(rng.integers(0, gw - pw, 512), jnp.int32))
        return f, args
    return make


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices())
    if which in ("all", "gather"):
        # 64 tiles x 1024 sel per rep = 65536 selections/rep
        probe("lane-gather 64x(8,128) ax1", gather_tiles(1),
              64, 512, units_per_rep=64 * 1024)
        probe("sublane-gather 64x(8,128) ax0", gather_tiles(0),
              64, 512, units_per_rep=64 * 1024)
    if which in ("all", "gbig"):
        probe("take_along (32,256) ax1", gather_big((32, 256), 1),
              64, 512, units_per_rep=32 * 256)
        probe("take_along (32,256) ax0", gather_big((32, 256), 0),
              64, 512, units_per_rep=32 * 256)
        probe("take_along (32,128) ax1", gather_big((32, 128), 1),
              64, 512, units_per_rep=32 * 128)
        probe("take_along (8,256) ax1", gather_big((8, 256), 1),
              64, 512, units_per_rep=8 * 256)
    if which in ("all", "mm"):
        probe("bf16 mm [8192,128]x[128,128] stationary",
              matmul_stationary(8192, 128, 128), 64, 1024,
              units_per_rep=8192 * 128 * 128)
    if which in ("all", "ds"):
        probe("dyn slice y-only [32,128]", dyn_slice(mode="y"),
              1024, 16384)
        probe("dyn slice x-aligned [32,128]", dyn_slice(mode="xal"),
              1024, 16384)
        probe("dyn slice both [32,128]", dyn_slice(mode="both"),
              1024, 16384)
