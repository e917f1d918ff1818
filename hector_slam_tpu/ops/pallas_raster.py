"""Pallas TPU kernel for the map-update rasterization — in-VMEM painting
of the per-scan free-cell set (ROADMAP #1 / round-3 VERDICT #3).

Why a kernel: the XLA path (core/mapping.rasterize_scan) scatters a
dense [beams, max_ray_cells] slot array; TPU scatter processes every
STATIC slot serially at ~150 M slots/s, so the bench config pays for
737k slots (4.9 ms) and the default config for 1.4 M (9.4 ms) even
though only ~25% hold valid cells. This kernel walks each beam's
Bresenham line INCREMENTALLY (the reference's own loop structure,
OccGridMapBase.h:243-260) with a dynamic trip count, so it does work
proportional to the VALID cell count, and its stores go to a VMEM-
resident grid.

Cell-set exactness: the incremental error update (err += abs_db;
wrap when err >= abs_da) reproduces the closed form
``minor(j) = (abs_da//2 + j*abs_db) // abs_da`` of the XLA path
cell-for-cell — both transcribe bresenham2D; tests assert the painted
set equals rasterize_scan's free set bit-for-bit (which is itself
pinned against the compiled reference in tests/test_mapping.py).

The kernel paints ONLY the free set (the expensive part: ~abs_da cells
per beam). Endpoint-occupied cells (one per beam) stay on a small XLA
scatter, and the log-odds delta application (core/cell_models) is
unchanged — identical semantics to the XLA path including occupied-wins
and the per-scan dedup derivation (core/mapping.py module doc).

Gating: grids larger than the VMEM budget (2048^2 tutorial config) or
with lane-unfriendly widths use the XLA scatter path (static decision,
see ``raster_supported``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_GRID_BYTES = 8 * 1024 * 1024


def raster_supported(shape: Tuple[int, int]) -> bool:
    """Static gate: can this level's free-set grid live in VMEM?"""
    h, w = shape
    return (h % 8 == 0 and w % 128 == 0
            and h * w * 4 <= _VMEM_GRID_BYTES)


def _make_kernel(h: int, w: int, n_beams: int):
    f32 = jnp.float32

    def kern(y0_ref, x0_ref, nsteps_ref, da_row_ref, da_col_ref,
             db_row_ref, db_col_ref, absda_ref, absdb_ref, err0_ref,
             out_ref):
        out_ref[...] = jnp.zeros((h, w), f32)

        def beam(n, _):
            absda = absda_ref[n]
            absdb = absdb_ref[n]
            da_r = da_row_ref[n]
            da_c = da_col_ref[n]
            db_r = db_row_ref[n]
            db_c = db_col_ref[n]

            def step(j, c):
                row, col, err = c
                out_ref[row, col] = f32(1.0)
                # increment AFTER plotting (bresenham2D plots the start
                # cell first, then advances abs_da-1 times)
                err2 = err + absdb
                wrap = err2 >= absda
                row2 = row + da_r + jnp.where(wrap, db_r, 0)
                col2 = col + da_c + jnp.where(wrap, db_c, 0)
                err3 = jnp.where(wrap, err2 - absda, err2)
                return row2, col2, err3

            jax.lax.fori_loop(0, nsteps_ref[n], step,
                              (y0_ref[n], x0_ref[n], err0_ref[n]))
            return _

        jax.lax.fori_loop(0, n_beams, beam, 0)

    return kern


@functools.partial(jax.jit, static_argnames=("shape", "interpret"))
def paint_free_set(
    shape: Tuple[int, int],
    y0: jnp.ndarray,        # i32[] start cell row (shared sensor origin)
    x0: jnp.ndarray,        # i32[] start cell col
    nsteps: jnp.ndarray,    # i32[N] cells to paint (0 = skip beam)
    da_row: jnp.ndarray,    # i32[N] dominant-axis row step
    da_col: jnp.ndarray,
    db_row: jnp.ndarray,    # i32[N] minor-axis row step (on wrap)
    db_col: jnp.ndarray,
    absda: jnp.ndarray,     # i32[N]
    absdb: jnp.ndarray,
    err0: jnp.ndarray,      # i32[N] = abs_da // 2
    interpret: bool = False,
) -> jnp.ndarray:
    """Paints every beam's Bresenham free cells into a f32[H, W] grid
    (1.0 = free-marked). All index math is int32 scalars walked
    incrementally in-kernel; cells match core/mapping.rasterize_scan
    exactly."""
    h, w = shape
    n = nsteps.shape[0]
    i32 = jnp.int32
    y0b = jnp.broadcast_to(y0.astype(i32), (n,))
    x0b = jnp.broadcast_to(x0.astype(i32), (n,))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=10,
        grid=(1,),
        in_specs=[],
        out_specs=pl.BlockSpec((h, w), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _make_kernel(h, w, n),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        interpret=interpret,
    )(y0b, x0b, nsteps.astype(i32), da_row.astype(i32),
      da_col.astype(i32), db_row.astype(i32), db_col.astype(i32),
      absda.astype(i32), absdb.astype(i32), err0.astype(i32))
