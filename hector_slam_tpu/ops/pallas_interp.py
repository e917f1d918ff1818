"""Pallas TPU kernel for batched bilinear map interpolation + normal-
equation moments — the VMEM-resident replacement for the one-hot MXU
matcher's HBM-bound selection (the round-2 bottleneck).

Why a kernel: the XLA one-hot matcher (parallel/onehot_match.py) is
ceilinged by one-hot materialization traffic through HBM (~2 KB/query,
PERF.md), and XLA's TPU gather costs ~5 scalar-core cycles per query.
Mosaic's ``take_along_axis`` on [8, 128] operands is a VPU lane-shuffle
(~13.7 ns per 1024 selections, tools/probe_pallas.py) and an aligned
dynamic VMEM slice costs ~27 ns. This kernel keeps the level's
probability grid resident in VMEM and does the whole per-GN-iteration
interp + Jacobian + moment accumulation on-chip. Measured compiled at
the bench shape (1024^2 grid, 4096 theta-sorted hypotheses, 1152
beams): 1.5-2.2 ms per GN iteration kernel-only, 4.1-4.6 ms for the
full gn_step including granular repair (PALLAS_TPU_VALIDATION.json);
end-to-end 109.6k pyramid matches/s vs 29k for the one-hot path
(BENCH_r04, PERF.md round-4 section).

Structure (per grid step = one theta-subbucket x one 8-beam block):
  1. the XLA prologue computes the map-frame query coords tx, ty ONCE
     (exactly the f32 expression of core/interp.py:_accumulate_normal_eqs,
     Eigen affine order, verified bitwise vs the compiled reference) and
     per-(128-hypothesis chunk, beam) aligned window bases; the kernel
     re-derives cells/fractions from tx, ty by int-cast/subtract — all
     EXACT ops, so kernel and prologue agree bit-for-bit on which queries
     are in-window (no FMA-contraction divergence risk);
  2. slice one aligned [WR, WC] window from the VMEM grid per
     (chunk, beam) — sublane offset multiple of 8, lane offset multiple
     of 128 (Mosaic vector-load alignment rules);
  3. fetch the 4 bilinear neighbors with [8, 128] ``take_along_axis``
     lane-gathers over the window's 8-row slabs;
  4. bilinear value + hector's quirk gradients (OccGridMapUtil.h:341-346
     semantics, formulas identical to core/interp.py:_neighbor_derivs),
     rotation derivative, and Kahan-compensated accumulation of the 9
     normal-equation moments (J^T J upper triangle + J^T r) over beams.

Exactness: fetched neighbor values are exact f32 copies (lane-shuffle
selection, not a matmul), and value/gradient/Jacobian math uses the same
f32 expressions as the quad-gather path, so per-query quantities match
up to FMA-contraction ulps; only the beam-axis reduction order differs
(sequential Kahan here vs XLA tree-sum there). Tests pin both paths
against a float64 oracle at the bench shape.

Fallback is GRANULAR (round-2 VERDICT weak #3): a query whose cell
leaves its chunk's window (diverged GN iterate, very wide hypothesis
spread) is zeroed in-kernel; the wrapper repairs ONLY those queries by
compacting their flat indices (``jnp.nonzero`` with a static budget),
re-evaluating them through the exact quad-gather math, and segment-
summing the corrections into the affected hypotheses' moments. A single
outlier costs one tiny gather, not a whole-batch demotion. Only if the
bad count exceeds the budget does the step fall back to the full
quad-gather path (one ``lax.cond``). ``fast_path_fraction`` telemetry is
returned either way.

Reference numerics replicated: OccGridMapUtil::getCompleteHessianDerivs
(/root/reference/hector_mapping/include/hector_slam_lib/map/
OccGridMapUtil.h:64-104) and interpMapValueWithDerivatives (:287-347).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.interp import interp_quad

# default window geometry: WR x WC cells sliced per (chunk, beam). After
# 8/128 alignment a window is guaranteed to cover >= WR-8 rows and
# >= WC-128 columns of query spread. (WR=24, WC=256, BPB=8 measured
# fastest at the bench shape; WC=128 leaves zero column slack.)
WR = 24
WC = 256
BPB = 8          # beams per kernel block (amortizes moment accumulation)
CHUNK = 128      # hypotheses per window chunk (= one vreg of lanes)

# moment rows (sublane dim of the accumulator):
#  0..5: H upper triangle (xx, xy, xt, yy, yt, tt)
#  6..8: dTr (x, y, t)
#  9:    bad-query count   (window overflow -> wrapper repairs)
#  10:   fast-path query count (diagnostics)
#  11:   pad (keeps the row count fixed)
MOM_ROWS = 12


def _make_kernel(h: int, w: int, s_per: int, wr: int, wc: int, bpb: int,
                 n_beams: int):
    slabs = wr // 8
    halves = wc // 128
    chunks = s_per // CHUNK
    f32 = jnp.float32

    def kern(px_ref, py_ref, msk_ref, y0_ref, x0_ref,   # scalar prefetch
             tx_ref, ty_ref,                            # [bpb, s_per] blocks
             pose_ref,                                  # [8, s_per] sin/cos
             grid_ref,                                  # [H, W] prob grid
             mom_ref,                                   # out [1, MR, s_per]
             comp_ref):                                 # scratch [MR, s_per]
        g = pl.program_id(0)
        nb = pl.program_id(1)

        @pl.when(nb == 0)
        def _init():
            mom_ref[...] = jnp.zeros((1, MOM_ROWS, s_per), f32)
            comp_ref[...] = jnp.zeros((MOM_ROWS, s_per), f32)

        sin_t = pose_ref[0:1, :]
        cos_t = pose_ref[1:2, :]
        iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

        terms = [jnp.zeros((1, s_per), f32) for _ in range(11)]
        for bb in range(bpb):
            n = nb * bpb + bb
            pxn = px_ref[n]
            pyn = py_ref[n]
            vn = msk_ref[n] != 0
            tx = tx_ref[bb:bb + 1, :]                   # (1, s_per)
            ty = ty_ref[bb:bb + 1, :]
            # bounds rule coord in [0, size-2] (MapDimensionProperties.h:65-73)
            inb = ((tx >= 0.0) & (tx <= f32(w - 2))
                   & (ty >= 0.0) & (ty <= f32(h - 2))) & vn
            # int-cast floor + exact fractional part (OccGridMapUtil.h:295);
            # both EXACT f32 ops -> bit-identical to the XLA prologue
            xi = jnp.clip(tx.astype(jnp.int32), 0, w - 2)
            yi = jnp.clip(ty.astype(jnp.int32), 0, h - 2)
            fx = tx - xi.astype(f32)
            fy = ty - yi.astype(f32)

            p00c, p10c, p01c, p11c, fits_c = [], [], [], [], []
            for c in range(chunks):
                sl = slice(c * CHUNK, (c + 1) * CHUNK)
                base_i = (g * n_beams + n) * chunks + c
                y0 = pl.multiple_of(y0_ref[base_i], 8)
                x0 = pl.multiple_of(x0_ref[base_i], 128)
                win = grid_ref[pl.ds(y0, wr), pl.ds(x0, wc)]
                ry = yi[:, sl] - y0
                cx = xi[:, sl] - x0
                fits = ((ry >= 0) & (ry <= wr - 2)
                        & (cx >= 0) & (cx <= wc - 2))
                fits_c.append(fits)
                ryc = jnp.clip(ry, 0, wr - 2)
                cxc = jnp.clip(cx, 0, wc - 2)

                def b8(v):  # (1,128)->(8,128); Mosaic rejects broadcast here
                    return pltpu.repeat(v, 8, axis=0)
                idx0 = b8(cxc & 127)
                rel0 = b8(ryc)
                rel1 = rel0 + 1
                if halves > 1:
                    idx1 = b8((cxc + 1) & 127)
                    half0 = b8(cxc // 128)
                    half1 = b8((cxc + 1) // 128)
                else:
                    idx1 = idx0 + 1   # wc=128: cx<=wc-2 so cx+1<=127 safe
                a00 = jnp.zeros((8, 128), f32)
                a10 = jnp.zeros((8, 128), f32)
                a01 = jnp.zeros((8, 128), f32)
                a11 = jnp.zeros((8, 128), f32)
                for s8 in range(slabs):
                    rm0 = (rel0 - s8 * 8) == iota8
                    rm1 = (rel1 - s8 * 8) == iota8
                    for hv in range(halves):
                        slab = win[s8 * 8:(s8 + 1) * 8,
                                   hv * 128:(hv + 1) * 128]
                        t0 = jnp.take_along_axis(slab, idx0, axis=1)
                        t1 = jnp.take_along_axis(slab, idx1, axis=1)
                        if halves > 1:
                            m00 = rm0 & (half0 == hv)
                            m10 = rm0 & (half1 == hv)
                            m01 = rm1 & (half0 == hv)
                            m11 = rm1 & (half1 == hv)
                        else:
                            m00 = m10 = rm0
                            m01 = m11 = rm1
                        a00 = a00 + jnp.where(m00, t0, 0.0)
                        a10 = a10 + jnp.where(m10, t1, 0.0)
                        a01 = a01 + jnp.where(m01, t0, 0.0)
                        a11 = a11 + jnp.where(m11, t1, 0.0)
                p00c.append(jnp.sum(a00, axis=0, keepdims=True))
                p10c.append(jnp.sum(a10, axis=0, keepdims=True))
                p01c.append(jnp.sum(a01, axis=0, keepdims=True))
                p11c.append(jnp.sum(a11, axis=0, keepdims=True))

            p00 = jnp.concatenate(p00c, axis=1)
            p10 = jnp.concatenate(p10c, axis=1)
            p01 = jnp.concatenate(p01c, axis=1)
            p11 = jnp.concatenate(p11c, axis=1)
            fits = jnp.concatenate(fits_c, axis=1)
            bad = inb & ~fits
            use = inb & fits

            # bilinear value + quirk gradients (core/interp.py:_neighbor_derivs)
            one = f32(1.0)
            xfi = one - fx
            yfi = one - fy
            value = (p00 * xfi + p10 * fx) * yfi + (p01 * xfi + p11 * fx) * fy
            grad_x = -(((p00 - p10) * xfi) + ((p01 - p11) * fx))
            grad_y = -(((p00 - p01) * yfi) + ((p10 - p11) * fy))
            zero = f32(0.0)
            m = jnp.where(use, value, zero)
            gx = jnp.where(use, grad_x, zero)
            gy = jnp.where(use, grad_y, zero)
            fun = one - m
            rot = ((-sin_t * pxn - cos_t * pyn) * gx
                   + (cos_t * pxn - sin_t * pyn) * gy)
            rot = jnp.where(use, rot, zero)
            news = [gx * gx, gx * gy, gx * rot, gy * gy, gy * rot, rot * rot,
                    gx * fun, gy * fun, rot * fun,
                    jnp.where(bad, one, zero), jnp.where(use, one, zero)]
            terms = [t + u for t, u in zip(terms, news)]

        block = jnp.concatenate(
            terms + [jnp.zeros((MOM_ROWS - 11, s_per), f32)], axis=0)
        # Kahan-compensated accumulation over beam blocks: the serial sum
        # order differs from XLA's tree reduction; compensation keeps the
        # kernel's totals at least as accurate as either.
        acc = mom_ref[0]
        comp = comp_ref[...]
        yk = block - comp
        t = acc + yk
        comp_ref[...] = (t - acc) - yk
        mom_ref[0] = t

    return kern


def _transform_batch(poses_map: jnp.ndarray, points: jnp.ndarray):
    """Map-frame query coords tx, ty [B, N] — the single place the affine
    transform is evaluated (kernel + repair both consume these values)."""
    sin_t = jnp.sin(poses_map[:, 2])
    cos_t = jnp.cos(poses_map[:, 2])
    px = points[None, :, 0]
    py = points[None, :, 1]
    # Eigen affine order: m00*px + (m01*py + t) (core/interp.py:183)
    tx = cos_t[:, None] * px + (-sin_t[:, None] * py + poses_map[:, 0:1])
    ty = sin_t[:, None] * px + (cos_t[:, None] * py + poses_map[:, 1:2])
    return tx, ty, sin_t, cos_t


def _transform_batch_t(poses_map: jnp.ndarray, points: jnp.ndarray):
    """``_transform_batch`` emitted directly in the TRANSPOSED [N, B]
    layout the kernel's BlockSpecs consume — avoids materializing a
    [B, N] array plus a 19 MB transpose copy per GN step (round-5
    prologue optimization). Per-element f32 arithmetic is the identical
    expression (same ops, same order), so values are bit-equal to
    ``_transform_batch(...).T``."""
    sin_t = jnp.sin(poses_map[:, 2])
    cos_t = jnp.cos(poses_map[:, 2])
    px = points[:, 0:1]                          # [N, 1]
    py = points[:, 1:2]
    # Eigen affine order: m00*px + (m01*py + t) (core/interp.py:183)
    txt = cos_t[None, :] * px + (-sin_t[None, :] * py + poses_map[None, :, 0])
    tyt = sin_t[None, :] * px + (cos_t[None, :] * py + poses_map[None, :, 1])
    return txt, tyt, sin_t, cos_t


class PallasMoments(NamedTuple):
    hess: jnp.ndarray       # f32[B, 3, 3]
    dtr: jnp.ndarray        # f32[B, 3]
    bad_count: jnp.ndarray  # i32[] queries outside their window (pre-repair)
    used: jnp.ndarray       # f32[B] fast-path queries per hypothesis


@functools.partial(
    jax.jit,
    static_argnames=("shape", "s_per", "wr", "wc", "bpb", "interpret"))
def interp_moments_pallas(
    grid: jnp.ndarray,        # f32[H, W] probability grid
    shape: Tuple[int, int],
    poses_map: jnp.ndarray,   # f32[B, 3] theta-SORTED map-frame poses
    points: jnp.ndarray,      # f32[N, 2] beam endpoints (map scale)
    mask: jnp.ndarray,        # bool[N]
    s_per: int = 1024,        # hypotheses per subbucket (multiple of 128)
    #   (s_per=1024 measured 16% faster per GN step than 512 at the
    #   bench shape — fewer kernel grid launches; chunk windows and
    #   numerics are unchanged, chunks stay 128 lanes regardless)
    wr: int = WR,
    wc: int = WC,
    bpb: int = BPB,
    interpret: bool = False,
    precomputed=None,         # optional (tx, ty, sin_t, cos_t, y0f, x0f)
) -> PallasMoments:
    """Raw kernel launch: normal-equation moments for every hypothesis.

    ``poses_map`` must be sorted by theta for windows to stay tight (the
    kernel is correct regardless — loose windows only raise bad_count).
    Queries outside their window are ZEROED, not repaired, here; use
    ``gn_step_pallas`` for exact totals.

    ``precomputed``: the TRANSPOSED prologue tensors (txt, tyt [N, B],
    sin_t, cos_t [B], y0f, x0f flat bases) when the caller already built
    them (gn_step_pallas shares one transform + window-bases pass
    between the kernel and the repair instead of computing both twice).
    """
    h, w = shape
    b_total = poses_map.shape[0]
    n = points.shape[0]
    assert b_total % s_per == 0 and s_per % CHUNK == 0, (b_total, s_per)
    assert n % bpb == 0, (n, bpb)
    assert h % 8 == 0 and w % 128 == 0 and h >= wr and w >= wc, (h, w)
    g_sub = b_total // s_per
    chunks = s_per // CHUNK

    if precomputed is None:
        txt, tyt, sin_t, cos_t = _transform_batch_t(poses_map, points)
        y0f, x0f, _, _ = _window_bases_t(txt, tyt, mask, shape,
                                         s_per, wr, wc)
    else:
        txt, tyt, sin_t, cos_t, y0f, x0f = precomputed
    pose_t = jnp.concatenate([
        sin_t[None], cos_t[None],
        jnp.zeros((6, b_total), jnp.float32)], axis=0)     # [8, B]

    kern = _make_kernel(h, w, s_per, wr, wc, bpb, n)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(g_sub, n // bpb),
        in_specs=[
            pl.BlockSpec((bpb, s_per), lambda g, i, *_: (i, g),
                         memory_space=pltpu.VMEM),          # tx^T
            pl.BlockSpec((bpb, s_per), lambda g, i, *_: (i, g),
                         memory_space=pltpu.VMEM),          # ty^T
            pl.BlockSpec((8, s_per), lambda g, i, *_: (0, g),
                         memory_space=pltpu.VMEM),          # pose rows
            pl.BlockSpec(memory_space=pltpu.VMEM),          # whole grid
        ],
        out_specs=pl.BlockSpec((1, MOM_ROWS, s_per),
                               lambda g, i, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((MOM_ROWS, s_per), jnp.float32)],
    )
    moments = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g_sub, MOM_ROWS, s_per),
                                       jnp.float32),
        interpret=interpret,
    )(points[:, 0], points[:, 1], mask.astype(jnp.int32), y0f, x0f,
      txt, tyt, pose_t, grid)

    mom = jnp.moveaxis(moments, 1, 0).reshape(MOM_ROWS, b_total)  # [R, B]
    hess = jnp.stack([
        jnp.stack([mom[0], mom[1], mom[2]], -1),
        jnp.stack([mom[1], mom[3], mom[4]], -1),
        jnp.stack([mom[2], mom[4], mom[5]], -1),
    ], -2)                                               # [B, 3, 3]
    dtr = jnp.stack([mom[6], mom[7], mom[8]], -1)        # [B, 3]
    bad_count = jnp.sum(mom[9]).astype(jnp.int32)
    return PallasMoments(hess, dtr, bad_count, mom[10])


def _window_bases(tx, ty, mask, shape, s_per, wr, wc):
    """Aligned per-(128-hypothesis chunk, beam) window bases, flattened to
    the kernel's scalar-prefetch layout [(g*n + beam)*chunks + c], plus
    the per-query bad mask (in-bounds but outside its window)."""
    h, w = shape
    b_total, n = tx.shape
    g_sub_chunks = b_total // CHUNK           # total 128-hyp chunks
    chunks = s_per // CHUNK

    inb = ((tx >= 0.0) & (tx <= jnp.float32(w - 2))
           & (ty >= 0.0) & (ty <= jnp.float32(h - 2)) & mask[None, :])
    xi = jnp.clip(tx.astype(jnp.int32), 0, w - 2)
    yi = jnp.clip(ty.astype(jnp.int32), 0, h - 2)
    big = jnp.int32(1 << 29)
    xs = jnp.where(inb, xi, big).reshape(g_sub_chunks, CHUNK, n)
    ys = jnp.where(inb, yi, big).reshape(g_sub_chunks, CHUNK, n)
    x0 = jnp.clip((jnp.min(xs, axis=1) // 128) * 128, 0, w - wc)  # [GC, N]
    y0 = jnp.clip((jnp.min(ys, axis=1) // 8) * 8, 0, h - wr)

    # per-query fit check against the chunk's window (all integer ops —
    # bit-identical to the kernel's own check)
    x0q = jnp.repeat(x0, CHUNK, axis=0)       # [B, N]
    y0q = jnp.repeat(y0, CHUNK, axis=0)
    cx = xi - x0q
    ry = yi - y0q
    fits = (cx >= 0) & (cx <= wc - 2) & (ry >= 0) & (ry <= wr - 2)
    bad = inb & ~fits

    # [GC, N] -> [g_sub, chunks, N] -> [g_sub, N, chunks] -> flat
    g_sub = g_sub_chunks // chunks
    x0f = jnp.transpose(x0.reshape(g_sub, chunks, n), (0, 2, 1)).reshape(-1)
    y0f = jnp.transpose(y0.reshape(g_sub, chunks, n), (0, 2, 1)).reshape(-1)
    return y0f.astype(jnp.int32), x0f.astype(jnp.int32), bad


def _window_bases_t(txt, tyt, mask, shape, s_per, wr, wc):
    """``_window_bases`` for TRANSPOSED [N, B] query coords. Returns
    (y0f, x0f) in the kernel's scalar-prefetch layout plus the raw
    per-(beam, chunk) bases (y0t, x0t) [N, GC] so the repair path can
    recheck fits WITHOUT redoing the min-reduce. Unlike ``_window_bases``
    this does NOT compute the per-query bad mask — the kernel already
    counts bad queries (moment row 9), so the mask is only materialized
    lazily inside the repair cond (``_bad_mask_t``)."""
    h, w = shape
    n, b_total = txt.shape
    gc = b_total // CHUNK
    chunks = s_per // CHUNK
    g_sub = b_total // s_per

    inb = ((txt >= 0.0) & (txt <= jnp.float32(w - 2))
           & (tyt >= 0.0) & (tyt <= jnp.float32(h - 2)) & mask[:, None])
    xi = jnp.clip(txt.astype(jnp.int32), 0, w - 2)
    yi = jnp.clip(tyt.astype(jnp.int32), 0, h - 2)
    big = jnp.int32(1 << 29)
    xs = jnp.where(inb, xi, big).reshape(n, gc, CHUNK)
    ys = jnp.where(inb, yi, big).reshape(n, gc, CHUNK)
    x0t = jnp.clip((jnp.min(xs, axis=2) // 128) * 128, 0, w - wc)  # [N, GC]
    y0t = jnp.clip((jnp.min(ys, axis=2) // 8) * 8, 0, h - wr)

    # [N, GC] -> [g_sub, N, chunks] -> flat [(g*n + beam)*chunks + c]
    x0f = jnp.transpose(x0t.reshape(n, g_sub, chunks), (1, 0, 2)).reshape(-1)
    y0f = jnp.transpose(y0t.reshape(n, g_sub, chunks), (1, 0, 2)).reshape(-1)
    return (y0f.astype(jnp.int32), x0f.astype(jnp.int32),
            y0t.astype(jnp.int32), x0t.astype(jnp.int32))


def _bad_mask_t(txt, tyt, mask, shape, y0t, x0t, wr, wc):
    """bool[N, B] of in-bounds queries outside their chunk's window —
    the same integer fit check the kernel applies (bit-identical), from
    the already-computed per-(beam, chunk) bases. Only evaluated inside
    the repair cond (the kernel's own bad count gates it)."""
    h, w = shape
    inb = ((txt >= 0.0) & (txt <= jnp.float32(w - 2))
           & (tyt >= 0.0) & (tyt <= jnp.float32(h - 2)) & mask[:, None])
    xi = jnp.clip(txt.astype(jnp.int32), 0, w - 2)
    yi = jnp.clip(tyt.astype(jnp.int32), 0, h - 2)
    cx = xi - jnp.repeat(x0t, CHUNK, axis=1)
    ry = yi - jnp.repeat(y0t, CHUNK, axis=1)
    fits = (cx >= 0) & (cx <= wc - 2) & (ry >= 0) & (ry <= wr - 2)
    return inb & ~fits


def _first_k_indices(flat: jnp.ndarray, k: int):
    """Flat indices of the first ``k`` True elements of a bool vector,
    via TWO-LEVEL compaction: per-128-block popcounts, a cumsum over the
    block counts (L/128 elements — ~100x shorter than a full-length
    cumsum, which costs ~1.6 ms at the bench shape), searchsorted to
    place each rank in its block, then an in-block 128-lane cumsum to
    find the column. Returns (idx i32[k], valid bool[k], total i32[])."""
    pad = (-flat.shape[0]) % 128
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros(pad, flat.dtype)])
    blocks = flat.reshape(-1, 128)
    m = blocks.shape[0]
    cnt = jnp.sum(blocks, axis=1, dtype=jnp.int32)        # [M]
    cpos = jnp.cumsum(cnt)
    total = cpos[-1]
    j = jnp.arange(1, k + 1, dtype=jnp.int32)             # 1-based ranks
    mb = jnp.minimum(jnp.searchsorted(cpos, j), m - 1)    # block of rank j
    before = jnp.where(mb > 0, cpos[jnp.maximum(mb - 1, 0)], 0)
    rank = j - before                                     # 1-based in-block
    rows = blocks[mb].astype(jnp.int32)                   # [k, 128]
    rcum = jnp.cumsum(rows, axis=1)
    col = jnp.argmax(rcum == rank[:, None], axis=1)       # first hit = bit
    idx = mb * 128 + col.astype(jnp.int32)
    valid = j <= total
    return idx, valid, total


def bad_query_corrections(
    quad: jnp.ndarray,        # f32[H*W, 4] quad-packed prob grid
    shape: Tuple[int, int],
    tx: jnp.ndarray,          # f32[B, N] map-frame query coords
    ty: jnp.ndarray,
    sin_t: jnp.ndarray,       # f32[B]
    cos_t: jnp.ndarray,
    points: jnp.ndarray,      # f32[N, 2]
    bad: jnp.ndarray,         # bool[B, N] queries to re-evaluate
    k_budget: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact moment contributions of the ``bad`` queries, via budgeted
    nonzero-compaction + quad-gather + segment-sum. Returns
    (h_corr f32[B,3,3], d_corr f32[B,3]) to ADD to a fast path that
    zeroed those queries. Only the first ``k_budget`` bad queries are
    covered — callers must check jnp.sum(bad) <= k_budget and take a
    full fallback otherwise. Shared by the Pallas wrapper and the
    one-hot MXU matcher's granular fallback.

    Compaction is two-level (``_first_k_indices``), NOT ``jnp.nonzero``:
    nonzero's size-k lowering scatters all B*N source elements and costs
    ~42 ms at the bench shape on TPU (measured, round 4) — it silently
    dominated every GN step that had even one bad query. Round 4's
    flat-cumsum compaction cost ~1.6 ms; the two-level form (per-128
    popcounts + short cumsum + in-block rank search) replaces the
    full-length cumsum with one ~100x shorter."""
    b_total, n = tx.shape
    flat_idx, valid, _ = _first_k_indices(bad.reshape(-1), k_budget)
    b_i = flat_idx // n
    n_i = flat_idx % n
    txq = tx.reshape(-1)[flat_idx]
    tyq = ty.reshape(-1)[flat_idx]
    return _moment_corrections(quad, shape, txq, tyq, sin_t, cos_t,
                               points, b_i, n_i, valid, b_total)


def _moment_corrections(quad, shape, txq, tyq, sin_t, cos_t, points,
                        b_i, n_i, valid, b_total):
    """Shared tail of the granular repair: exact quad-gather moment
    contributions of K compacted queries, segment-summed into their
    hypotheses' 3x3 H and dTr. Flat-index DECODE differs between the
    row-major (bad_query_corrections) and transposed (_corrections_t)
    callers; the math here is the single copy both use."""
    m, gx, gy = interp_quad(quad, shape, jnp.stack([txq, tyq], axis=-1))
    pxq = points[n_i, 0]
    pyq = points[n_i, 1]
    s_q = sin_t[b_i]
    c_q = cos_t[b_i]
    rot = (-s_q * pxq - c_q * pyq) * gx + (c_q * pxq - s_q * pyq) * gy
    zero = jnp.float32(0.0)
    m = jnp.where(valid, m, zero)
    gx = jnp.where(valid, gx, zero)
    gy = jnp.where(valid, gy, zero)
    rot = jnp.where(valid, rot, zero)
    fun = jnp.where(valid, np.float32(1.0) - m, zero)
    terms = jnp.stack([gx * gx, gx * gy, gx * rot,
                       gy * gy, gy * rot, rot * rot,
                       gx * fun, gy * fun, rot * fun], axis=-1)  # [K, 9]
    corr = jax.ops.segment_sum(terms, b_i, num_segments=b_total)
    h_corr = jnp.stack([
        jnp.stack([corr[:, 0], corr[:, 1], corr[:, 2]], -1),
        jnp.stack([corr[:, 1], corr[:, 3], corr[:, 4]], -1),
        jnp.stack([corr[:, 2], corr[:, 4], corr[:, 5]], -1),
    ], -2)
    return h_corr, corr[:, 6:9]


def _corrections_t(quad, shape, txt, tyt, sin_t, cos_t, points, mask,
                   y0t, x0t, wr, wc, k_budget):
    """``bad_query_corrections`` in the TRANSPOSED layout, with the bad
    mask built lazily from the cached per-(beam, chunk) bases. The
    first-k order is beam-major (vs hypothesis-major in the row-major
    form) — when the budget holds, ALL bad queries are repaired either
    way, so totals differ only in f32 summation order."""
    n, b_total = txt.shape
    bad = _bad_mask_t(txt, tyt, mask, shape, y0t, x0t, wr, wc)
    flat_idx, valid, _ = _first_k_indices(bad.reshape(-1), k_budget)
    b_i = flat_idx % b_total
    n_i = flat_idx // b_total
    txq = txt.reshape(-1)[flat_idx]
    tyq = tyt.reshape(-1)[flat_idx]
    return _moment_corrections(quad, shape, txq, tyq, sin_t, cos_t,
                               points, b_i, n_i, valid, b_total)


def repair_moments_lazy(
    quad: jnp.ndarray,        # f32[H*W, 4] quad-packed prob grid
    shape: Tuple[int, int],
    txt: jnp.ndarray,         # f32[N, B] transposed query coords
    tyt: jnp.ndarray,
    sin_t: jnp.ndarray,       # f32[B]
    cos_t: jnp.ndarray,
    points: jnp.ndarray,      # f32[N, 2]
    mask: jnp.ndarray,        # bool[N]
    y0t: jnp.ndarray,         # i32[N, GC] per-(beam, chunk) window bases
    x0t: jnp.ndarray,
    hess: jnp.ndarray,        # f32[B, 3, 3] kernel output
    dtr: jnp.ndarray,         # f32[B, 3]
    n_bad: jnp.ndarray,       # i32[] the KERNEL's own bad count (row 9)
    k_budget: int, wr: int, wc: int,
):
    """Granular repair with a LAZY bad mask: the common no-bad-queries
    step pays nothing beyond the cond on the kernel's own overflow count
    — the [N, B] fit recheck, compaction, and quad-gather all live
    inside the cond (round-5 prologue optimization; round 4 computed the
    mask unconditionally every step). Returns (hess, dtr, overflowed).

    ``overflowed`` is True when n_bad > k_budget: the repair is then
    incomplete and the caller must take the full fallback path.
    """
    overflowed = n_bad > jnp.int32(k_budget)

    def no_bad(_):
        return hess, dtr

    def with_repair(_):
        h_corr, d_corr = _corrections_t(
            quad, shape, txt, tyt, sin_t, cos_t, points, mask,
            y0t, x0t, wr, wc, k_budget)
        return hess + h_corr, dtr + d_corr

    # gate on ~overflowed too: past the budget the repair is incomplete
    # and the caller discards it for the full fallback — don't run both
    # heavy paths on the worst-case step (round-3 ADVICE #4)
    hess2, dtr2 = jax.lax.cond((n_bad > 0) & ~overflowed,
                               with_repair, no_bad, None)
    return hess2, dtr2, overflowed


def repair_moments(
    quad: jnp.ndarray,        # f32[H*W, 4] quad-packed prob grid
    shape: Tuple[int, int],
    poses_map: jnp.ndarray,   # f32[B, 3] (same order the kernel saw)
    points: jnp.ndarray,      # f32[N, 2]
    mask: jnp.ndarray,        # bool[N]
    hess: jnp.ndarray,        # f32[B, 3, 3] kernel output
    dtr: jnp.ndarray,         # f32[B, 3]
    k_budget: int,
    s_per: int, wr: int, wc: int,
):
    """Standalone granular repair (validation/tooling seam): rebuilds the
    transposed prologue itself, counts bad queries, and delegates to
    ``repair_moments_lazy``. Production (gn_step_pallas) shares ONE
    prologue between kernel and repair instead. Returns
    (hess, dtr, n_bad, overflowed)."""
    txt, tyt, sin_t, cos_t = _transform_batch_t(poses_map, points)
    _, _, y0t, x0t = _window_bases_t(txt, tyt, mask, shape, s_per, wr, wc)
    bad = _bad_mask_t(txt, tyt, mask, shape, y0t, x0t, wr, wc)
    n_bad = jnp.sum(bad).astype(jnp.int32)
    hess2, dtr2, overflowed = repair_moments_lazy(
        quad, shape, txt, tyt, sin_t, cos_t, points, mask, y0t, x0t,
        hess, dtr, n_bad, k_budget, wr, wc)
    return hess2, dtr2, n_bad, overflowed
