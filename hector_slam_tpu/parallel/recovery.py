"""Shared device-side recovery machinery: coarse-level hypothesis
pruning for the batched relocalizers (round-5, VERDICT #1 alternative —
"prune coarse-to-fine: score all B on the coarsest level, keep top-k for
the full pyramid").

Why pruning, not sorting: at kidnap-scale spreads (sigma 0.5 m /
0.3 rad) a 128-lane chunk of the VMEM matcher must span enough theta x y
that its [24, 256] window overflows GEOMETRICALLY — no hypothesis
ordering fixes that (measured round 4, commit b7263ee), and the full
quad fallback costs ~5.2 ms per GN step at B=1024 (round-5 measurement,
tools/bench_relocalize.py). The coarsest level is different: cells are
2^(L-1) x larger, so the SAME metric spread is 4x fewer cells and one
cheap residual pass there separates plausible poses from hopeless ones.
Refined survivors cluster around local optima, so the fine levels see
tight chunks and the kernel stays engaged.

Reference basis: getResidualForState (OccGridMapUtil.h:204-221) is the
scoring rule; the pyramid's coarse-first philosophy is
MapRepMultiMap::matchData (MapRepMultiMap.h:116-132).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..types import Scan
from .batch import residual_for_poses


def prune_hypotheses_coarse(
    log_odds_pyramid,
    hyp: jnp.ndarray,          # f32[B, 3] world poses; slot 0 = incumbent
    scan: Scan,
    cfg: SlamConfig,
    top_k: int,
    beam_stride: int = 4,
    quads=None,
    group: int = 128,
) -> jnp.ndarray:
    """Keep the ``top_k`` hypotheses by coarsest-level map residual
    (beam-subsampled scan), ALWAYS retaining slot 0 (the incumbent — the
    acceptance bar downstream compares against it). Pure device ops —
    jit/scan safe.

    When the batch is ``group``-aligned (the theta-stratified sampler's
    128-lane chunks), pruning keeps whole GROUPS, scored by their best
    member: dropping individual hypotheses would interleave the
    surviving headings inside the matcher's 128-lane chunks and
    reopen the window-overflow geometry the stratified sampling closed
    (measured: element-pruned survivors refined SLOWER than an
    unpruned theta-aligned prefix — 84 vs 62 ms/batch). Group pruning
    keeps each surviving heading's full xy scatter AND exact chunk
    alignment; the incumbent's group is forced to survive. Falls back
    to element-wise top-k for unaligned batches."""
    coarse = cfg.map.levels - 1
    sub = Scan(points=scan.points[::beam_stride], origo=scan.origo,
               mask=scan.mask[::beam_stride])
    res_c = residual_for_poses(
        log_odds_pyramid[coarse], hyp, sub, cfg,
        quad=quads[coarse] if quads is not None and len(quads) > coarse
        else None,
        level=coarse)
    return _select_top(hyp, res_c, top_k, group)


def _select_top(hyp: jnp.ndarray, scores: jnp.ndarray, top_k: int,
                group: int = 128) -> jnp.ndarray:
    """Top-k selection preserving the matcher's 128-lane chunk
    structure: when shapes align, whole GROUPS are kept (scored by best
    member) so every surviving chunk stays heading-coherent; slot 0's
    group (the incumbent) is always forced. Element-wise top-k
    otherwise."""
    b = hyp.shape[0]
    if b % group == 0 and top_k % group == 0 and top_k >= group:
        g_scores = jnp.min(scores.reshape(-1, group), axis=1)
        g_scores = g_scores.at[0].set(-jnp.inf)   # incumbent's group
        _, g_idx = jax.lax.top_k(-g_scores, top_k // group)
        return hyp.reshape(-1, group, 3)[jnp.sort(g_idx)].reshape(-1, 3)
    scores = scores.at[0].set(-jnp.inf)           # incumbent survives
    _, idx = jax.lax.top_k(-scores, top_k)
    return hyp[jnp.sort(idx)]


def cascade_refine(
    log_odds_pyramid,
    hyp: jnp.ndarray,          # f32[B, 3]; slot 0 = incumbent
    scan: Scan,
    cfg: SlamConfig,
    k_budget: int = 8192,
    quads=None,
    interpret: bool = False,
    mid_top_k: int = 256,
    beam_stride: int = 4,
    wr: int = 64,
):
    """Cascaded wide-spread refinement through the Pallas matcher
    (round-5): refine ALL hypotheses on the COARSEST level only (where
    metric spread is few cells and the VMEM kernel engages), re-select
    the best ``mid_top_k`` by next-finer-level residual (incumbent
    forced), then run the remaining fine levels on that clustered set.

    Why: measured per-level telemetry at kidnap spread (sigma 0.5 m /
    0.3 rad, B=256 group-pruned survivors) shows the coarsest level
    fully engaged (hundreds-to-thousands of repaired queries per step)
    while EVERY fine-level step budget-overflows to the 1.3-5.9 ms quad
    fallback — the non-converged stragglers keep every 128-lane chunk's
    window spread past geometry. Selecting after coarse convergence
    removes the stragglers; the survivors cluster, and the fine levels
    stay on the fast path.

    ``wr``: the kernel window HEIGHT for recovery (default 64 vs the
    tracking default 24). Measured at a partially-converged recovery
    population (theta spread 0.05 rad, y spread 4 cells, B=256, beam
    radius 300 cells): wr=24 overflows wholesale (3.1 ms/step via the
    fallback), wr=48 engages with repairs (1.8 ms), wr=64 has ZERO
    window-overflow queries (0.21 ms/step — 15x). Taller windows cost
    more VPU selects per query, which tight tracking spreads notice but
    recovery spreads never do.

    Exactness: per-hypothesis numerics are the full pyramid schedule
    exactly (coarse levels then fine levels chain world poses the same
    way); the cascade only DROPS challengers between levels, and the
    incumbent always survives, so the acceptance contract downstream is
    unchanged. Returns (MatchResult over the final survivor set,
    MatchDiag summed over both stages).
    """
    from .pallas_match import MatchDiag, match_hypotheses_pallas
    levels = cfg.map.levels
    coarse = levels - 1
    if levels == 1:
        return match_hypotheses_pallas(
            log_odds_pyramid, hyp, scan, cfg, k_budget=k_budget,
            interpret=interpret, quads=quads, wr=wr)
    mid_top_k = min(mid_top_k, hyp.shape[0])

    res1, d1 = match_hypotheses_pallas(
        log_odds_pyramid, hyp, scan, cfg, k_budget=k_budget,
        interpret=interpret, quads=quads, wr=wr,
        max_level=coarse, min_level=coarse)

    lvl = coarse - 1
    sub = Scan(points=scan.points[::beam_stride], origo=scan.origo,
               mask=scan.mask[::beam_stride])
    r = residual_for_poses(
        log_odds_pyramid[lvl], res1.pose, sub, cfg,
        quad=quads[lvl] if quads is not None and len(quads) > lvl
        else None,
        level=lvl)
    b = res1.pose.shape[0]
    if b % 128 == 0 and mid_top_k % 128 == 0 and mid_top_k >= 128:
        # keep whole groups (chunk-coherent headings; element top-k
        # interleaves headings inside a chunk and reopens theta
        # overflow — measured frac 0.31), then REPLACE each kept
        # group's straggler half with copies of its best member:
        # samples that never found a gradient at the coarse level stay
        # at their wide initial scatter and alone blow every fine-level
        # window (measured: all L1/L0 steps overflowed even with
        # coherent groups). A copy of a better hypothesis is exact for
        # the final argmin and collapses the chunk's window extent.
        gk = mid_top_k // 128
        r_g0 = r.reshape(-1, 128)
        g_scores = jnp.min(r_g0, axis=1).at[0].set(-jnp.inf)
        _, g_idx = jax.lax.top_k(-g_scores, gk)
        g_idx = jnp.sort(g_idx)
        poses_g = res1.pose.reshape(-1, 128, 3)[g_idx]      # [gk,128,3]
        s_g = r_g0[g_idx]
        keep = 64
        kth = jnp.sort(s_g, axis=1)[:, keep - 1]
        best = jnp.argmin(s_g, axis=1)
        best_pose = poses_g[jnp.arange(gk), best]           # [gk, 3]
        # replacement rule = score OR geometric TRUST REGION around the
        # group's best member. Score alone is not enough: the coarse GN
        # steps scatter theta by up to clamp x iterations (+-0.8 rad)
        # and corridor-style aliasing keeps some scattered members
        # score-competitive at the subsampled mid residual — measured
        # post-replacement group theta extents of 0.5-0.8 rad, which
        # overflow even the wr=64 recovery windows (extent tolerance
        # ~= (wr-8) / beam radius ~= 0.09 rad at 600 cells). The trust
        # region bounds the chunk's window extent BY CONSTRUCTION:
        # |dtheta| <= 0.025 rad and |dy| <= 0.3 m around the best.
        d_th = jnp.abs(poses_g[..., 2] - best_pose[:, None, 2])
        d_y = jnp.abs(poses_g[..., 1] - best_pose[:, None, 1])
        repl = (s_g > kth[:, None]) | (d_th > 0.025) | (d_y > 0.3)
        repl = repl.at[0, 0].set(False)     # the incumbent is never
        #   replaced: it is the acceptance bar (slot 0 of group 0,
        #   whose -inf group score pins it to position 0 after sort)
        surv = jnp.where(repl[..., None], best_pose[:, None, :],
                         poses_g).reshape(-1, 3)
    else:
        surv = _select_top(res1.pose, r, mid_top_k)

    res2, d2 = match_hypotheses_pallas(
        log_odds_pyramid, surv, scan, cfg, k_budget=k_budget,
        interpret=interpret, quads=quads, wr=wr,
        max_level=lvl, min_level=0)
    diag = MatchDiag(*(a + b for a, b in zip(d1, d2)))
    return res2, diag


cascade_refine_jit = jax.jit(
    cascade_refine,
    static_argnames=("cfg", "k_budget", "interpret", "mid_top_k",
                     "beam_stride", "wr"))


def auto_prune_top_k(n_hypotheses: int) -> int:
    """Default survivor count: a quarter of the batch, floored at one
    128-lane chunk; 0 (no pruning) below 512 hypotheses where the full
    batch is already cheap."""
    if n_hypotheses < 512:
        return 0
    return max(128, int(np.ceil(n_hypotheses / 4 / 128)) * 128)
