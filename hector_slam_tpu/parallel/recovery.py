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
    b = hyp.shape[0]
    if b % group == 0 and top_k % group == 0 and top_k >= group:
        g_scores = jnp.min(res_c.reshape(-1, group), axis=1)
        g_scores = g_scores.at[0].set(-jnp.inf)   # incumbent's group
        _, g_idx = jax.lax.top_k(-g_scores, top_k // group)
        return hyp.reshape(-1, group, 3)[jnp.sort(g_idx)].reshape(-1, 3)
    res_c = res_c.at[0].set(-jnp.inf)             # incumbent survives
    _, idx = jax.lax.top_k(-res_c, top_k)
    return hyp[jnp.sort(idx)]


def auto_prune_top_k(n_hypotheses: int) -> int:
    """Default survivor count: a quarter of the batch, floored at one
    128-lane chunk; 0 (no pruning) below 512 hypotheses where the full
    batch is already cheap."""
    if n_hypotheses < 512:
        return 0
    return max(128, int(np.ceil(n_hypotheses / 4 / 128)) * 128)
