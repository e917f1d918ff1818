"""Checkpoint/resume: the whole SLAM state is one pytree, so a checkpoint
is just its serialized leaves. The reference has NO checkpointing at all
(SURVEY.md §5 — only reset + export artifacts); this is a capability the
functional core gets for free.

npz is the default (self-contained, no deps); orbax is used when
available for async/distributed checkpointing of fleet states.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..types import SlamState


def save_state(path: str, state: SlamState) -> None:
    # quads are derived data (cached prob grids, 4x the map size):
    # excluded from the checkpoint and recomputed on load
    slim = state._replace(quads=())
    leaves, _ = jax.tree.flatten(slim)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["num_levels"] = np.asarray(len(state.log_odds))
    np.savez_compressed(path, **arrays)


def load_state(path: str, cfg: SlamConfig,
               template: Optional[SlamState] = None) -> SlamState:
    """``template``: the expected state structure — defaults to a fresh
    single-robot ``init_state(cfg)``; pass ``init_fleet(cfg, R)`` or
    ``init_shared_fleet(cfg, R)`` to restore batched fleet states (their
    pose/covariance leaves carry a leading robot axis)."""
    from ..core.slam import _quads_of, init_state
    if template is None:
        template = init_state(cfg)
    template = template._replace(quads=())
    template_leaves, treedef = jax.tree.flatten(template)
    with np.load(path) as z:
        n = int(z["num_levels"])
        if n != cfg.map.levels:
            raise ValueError(
                f"checkpoint has {n} pyramid levels, config wants "
                f"{cfg.map.levels}")
        leaves = [jnp.asarray(z[f"leaf_{i}"])
                  for i in range(len(template_leaves))]
    state = jax.tree.unflatten(treedef, leaves)
    for got, want in zip(jax.tree.leaves(state), jax.tree.leaves(template)):
        if got.shape != want.shape:
            raise ValueError(
                f"checkpoint leaf shape {got.shape} != config {want.shape}")
    return state._replace(
        quads=_quads_of(state.log_odds, cfg.update.cell_model))


def save_state_orbax(path: str, state: SlamState) -> bool:
    """Orbax variant (returns False when orbax is unavailable)."""
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return False
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    return True


def load_state_orbax(path: str, cfg: SlamConfig) -> Optional[SlamState]:
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return None
    from ..core.slam import init_state
    from ..core.slam import _quads_of
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(path),
                             item=init_state(cfg))
    return restored._replace(
        quads=_quads_of(restored.log_odds, cfg.update.cell_model))
