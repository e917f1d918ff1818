"""Cell models: how per-cell storage maps to probability and how the
per-scan free/occupied sets update it.

The reference ships three (map/GridMapLogOdds.h, map/GridMapSimpleCount.h,
map/GridMapReflectanceCount.h), selectable only by editing the GridMap
typedef (map/GridMap.h:39-41). Here they are a config field. All three
share the rasterized free/occ mask semantics (core/mapping.py); they
differ in storage, probability extraction, occupancy classification and
the per-cell delta rules:

  - ``log_odds`` (default): f32 log-odds per cell, init 0; prob =
    odds/(odds+1); occupied iff > 0; free add unclamped, occupied add
    clamped at 50 (GridMapLogOdds.h:135-167).
  - ``simple_count``: probability stored directly, init 0.5; occupied
    iff > 0.5; +0.15 occupied if below ``1 - 0.15 - 0.15/100``, -0.10
    free if above ``0.10 - 0.10/100`` (GridMapSimpleCount.h:101-148).
    Both clamp checks test the value from before this scan's update (the
    free delta is reverted before updateSetOccupied, like log-odds).
  - ``reflectance``: two f32 counters (visited, reflected) per cell,
    stored as a [2, H, W] array; prob = reflected/visited (0.5 before
    any visit); occupied iff prob > 0.5 (GridMapReflectanceCount.h:40-99).
    A free-marked cell gets visited+1; an occupied cell gets visited+1
    and reflected+1 (the reference's free-then-occupied revert nets to
    exactly that).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

LOG_ODDS = "log_odds"
SIMPLE_COUNT = "simple_count"
REFLECTANCE = "reflectance"
# gather-path marker: the grid already stores probabilities (a prob grid
# precomputed by prob_grid()); gathers read it verbatim
PROB = "prob"

# GridMapSimpleCountFunctions (GridMapSimpleCount.h:101-108)
_SC_FREE = np.float32(-0.10)
_SC_OCC = np.float32(0.15)
_SC_FREE_LIMIT = np.float32(-_SC_FREE + _SC_FREE / np.float32(100.0))
_SC_OCC_LIMIT = np.float32(1.0) - (_SC_OCC + _SC_OCC / np.float32(100.0))


def init_fill(model: str) -> float:
    """resetGridCell value (log-odds 0; probability models 0.5)."""
    return 0.0 if model == LOG_ODDS else 0.5


def storage_channels(model: str) -> int:
    return 2 if model == REFLECTANCE else 1


def storage_to_prob(values: jnp.ndarray, model: str) -> jnp.ndarray:
    """Gathered storage values -> probability (getGridProbability)."""
    if model == LOG_ODDS:
        odds = jnp.exp(values)
        return odds / (odds + jnp.float32(1.0))
    if model in (SIMPLE_COUNT, PROB):
        return values
    raise ValueError(f"gather-path prob undefined for {model}; use "
                     "reflectance_prob_grid first")


def prob_grid(storage: jnp.ndarray, model: str) -> jnp.ndarray:
    """Whole-grid storage -> probability conversion.

    The TPU-native replacement for the reference's lazy per-cell cache
    (map/GridMapCacheArray.h:80-90): one dense vectorized conversion per
    map epoch instead of a branch per gather. Per-cell conversion then
    gather is bitwise identical to gather then per-cell conversion, so
    matcher numerics are unchanged — but the hot GN loop's 4 gathers per
    beam become plain f32 reads with zero transcendentals.
    """
    if model == LOG_ODDS:
        odds = jnp.exp(storage)
        return odds / (odds + jnp.float32(1.0))
    if model in (SIMPLE_COUNT, PROB):
        return storage
    if model == REFLECTANCE:
        return reflectance_prob_grid(storage)
    raise ValueError(f"unknown cell model {model!r}")


def reflectance_prob_grid(storage: jnp.ndarray) -> jnp.ndarray:
    """[2, H, W] (visited, reflected) -> prob grid [H, W]; cells never
    visited read 0.5 (the reset value of probOccupied)."""
    visited = storage[0]
    reflected = storage[1]
    return jnp.where(visited > 0.0, reflected / jnp.maximum(visited, 1.0),
                     jnp.float32(0.5))


def apply_update(storage: jnp.ndarray, free_only: jnp.ndarray,
                 occ_set: jnp.ndarray, model: str,
                 log_odds_free: float, log_odds_occupied: float
                 ) -> jnp.ndarray:
    """Applies one scan's free/occupied cell sets to a level's storage.
    ``free_only`` must already exclude occupied cells (occupied wins)."""
    if model == LOG_ODDS:
        occ_applied = occ_set & (storage < np.float32(50.0))
        return (storage
                + jnp.where(free_only, jnp.float32(log_odds_free), 0.0)
                + jnp.where(occ_applied, jnp.float32(log_odds_occupied),
                            0.0))
    if model == SIMPLE_COUNT:
        free_applied = free_only & (storage > _SC_FREE_LIMIT)
        occ_applied = occ_set & (storage < _SC_OCC_LIMIT)
        return (storage
                + jnp.where(free_applied, _SC_FREE, 0.0)
                + jnp.where(occ_applied, _SC_OCC, 0.0))
    if model == REFLECTANCE:
        visited = storage[0] + free_only.astype(jnp.float32) \
            + occ_set.astype(jnp.float32)
        reflected = storage[1] + occ_set.astype(jnp.float32)
        return jnp.stack([visited, reflected])
    raise ValueError(f"unknown cell model {model!r}")


def is_occupied(storage: jnp.ndarray, model: str) -> jnp.ndarray:
    if model == LOG_ODDS:
        return storage > 0.0
    if model == SIMPLE_COUNT:
        return storage > 0.5
    if model == REFLECTANCE:
        return reflectance_prob_grid(storage) > 0.5
    raise ValueError(model)


def is_free(storage: jnp.ndarray, model: str) -> jnp.ndarray:
    if model == LOG_ODDS:
        return storage < 0.0
    if model == SIMPLE_COUNT:
        return storage < 0.5
    if model == REFLECTANCE:
        p = reflectance_prob_grid(storage)
        return (p < 0.5) & (storage[0] > 0.0)
    raise ValueError(model)
