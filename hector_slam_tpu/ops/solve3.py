"""Closed-form 3x3 linear solve for the Gauss-Newton normal equations.

Replaces Eigen's cofactor-based ``Matrix3f::inverse()`` used at
ScanMatcher.h:205 with the same adjugate formulation in float32 — a handful
of VPU flops, trivially batchable, no LAPACK/loop machinery.
"""

from __future__ import annotations

import jax.numpy as jnp


def adjugate3(m: jnp.ndarray) -> jnp.ndarray:
    """Transposed cofactor matrix of a [..., 3, 3] array."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    row0 = jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], axis=-1)
    row1 = jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], axis=-1)
    row2 = jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def det3(m: jnp.ndarray) -> jnp.ndarray:
    """Determinant of [..., 3, 3] via first-row cofactor expansion (Eigen's
    fixed-size order)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    return a * (e * i - f * h) + b * (f * g - d * i) + c * (d * h - e * g)


def solve3(hess: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """x = H^-1 @ rhs for [..., 3, 3] and [..., 3].

    No internal guard: a singular H yields inf/nan exactly as Eigen's
    ``inverse()`` would — the caller applies the reference's
    H(0,0)!=0 && H(1,1)!=0 guard (ScanMatcher.h:201) via ``where``.
    """
    adj = adjugate3(hess)
    det = det3(hess)
    inv = adj / det[..., None, None]
    return jnp.einsum("...ij,...j->...i", inv, rhs)
