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
    """Determinant of [..., 3, 3] exactly as Eigen's fixed-size inverse
    computes it (InverseImpl.h compute_inverse<.,.,3>): column-0
    cofactors, products cof*m, RIGHT-associated sum p0 + (p1 + p2) —
    verified bitwise vs the compiled reference (native/refbuild)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    c00 = e * i - f * h          # cofactor<0,0>
    c10 = h * c - i * b          # cofactor<1,0>
    c20 = b * f - c * e          # cofactor<2,0>
    return c00 * a + (c10 * d + c20 * g)


def solve3(hess: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """x = H^-1 @ rhs for [..., 3, 3] and [..., 3].

    No internal guard: a singular H yields inf/nan exactly as Eigen's
    ``inverse()`` would — the caller applies the reference's
    H(0,0)!=0 && H(1,1)!=0 guard (ScanMatcher.h:201) via ``where``.
    """
    adj = adjugate3(hess)
    det = det3(hess)
    # Eigen rounds each inverse entry as cofactor * (1/det) — multiply by
    # the rounded reciprocal, not divide (InverseImpl.h
    # compute_inverse_size3_helper) — and contracts the matvec
    # RIGHT-associated: i0*b0 + (i1*b1 + i2*b2); spelled out so XLA keeps
    # the association (both verified bitwise vs the compiled reference,
    # native/refbuild)
    inv = adj * (jnp.float32(1.0) / det)[..., None, None]
    return inv[..., :, 0] * rhs[..., None, 0] + (
        inv[..., :, 1] * rhs[..., None, 1]
        + inv[..., :, 2] * rhs[..., None, 2])
