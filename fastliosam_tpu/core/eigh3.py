"""Closed-form eigendecomposition of batched symmetric 3x3 matrices.

Used for plane fitting from voxel second moments (the TPU-native replacement
for the reference's PCL 5-NN plane fit inside FAST-LIO's point-to-plane match,
SURVEY.md §3.6). Fully vectorized: no `eigh` host fallbacks, no dynamic
control flow — safe inside `jit`, `vmap`, and Pallas-adjacent code.

Algorithm: analytic eigenvalues via the trigonometric solution of the cubic
characteristic polynomial (Smith's method), then eigenvectors via cross
products of shifted matrices, with degenerate cases resolved by picking the
largest-norm candidate column.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def eigvalsh3(A):
    """Eigenvalues of symmetric (..., 3, 3), ascending: (..., 3)."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * (
        a01 * a01 + a02 * a02 + a12 * a12
    )
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, _EPS))
    # det(B)/2 where B = (A - qI)/p
    inv_p = 1.0 / p
    c00, c11, c22 = b00 * inv_p, b11 * inv_p, b22 * inv_p
    c01, c02, c12 = a01 * inv_p, a02 * inv_p, a12 * inv_p
    half_det = 0.5 * (
        c00 * (c11 * c22 - c12 * c12)
        - c01 * (c01 * c22 - c12 * c02)
        + c02 * (c01 * c12 - c11 * c02)
    )
    half_det = jnp.clip(half_det, -1.0, 1.0)
    phi = jnp.arccos(half_det) / 3.0
    two_pi_3 = 2.0943951023931953
    lam2 = q + 2.0 * p * jnp.cos(phi)
    lam0 = q + 2.0 * p * jnp.cos(phi + two_pi_3)
    lam1 = 3.0 * q - lam0 - lam2
    return jnp.stack([lam0, lam1, lam2], axis=-1)


def _eigvec(A, lam, other1, other2):
    """Eigenvector for eigenvalue `lam` via (A - o1 I)(A - o2 I) columns.

    For a symmetric A with eigenvalues {lam, o1, o2}, the matrix
    (A - o1 I)(A - o2 I) has columns proportional to the eigenvector of lam.
    Pick the largest column for stability.
    """
    eye = jnp.eye(3, dtype=A.dtype)
    M = (A - other1[..., None, None] * eye) @ (A - other2[..., None, None] * eye)
    norms = jnp.sum(M * M, axis=-2)  # column norms (..., 3)
    k = jnp.argmax(norms, axis=-1)
    col = jnp.take_along_axis(M, k[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    n = jnp.linalg.norm(col, axis=-1, keepdims=True)
    # Degenerate (repeated eigenvalues): fall back to e_x; caller gates on
    # planarity anyway so an arbitrary-but-unit vector is fine.
    fallback = jnp.zeros_like(col).at[..., 0].set(1.0)
    safe = n[..., 0] > 1e-20
    return jnp.where(safe[..., None], col / jnp.maximum(n, _EPS), fallback)


def eigh3(A):
    """Full decomposition of symmetric (..., 3, 3).

    Returns ``(eigvals (..., 3) ascending, eigvecs (..., 3, 3))`` with
    ``eigvecs[..., :, i]`` the unit eigenvector of ``eigvals[..., i]``.
    """
    lam = eigvalsh3(A)
    l0, l1, l2 = lam[..., 0], lam[..., 1], lam[..., 2]
    v0 = _eigvec(A, l0, l1, l2)
    v2 = _eigvec(A, l2, l0, l1)
    v1 = jnp.cross(v2, v0)
    n1 = jnp.linalg.norm(v1, axis=-1, keepdims=True)
    v1 = v1 / jnp.maximum(n1, _EPS)
    V = jnp.stack([v0, v1, v2], axis=-1)
    return lam, V


def smallest_eigvec3(A):
    """Unit eigenvector of the smallest eigenvalue (the plane normal) plus
    all three eigenvalues: ``(normal (..., 3), eigvals (..., 3))``."""
    lam = eigvalsh3(A)
    v0 = _eigvec(A, lam[..., 0], lam[..., 1], lam[..., 2])
    return v0, lam
