"""Batched SE(3) operations on (R, t) pairs and 4x4 matrices.

Capability equivalent of the reference's pose plumbing
(`utilities.hpp:34-156`: Eigen<->GTSAM<->msg conversions, transformPcd,
`pose.between`) — redesigned as batched, jit-safe array ops. Poses are either
  * a pair ``(R, t)`` with ``R (..., 3, 3)`` and ``t (..., 3)``, or
  * a homogeneous matrix ``T (..., 4, 4)``.
Tangent vectors are ``(..., 6)`` ordered ``[rho(3), theta(3)]`` (translation
first, rotation second) to match the factor ordering used in `pgo/`.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import so3


def make(R, t):
    """(R, t) -> 4x4 homogeneous matrix."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def rot(T):
    return T[..., :3, :3]


def trans(T):
    return T[..., :3, 3]


def inverse(T):
    Rt = jnp.swapaxes(T[..., :3, :3], -1, -2)
    t = T[..., :3, 3]
    return make(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def compose(A, B):
    """A @ B for 4x4 pose matrices (matmul, broadcasting)."""
    return A @ B


def between(A, B):
    """Relative pose A^{-1} B (GTSAM ``Pose3::between`` semantics,
    cf. reference `fast_lio_sam.cpp:470` odom factor construction)."""
    return compose(inverse(A), B)


def apply(T, pts):
    """Transform points: T (..., 4, 4), pts (..., N, 3) -> (..., N, 3).

    Equivalent of the reference `transformPcd` (`utilities.hpp:131-142`).
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def apply_inverse(T, pts):
    """Inverse-transform points (reference `transformPcd_inverse`,
    `utilities.hpp:144-156`)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ji,...nj->...ni", R, pts - t[..., None, :])


def exp(xi):
    """SE(3) exponential. xi (..., 6) = [rho, theta] -> T (..., 4, 4)."""
    rho, theta = xi[..., :3], xi[..., 3:]
    R = so3.exp(theta)
    J = so3.left_jacobian(theta)
    t = jnp.einsum("...ij,...j->...i", J, rho)
    return make(R, t)


def log(T):
    """SE(3) logarithm. T (..., 4, 4) -> xi (..., 6) = [rho, theta]."""
    theta = so3.log(T[..., :3, :3])
    Jinv = so3.left_jacobian_inv(theta)
    rho = jnp.einsum("...ij,...j->...i", Jinv, T[..., :3, 3])
    return jnp.concatenate([rho, theta], axis=-1)


def retract(T, xi):
    """Right-retract: T * Exp(xi) — the local update used by the PGO solver."""
    return compose(T, exp(xi))


def local(A, B):
    """Local coordinates of B in the tangent at A: Log(A^{-1} B)."""
    return log(between(A, B))


def adjoint(T):
    """Adjoint of T (..., 4, 4) -> (..., 6, 6), tangent order [rho, theta]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    batch = T.shape[:-2]
    Ad = jnp.zeros(batch + (6, 6), dtype=T.dtype)
    Ad = Ad.at[..., :3, :3].set(R)
    Ad = Ad.at[..., :3, 3:].set(so3.hat(t) @ R)
    Ad = Ad.at[..., 3:, 3:].set(R)
    return Ad


def from_quat_trans(q, t):
    """Quaternion [w,x,y,z] + translation -> 4x4 matrix (msg -> Eigen
    conversion capability, reference `pose_pcd.hpp:27-33`)."""
    return make(so3.quat_to_matrix(q), t)


def to_quat_trans(T):
    return so3.matrix_to_quat(T[..., :3, :3]), T[..., :3, 3]
