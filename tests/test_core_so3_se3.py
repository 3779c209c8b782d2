import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsc

from fastliosam_tpu.core import so3, se3


def random_rotvecs(rng, n, scale=2.5):
    return rng.normal(size=(n, 3)) * scale


def test_exp_matches_scipy(rng):
    w = random_rotvecs(rng, 64).astype(np.float32)
    R = np.asarray(so3.exp(jnp.asarray(w)))
    R_ref = Rsc.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_log_roundtrip(rng):
    # restrict to |w| < pi where log is the principal inverse of exp
    w = random_rotvecs(rng, 128, scale=1.0).astype(np.float32)
    w = np.where(
        np.linalg.norm(w, axis=-1, keepdims=True) < 3.0, w, w * 0.3
    ).astype(np.float32)
    w_rt = np.asarray(so3.log(so3.exp(jnp.asarray(w))))
    np.testing.assert_allclose(w_rt, w, atol=1e-4)


def test_log_exp_consistency_large_angles(rng):
    # for any rotation, exp(log(R)) == R even past pi
    w = random_rotvecs(rng, 64, scale=3.0).astype(np.float32)
    R = so3.exp(jnp.asarray(w))
    R_rt = so3.exp(so3.log(R))
    np.testing.assert_allclose(np.asarray(R_rt), np.asarray(R), atol=1e-3)


def test_log_near_pi(rng):
    axes = rng.normal(size=(32, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    w = (axes * (np.pi - 1e-4)).astype(np.float32)
    R = Rsc.from_rotvec(w).as_matrix().astype(np.float32)
    w_rec = np.asarray(so3.log(jnp.asarray(R)))
    R_rec = Rsc.from_rotvec(w_rec).as_matrix()
    np.testing.assert_allclose(R_rec, R, atol=1e-3)


def test_small_angle_exp_log():
    w = jnp.array([[1e-9, -1e-9, 1e-10], [0.0, 0.0, 0.0]], dtype=jnp.float32)
    R = so3.exp(w)
    np.testing.assert_allclose(np.asarray(R), np.eye(3)[None].repeat(2, 0), atol=1e-6)
    assert np.all(np.isfinite(np.asarray(so3.log(R))))


def test_quat_matrix_roundtrip(rng):
    w = random_rotvecs(rng, 64).astype(np.float32)
    R = so3.exp(jnp.asarray(w))
    q = so3.matrix_to_quat(R)
    R2 = so3.quat_to_matrix(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_quat_mul_matches_matrix(rng):
    wa = random_rotvecs(rng, 16).astype(np.float32)
    wb = random_rotvecs(rng, 16).astype(np.float32)
    Ra, Rb = so3.exp(jnp.asarray(wa)), so3.exp(jnp.asarray(wb))
    q = so3.quat_mul(so3.matrix_to_quat(Ra), so3.matrix_to_quat(Rb))
    np.testing.assert_allclose(
        np.asarray(so3.quat_to_matrix(q)), np.asarray(Ra @ Rb), atol=1e-5
    )


def test_left_jacobian_inverse(rng):
    w = jnp.asarray(random_rotvecs(rng, 32, scale=1.5).astype(np.float32))
    J = so3.left_jacobian(w)
    Jinv = so3.left_jacobian_inv(w)
    prod = np.asarray(J @ Jinv)
    np.testing.assert_allclose(prod, np.eye(3)[None].repeat(32, 0), atol=1e-4)


def random_poses(rng, n):
    w = random_rotvecs(rng, n, 1.5).astype(np.float32)
    t = rng.normal(size=(n, 3)).astype(np.float32) * 10
    return se3.make(so3.exp(jnp.asarray(w)), jnp.asarray(t))


def test_se3_inverse_compose(rng):
    T = random_poses(rng, 32)
    eye = np.asarray(se3.compose(T, se3.inverse(T)))
    np.testing.assert_allclose(eye, np.eye(4)[None].repeat(32, 0), atol=1e-4)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(64, 6)).astype(np.float32)
    # keep the rotation block inside the principal branch |theta| < pi
    xi[:, 3:] *= 0.8
    xi = jnp.asarray(xi)
    xi_rt = np.asarray(se3.log(se3.exp(xi)))
    np.testing.assert_allclose(xi_rt, np.asarray(xi), atol=2e-4)


def test_between_and_local(rng):
    A = random_poses(rng, 16)
    B = random_poses(rng, 16)
    rel = se3.between(A, B)
    np.testing.assert_allclose(
        np.asarray(se3.compose(A, rel)), np.asarray(B), atol=1e-3
    )
    xi = se3.local(A, B)
    np.testing.assert_allclose(
        np.asarray(se3.retract(A, xi)), np.asarray(B), atol=1e-3
    )


def test_apply_and_inverse(rng):
    T = random_poses(rng, 4)
    pts = jnp.asarray(rng.normal(size=(4, 100, 3)).astype(np.float32))
    back = se3.apply_inverse(T, se3.apply(T, pts))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_adjoint_identity(rng):
    # Adj(T) xi == Log(T Exp(xi) T^-1) for small xi
    T = random_poses(rng, 8)
    xi = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32) * 1e-3)
    lhs = jnp.einsum("nij,nj->ni", se3.adjoint(T), xi)
    rhs = se3.log(se3.compose(se3.compose(T, se3.exp(xi)), se3.inverse(T)))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)
