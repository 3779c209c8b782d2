"""IMU forward propagation and back-propagation motion compensation (deskew).

TPU-native equivalent of FAST-LIO2's IMU processing (SURVEY.md §3.6): a
`lax.scan` over a fixed-capacity masked IMU batch propagates the nav state
and 18x18 covariance; the recorded intermediate poses deskew each LiDAR
point into the scan-end body frame via vectorized interval lookup
(`searchsorted`) — no per-point host loops.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import so3
from .state import NavState, OdomConfig


class ImuBatch(NamedTuple):
    """Fixed-capacity IMU samples covering one scan interval.

    ``stamps`` are seconds relative to the previous scan end, ascending;
    masked-out lanes must be at the tail.
    """

    stamps: jnp.ndarray  # (M,)
    gyro: jnp.ndarray  # (M, 3) rad/s
    acc: jnp.ndarray  # (M, 3) m/s^2 (specific force)
    mask: jnp.ndarray  # (M,)


def _interval_dts(imu: ImuBatch, scan_dt):
    # integration interval for sample i: [t_i, t_{i+1}); the last *valid*
    # sample integrates up to scan_dt (padded lanes contribute dt = 0)
    next_valid = jnp.concatenate([imu.mask[1:], jnp.zeros((1,), bool)])
    t_next = jnp.concatenate(
        [imu.stamps[1:], jnp.zeros((1,), imu.stamps.dtype)]
    )
    t_next = jnp.where(next_valid, t_next, scan_dt)
    return jnp.where(imu.mask, jnp.clip(t_next - imu.stamps, 0.0, 1.0), 0.0)


def propagate(x: NavState, imu: ImuBatch, cfg: OdomConfig, scan_dt):
    """Propagate state+covariance through the IMU batch up to ``scan_dt``.

    Returns ``(state_at_scan_end, traj)`` where ``traj`` holds the
    intermediate states at each IMU stamp for deskewing:
    ``(R (M,3,3), p (M,3), v (M,3), w (M,3), a_w (M,3), t (M,))``.

    Parallel-prefix formulation: a per-scan IMU batch is a short (≤32)
    strictly sequential recursion, which on TPU is latency-bound, not
    FLOP-bound. Rotations compose as an ``associative_scan`` of 3x3
    products, velocity/position as cumulative sums, and the covariance
    recursion ``P ← F P Fᵀ + Q`` as an associative scan over transition
    pairs ``(F, Q)`` — log₂(M) depth instead of M dependent steps.
    Matches :func:`propagate_sequential` (tested) because the per-step
    model is identical; only the evaluation order changes.
    """
    dts = _interval_dts(imu, scan_dt)
    M = dts.shape[0]

    w = imu.gyro - x.bg  # (M, 3) bias-corrected rates
    a = imu.acc - x.ba  # (M, 3) specific force
    dR = so3.exp(w * dts[:, None])  # (M, 3, 3) per-interval increments

    # attitude: inclusive prefix products dR_0 … dR_k, then the exclusive
    # prefix R_k = R0 · Π_{i<k} dR_i (state at the START of interval k,
    # matching the sequential scan's recorded trajectory)
    Mprod = jax.lax.associative_scan(jnp.matmul, dR)
    R_incl = x.R[None] @ Mprod  # (M, 3, 3)
    R_excl = jnp.concatenate([x.R[None], R_incl[:-1]], axis=0)

    a_w = jnp.einsum("mij,mj->mi", R_excl, a) + x.g  # world accel per interval
    dv = a_w * dts[:, None]
    v_incl = x.v[None] + jnp.cumsum(dv, axis=0)
    v_excl = jnp.concatenate([x.v[None], v_incl[:-1]], axis=0)
    dp = v_excl * dts[:, None] + 0.5 * a_w * dts[:, None] ** 2
    p_incl = x.p[None] + jnp.cumsum(dp, axis=0)
    p_excl = jnp.concatenate([x.p[None], p_incl[:-1]], axis=0)

    # covariance: batched F_k/Q_k then associative composition
    #   (F2,Q2)∘(F1,Q1) = (F2 F1, F2 Q1 F2ᵀ + Q2)
    eye3 = jnp.eye(3, dtype=jnp.float32)
    F = jnp.broadcast_to(jnp.eye(24, dtype=jnp.float32), (M, 24, 24))
    dt3 = dts[:, None, None]
    F = F.at[:, 0:3, 0:3].set(jnp.swapaxes(dR, -1, -2))
    F = F.at[:, 0:3, 9:12].set(-eye3 * dt3)
    F = F.at[:, 3:6, 6:9].set(eye3 * dt3)
    F = F.at[:, 6:9, 0:3].set(
        -jnp.einsum("mij,mjk->mik", R_excl, so3.hat(a)) * dt3
    )
    F = F.at[:, 6:9, 12:15].set(-R_excl * dt3)
    F = F.at[:, 6:9, 15:18].set(eye3 * dt3)
    Q = jnp.zeros((M, 24, 24), jnp.float32)
    dt2 = (dts * dts)[:, None, None]
    Q = Q.at[:, 0:3, 0:3].set(eye3 * cfg.gyr_cov * dt2)
    Q = Q.at[:, 6:9, 6:9].set(eye3 * cfg.acc_cov * dt2)
    Q = Q.at[:, 9:12, 9:12].set(eye3 * cfg.b_gyr_cov * dt2)
    Q = Q.at[:, 12:15, 12:15].set(eye3 * cfg.b_acc_cov * dt2)

    # only the FINAL (F_tot, Q_tot) is needed (intermediate covariances are
    # never read), so a log-depth pairwise tree reduction does half the work
    # of a full associative prefix scan. These 24x24 compositions run at
    # default matmul precision even under the geometry-precision policy:
    # covariance products tolerate bf16 (process noise dominates), and the
    # 3-pass f32 mode doubled the propagate latency for nothing.
    def compose(left, right):
        Fa, Qa = left
        Fb, Qb = right
        FbT = jnp.swapaxes(Fb, -1, -2)
        mm = lambda a, b: jnp.matmul(a, b, precision="default")
        return mm(Fb, Fa), mm(mm(Fb, Qa), FbT) + Qb

    Mp = M
    Fr, Qr = F, Q
    while Mp > 1:
        if Mp % 2:  # pad with the identity element (F=I, Q=0)
            Fr = jnp.concatenate(
                [Fr, jnp.eye(24, dtype=jnp.float32)[None]], axis=0
            )
            Qr = jnp.concatenate(
                [Qr, jnp.zeros((1, 24, 24), jnp.float32)], axis=0
            )
            Mp += 1
        # element 2k happens first, 2k+1 second: right ∘ left
        Fr, Qr = compose((Fr[0::2], Qr[0::2]), (Fr[1::2], Qr[1::2]))
        Mp //= 2
    F_tot, Q_tot = Fr[0], Qr[0]
    P_e = F_tot @ x.P @ F_tot.T + Q_tot

    x_end = x._replace(
        R=so3.normalize_matrix(R_incl[-1]),
        p=p_incl[-1],
        v=v_incl[-1],
        P=P_e,
    )
    traj = (R_excl, p_excl, v_excl, w, a_w, imu.stamps)
    return x_end, traj


def propagate_sequential(x: NavState, imu: ImuBatch, cfg: OdomConfig, scan_dt):
    """Reference sequential `lax.scan` propagation — the textbook recursion
    the parallel-prefix :func:`propagate` must reproduce (kept for
    equivalence testing)."""
    dts = _interval_dts(imu, scan_dt)

    def step(carry, inp):
        R, p, v, P = carry
        gyro, acc, dt = inp
        w = gyro - x.bg
        a = acc - x.ba
        a_w = R @ a + x.g  # world-frame acceleration
        # record state at the *start* of this interval (== sample stamp)
        out = (R, p, v, w, a_w)
        dR = so3.exp(w * dt)
        R_n = so3.normalize_matrix(R @ dR)
        p_n = p + v * dt + 0.5 * a_w * dt * dt
        v_n = v + a_w * dt
        # error-state transition F (first order in dt); the extrinsic
        # block (18:24) is constant -> identity rows
        F = jnp.eye(24, dtype=jnp.float32)
        F = F.at[0:3, 0:3].set(dR.T)
        F = F.at[0:3, 9:12].set(-jnp.eye(3) * dt)
        F = F.at[3:6, 6:9].set(jnp.eye(3) * dt)
        F = F.at[6:9, 0:3].set(-(R @ so3.hat(a)) * dt)
        F = F.at[6:9, 12:15].set(-R * dt)
        F = F.at[6:9, 15:18].set(jnp.eye(3) * dt)
        Q = jnp.zeros((24, 24), jnp.float32)
        Q = Q.at[0:3, 0:3].set(jnp.eye(3) * cfg.gyr_cov * dt * dt)
        Q = Q.at[6:9, 6:9].set(jnp.eye(3) * cfg.acc_cov * dt * dt)
        Q = Q.at[9:12, 9:12].set(jnp.eye(3) * cfg.b_gyr_cov * dt * dt)
        Q = Q.at[12:15, 12:15].set(jnp.eye(3) * cfg.b_acc_cov * dt * dt)
        P_n = F @ P @ F.T + Q
        return (R_n, p_n, v_n, P_n), out

    (R_e, p_e, v_e, P_e), (Rs, ps, vs, ws, aws) = jax.lax.scan(
        step, (x.R, x.p, x.v, x.P), (imu.gyro, imu.acc, dts), unroll=8
    )
    x_end = x._replace(R=R_e, p=p_e, v=v_e, P=P_e)
    traj = (Rs, ps, vs, ws, aws, imu.stamps)
    return x_end, traj


def deskew(pts_lidar, t_offsets, pt_mask, traj, x_end: NavState, cfg: OdomConfig,
           imu_mask, scan_dt):
    """Motion-compensate LiDAR points into the scan-end IMU/body frame.

    ``pts_lidar (N,3)`` raw points in the LiDAR frame, ``t_offsets (N,)``
    seconds relative to the previous scan end (same clock as the IMU batch).
    Uses piecewise constant (w, a) within each IMU interval. Returns points
    in the scan-end body frame.
    """
    Rs, ps, vs, ws, aws, stamps = traj
    # points in body (IMU) frame at their own capture time (uses the
    # state's current extrinsic so online refinement feeds back)
    pb = pts_lidar @ x_end.R_ext.T + x_end.t_ext

    # interval lookup: the last IMU stamp <= t (masked lanes get +inf)
    key_stamps = jnp.where(imu_mask, stamps, jnp.inf)
    idx = jnp.clip(
        jnp.searchsorted(key_stamps, t_offsets, side="right") - 1,
        0,
        stamps.shape[0] - 1,
    )
    dt = jnp.clip(t_offsets - stamps[idx], 0.0, 0.5)
    R_i = Rs[idx]
    # pose of body at point time, world frame
    R_t = R_i @ so3.exp(ws[idx] * dt[:, None])
    p_t = ps[idx] + vs[idx] * dt[:, None] + 0.5 * aws[idx] * dt[:, None] ** 2
    pw = jnp.einsum("nij,nj->ni", R_t, pb) + p_t
    # back into the scan-end body frame
    pe = jnp.einsum("ji,nj->ni", x_end.R, pw - x_end.p)
    return jnp.where(pt_mask[:, None], pe, 1.0e6)
