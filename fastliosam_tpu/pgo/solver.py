"""Batched Levenberg–Marquardt pose-graph solver with a PCG linear stage.

Replaces GTSAM iSAM2 (`fast_lio_sam.cpp:102-105,494-513`): instead of an
incremental Bayes tree (pointer-heavy, tree rebalancing — hostile to XLA),
each solve is a batched re-linearization + matrix-free preconditioned
conjugate-gradient Gauss–Newton step. All factor math is vectorized over
fixed-capacity factor arrays (invalid factors have zero sqrt-info, so they
contribute nothing); the Hessian is never materialized — `A·v` is two
gathers + two scatter-adds over the factor lists, which is exactly the
shardable pattern used by the multi-host path in `parallel/`.

The LM loop and the PCG loop are `lax.scan`s with static trip counts, so a
solve is one XLA program with no host round-trips.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import se3, so3
from .graph import PoseGraph, PoseGraphConfig
from ..utils.precision import geometry_precision

_EPS = 1e-12


def _ad_se3(xi):
    """SE(3) adjoint of a tangent vector (..., 6) -> (..., 6, 6),
    ordering [rho, theta]."""
    rho, th = xi[..., :3], xi[..., 3:]
    Z = jnp.zeros(xi.shape[:-1] + (6, 6), xi.dtype)
    Z = Z.at[..., :3, :3].set(so3.hat(th))
    Z = Z.at[..., :3, 3:].set(so3.hat(rho))
    Z = Z.at[..., 3:, 3:].set(so3.hat(th))
    return Z


def _jr_inv(r):
    """First-order inverse right Jacobian of SE(3): I + 0.5 ad(r)."""
    eye = jnp.broadcast_to(jnp.eye(6, dtype=r.dtype), r.shape[:-1] + (6, 6))
    return eye + 0.5 * _ad_se3(r)


def _between_residuals(g: PoseGraph, cfg: PoseGraphConfig | None = None):
    """Whitened residuals + Jacobian blocks for all between factors.
    With ``cfg.loop_huber_delta > 0`` the non-consecutive (loop-closure)
    factors get IRLS Huber weights — see PoseGraphConfig."""
    Ti = g.poses[g.bt_i]
    Tj = g.poses[g.bt_j]
    E = se3.compose(se3.inverse(g.bt_rel), se3.between(Ti, Tj))
    r0 = se3.log(E)  # (F, 6)
    Jr = _jr_inv(r0)
    Ad = se3.adjoint(se3.between(Tj, Ti))
    w = g.bt_sqrt_info * g.bt_valid[:, None]  # (F, 6)
    if cfg is not None and cfg.loop_huber_delta > 0.0:
        is_loop = jnp.abs(g.bt_i - g.bt_j) > 1
        rn = jnp.linalg.norm(w * r0, axis=-1)
        hub = jnp.sqrt(
            jnp.minimum(1.0, cfg.loop_huber_delta / jnp.maximum(rn, _EPS))
        )
        w = w * jnp.where(is_loop, hub, 1.0)[:, None]
    Jj = w[:, :, None] * Jr
    Ji = -w[:, :, None] * (Jr @ Ad)
    rw = w * r0
    return rw, Ji, Jj


def _gps_residuals(g: PoseGraph, cfg: PoseGraphConfig | None = None):
    Ti = g.poses[g.gps_idx]
    r0 = se3.trans(Ti) - g.gps_xyz  # (G, 3)
    w = g.gps_sqrt_info * g.gps_valid[:, None]
    if cfg is not None and cfg.gps_huber_delta > 0.0:
        # IRLS Huber on the whitened residual norm (computed at the
        # current linearization): factors whose whitened error exceeds
        # delta sigmas contribute linearly, not quadratically, so a noisy
        # fix cannot yank a stiff odometry chain (gps_huber_delta doc)
        rn = jnp.linalg.norm(w * r0, axis=-1)
        hub = jnp.sqrt(
            jnp.minimum(1.0, cfg.gps_huber_delta / jnp.maximum(rn, _EPS))
        )
        w = w * hub[:, None]
    # d trans(T Exp(xi))/d xi = [R, 0]
    J = jnp.concatenate(
        [se3.rot(Ti), jnp.zeros_like(se3.rot(Ti))], axis=-1
    )  # (G, 3, 6)
    Jw = w[:, :, None] * J
    rw = w * r0
    return rw, Jw


def _prior_residual(g: PoseGraph, cfg: PoseGraphConfig, prior_pose):
    r0 = se3.log(se3.between(prior_pose, g.poses[0]))
    w = cfg.prior_sqrt_info
    J = w * _jr_inv(r0)
    return w * r0, J


def graph_cost(g: PoseGraph, cfg: PoseGraphConfig, prior_pose=None):
    """0.5 * sum of squared whitened residuals (masked)."""
    if prior_pose is None:
        prior_pose = jnp.eye(4, dtype=jnp.float32)
    rb, _, _ = _between_residuals(g, cfg)
    rg, _ = _gps_residuals(g, cfg)
    rp, _ = _prior_residual(g, cfg, prior_pose)
    return 0.5 * (jnp.sum(rb * rb) + jnp.sum(rg * rg) + jnp.sum(rp * rp))


def _assemble_dense(g: PoseGraph, cfg: PoseGraphConfig, prior_pose):
    """Assemble the full (6K, 6K) Gauss-Newton normal matrix + rhs.

    Block scatters into a (K, K, 6, 6) layout, reshaped to (6K, 6K). At
    K ≤ a few thousand this is small (6K=12288 → 600 MB is the ceiling;
    512 kf → 37 MB) and one MXU-backed factorization beats hundreds of
    tiny PCG dispatches by an order of magnitude.
    """
    K = g.poses.shape[0]
    rb, Ji, Jj = _between_residuals(g, cfg)
    rg, Jg = _gps_residuals(g, cfg)
    rp, Jp = _prior_residual(g, cfg, prior_pose)

    # flat (K*K, 6, 6) block storage with single-depth scatter indices —
    # depth-2 advanced-index scatters into a 4-D operand compile
    # pathologically on TPU
    Hf = jnp.zeros((K * K, 6, 6), jnp.float32)
    Hf = Hf.at[g.bt_i * K + g.bt_i].add(jnp.einsum("fki,fkj->fij", Ji, Ji))
    Hf = Hf.at[g.bt_j * K + g.bt_j].add(jnp.einsum("fki,fkj->fij", Jj, Jj))
    Hij = jnp.einsum("fki,fkj->fij", Ji, Jj)
    Hf = Hf.at[g.bt_i * K + g.bt_j].add(Hij)
    Hf = Hf.at[g.bt_j * K + g.bt_i].add(jnp.swapaxes(Hij, -1, -2))
    Hf = Hf.at[g.gps_idx * K + g.gps_idx].add(
        jnp.einsum("fki,fkj->fij", Jg, Jg)
    )
    Hf = Hf.at[0].add(Jp.T @ Jp)
    H = Hf.reshape(K, K, 6, 6)

    b = jnp.zeros((K, 6), jnp.float32)
    b = b.at[g.bt_i].add(-jnp.einsum("fij,fi->fj", Ji, rb))
    b = b.at[g.bt_j].add(-jnp.einsum("fij,fi->fj", Jj, rb))
    b = b.at[g.gps_idx].add(-jnp.einsum("fij,fi->fj", Jg, rg))
    b = b.at[0].add(-(Jp.T @ rp))
    return H, b


def _dense_step(g: PoseGraph, cfg: PoseGraphConfig, prior_pose, lam):
    K = g.poses.shape[0]
    H, b = _assemble_dense(g, cfg, prior_pose)
    # LM damping on the diagonal: per-(pose, axis) diagonal entries
    dk = jax.vmap(lambda Hkk: jnp.diagonal(Hkk))(H[jnp.arange(K), jnp.arange(K)])
    damp = lam * dk + 1e-6  # (K, 6)
    Hfull = jnp.swapaxes(H, 1, 2).reshape(K * 6, K * 6)
    Hfull = Hfull + jnp.diag(damp.reshape(-1))
    # damped GN normal matrix is SPD -> Cholesky (XLA's TPU LU with row
    # pivoting is several times slower than the blocked Cholesky)
    L = jnp.linalg.cholesky(Hfull)
    y = jax.scipy.linalg.solve_triangular(L, b.reshape(-1), lower=True)
    dx = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    return dx.reshape(K, 6)


def _linearize(g: PoseGraph, cfg: PoseGraphConfig, prior_pose):
    """Compute b = -JᵀWr, per-pose diagonal Hessian blocks, and a matvec."""
    K = g.poses.shape[0]
    rb, Ji, Jj = _between_residuals(g, cfg)
    rg, Jg = _gps_residuals(g, cfg)
    rp, Jp = _prior_residual(g, cfg, prior_pose)

    b = jnp.zeros((K, 6), jnp.float32)
    b = b.at[g.bt_i].add(-jnp.einsum("fij,fi->fj", Ji, rb))
    b = b.at[g.bt_j].add(-jnp.einsum("fij,fi->fj", Jj, rb))
    b = b.at[g.gps_idx].add(-jnp.einsum("fij,fi->fj", Jg, rg))
    b = b.at[0].add(-(Jp.T @ rp))

    Hd = jnp.zeros((K, 6, 6), jnp.float32)
    Hd = Hd.at[g.bt_i].add(jnp.einsum("fki,fkj->fij", Ji, Ji))
    Hd = Hd.at[g.bt_j].add(jnp.einsum("fki,fkj->fij", Jj, Jj))
    Hd = Hd.at[g.gps_idx].add(jnp.einsum("fki,fkj->fij", Jg, Jg))
    Hd = Hd.at[0].add(Jp.T @ Jp)

    def matvec(v, lam):
        """(JᵀWJ + lam·diag(H) + eps·I) v for v (K, 6)."""
        ub = jnp.einsum("fij,fj->fi", Ji, v[g.bt_i]) + jnp.einsum(
            "fij,fj->fi", Jj, v[g.bt_j]
        )
        y = jnp.zeros((K, 6), jnp.float32)
        y = y.at[g.bt_i].add(jnp.einsum("fij,fi->fj", Ji, ub))
        y = y.at[g.bt_j].add(jnp.einsum("fij,fi->fj", Jj, ub))
        ug = jnp.einsum("fij,fj->fi", Jg, v[g.gps_idx])
        y = y.at[g.gps_idx].add(jnp.einsum("fij,fi->fj", Jg, ug))
        y = y.at[0].add(Jp.T @ (Jp @ v[0]))
        diag = jnp.diagonal(Hd, axis1=-2, axis2=-1)
        return y + lam * diag * v + 1e-6 * v

    return b, Hd, matvec


def _pcg(matvec, b, Hd, lam, iters):
    """Block-Jacobi preconditioned CG for (K,6) unknowns."""
    diag = jnp.diagonal(Hd, axis1=-2, axis2=-1)
    # block preconditioner: (Hd + LM diagonal damping + eps I) per pose
    damp = lam * diag + 1e-6
    Mblocks = Hd + jax.vmap(jnp.diag)(damp)
    Minv = jnp.linalg.inv(Mblocks)

    def apply_M(r):
        return jnp.einsum("kij,kj->ki", Minv, r)

    x = jnp.zeros_like(b)
    r = b
    z = apply_M(r)
    p = z
    rz = jnp.sum(r * z)

    def body(carry, _):
        x, r, p, rz = carry
        Ap = matvec(p, lam)
        pAp = jnp.sum(p * Ap)
        alpha = jnp.where(pAp > _EPS, rz / jnp.maximum(pAp, _EPS), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_M(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(rz > _EPS, rz_new / jnp.maximum(rz, _EPS), 0.0)
        p = z + beta * p
        return (x, r, p, rz_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rz), None, length=iters)
    return x


@geometry_precision
def marginal_covariance_dense(g: PoseGraph, cfg: PoseGraphConfig, idx,
                              prior_pose=None):
    """Dense-reference marginal covariance (assembles the (6K,6K) normal
    matrix and Cholesky-factorizes). O((6K)³) and a (6K)² workspace — kept
    ONLY as the ground truth for tests; the runtime path is the matrix-free
    :func:`marginal_covariance` below."""
    if prior_pose is None:
        prior_pose = g.poses[0]
    K = g.poses.shape[0]
    H, _ = _assemble_dense(g, cfg, prior_pose)
    Hfull = jnp.swapaxes(H, 1, 2).reshape(K * 6, K * 6)
    invalid = jnp.repeat(~g.kf_valid, 6).astype(jnp.float32)
    Hfull = Hfull + jnp.diag(invalid + 1e-6)
    L = jnp.linalg.cholesky(Hfull)
    cols = jnp.arange(6)
    E = jnp.zeros((K * 6, 6), jnp.float32)
    E = E.at[idx * 6 + cols, cols].set(1.0)
    y = jax.scipy.linalg.solve_triangular(L, E, lower=True)
    X = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    return jax.lax.dynamic_slice(X, (idx * 6, 0), (6, 6))


@geometry_precision
def marginal_covariance(g: PoseGraph, cfg: PoseGraphConfig, idx,
                        prior_pose=None):
    """6×6 marginal covariance block of keyframe ``idx`` at the current
    linearization — the `ISAM2::marginalCovariance` analog the reference
    reads back per keyframe (`fast_lio_sam.cpp:523`,
    `pose_covariance_ = isam_handler_->marginalCovariance(...)`).

    Matrix-free: the six columns of H⁻¹ belonging to keyframe ``idx`` are
    solved with the same factor-list matvec + block-Jacobi PCG as the LM
    linear stage (no (6K)² allocation, no O((6K)³) factorization — the
    round-2 dense path was a ~2.4 GB workspace at 4096 kf). The six
    right-hand sides run as one vmapped CG, so the whole marginal is a
    single fixed-trip-count XLA program.

    Tangent ordering here is [trans, rot]: translation variances are
    ``diag(cov)[:3]`` (GTSAM Pose3 orders [rot, trans], so the reference's
    ``cov(3,3)/cov(4,4)`` x/y-translation gate reads ``cov[0,0]/cov[1,1]``
    of this block). Invalid keyframe blocks are decoupled with unit
    diagonal so the system stays SPD.
    """
    if prior_pose is None:
        prior_pose = g.poses[0]
    K = g.poses.shape[0]
    _, Hd, matvec = _linearize(g, cfg, prior_pose)
    invalid = (~g.kf_valid).astype(jnp.float32)

    def mv(v):
        # H v + decoupling for invalid blocks (matvec adds the 1e-6 ridge)
        return matvec(v, 0.0) + invalid[:, None] * v

    # block-Jacobi preconditioner with the same decoupling
    Mblocks = Hd + jax.vmap(jnp.diag)(
        invalid[:, None] * jnp.ones((1, 6), jnp.float32) + 1e-6
    )
    Minv = jnp.linalg.inv(Mblocks)

    def apply_M(r):
        return jnp.einsum("kij,kj->ki", Minv, r)

    def cg(bcol):
        x = jnp.zeros_like(bcol)
        r = bcol
        z = apply_M(r)
        p = z
        rz = jnp.sum(r * z)

        def body(carry, _):
            x, r, p, rz = carry
            Ap = mv(p)
            pAp = jnp.sum(p * Ap)
            alpha = jnp.where(pAp > _EPS, rz / jnp.maximum(pAp, _EPS), 0.0)
            x = x + alpha * p
            r = r - alpha * Ap
            z = apply_M(r)
            rz_new = jnp.sum(r * z)
            beta = jnp.where(rz > _EPS, rz_new / jnp.maximum(rz, _EPS), 0.0)
            p = z + beta * p
            return (x, r, p, rz_new), None

        (x, _, _, _), _ = jax.lax.scan(
            body, (x, r, p, rz), None, length=cfg.marginal_pcg_iters
        )
        return x

    cols = jnp.arange(6)
    E = jnp.zeros((6, K, 6), jnp.float32).at[cols, idx, cols].set(1.0)
    X = jax.vmap(cg)(E)  # (6, K, 6)
    cov = X[:, idx, :]  # row r = eᵣᵀ H⁻¹ restricted to block idx
    return 0.5 * (cov + cov.T)


def rotate_cov_to_world(cov6, R):
    """Conjugate a [trans, rot] right-perturbation tangent covariance into
    the world frame. The marginal from :func:`marginal_covariance` lives in
    the keyframe's local tangent frame (``d trans(T Exp(xi))/d xi = [R, 0]``
    — a perturbation ``[δt, δθ]`` moves the world position by ``R δt`` and
    the world attitude by ``R δθ``), so the world covariance is
    ``blkdiag(R, R) · cov6 · blkdiag(R, R)ᵀ``. Required before feeding the
    x/y/yaw entries to :func:`extrapolate_pose_cov`, whose displacement
    input is world-frame: once the keyframe has turned, the local axes no
    longer align with world x/y and the cross-term signs flip."""
    Z = jnp.zeros((3, 3), cov6.dtype)
    J = jnp.block([[R, Z], [Z, R]])
    return J @ cov6 @ J.T


def extrapolate_pose_cov(cov6, dk, path_len, dxy, trans_var, rot_var):
    """First-order dead-reckoning extrapolation of the x/y translation
    marginal variances ``dk`` keyframes past the last solve (host-side
    numpy — this feeds the engine's GPS pose-covariance gate between
    solves, where iSAM2 would have tracked the marginal incrementally,
    `fast_lio_sam.cpp:523`).

    Inputs: ``cov6`` the 6×6 [trans, rot] marginal at the last solve,
    ``path_len`` the odometry path length since, ``dxy`` the (2,) net x/y
    displacement since. Error growth has four first-order terms per axis:

      1. the odometry translation random walk          dk·σ_t²
      2. the yaw uncertainty at the solve, levered by the displacement
         perpendicular to the axis                     (Δp_⊥)²·σ_ψ²
      3. the (translation, yaw) cross-covariance at the solve, levered
         the same way                                  ±2·Δp_⊥·cov(t, ψ)
      4. yaw noise injected after the solve, each step levered by the
         remaining path                                σ_ψstep²·d̄²·Σm²

    ``cov6`` and ``dxy`` must share a frame: pass the solve keyframe's
    marginal through :func:`rotate_cov_to_world` first (``dxy`` is a
    world-frame displacement).

    Exact on a straight odometry chain (verified against the dense
    marginal in ``test_pose_cov_extrapolation_matches_truth``, including a
    turned solve keyframe); on curved paths the straight-line lever is an
    approximation of the true integral, and on loop-backs (net displacement
    ≪ path length) the lever is bounded isotropically by the path
    half-length instead — the net Δp understates the excursion the yaw
    error was actually levered over. Returns the (2,) extrapolated x/y
    variances.
    """
    import numpy as np

    var = np.array([cov6[0, 0], cov6[1, 1]], np.float64)
    dk = int(dk)
    if dk <= 0:
        return var
    yaw_var = float(cov6[5, 5])
    cov_x_yaw = float(cov6[0, 5])
    cov_y_yaw = float(cov6[1, 5])
    dx, dy = float(dxy[0]), float(dxy[1])
    norm2 = dx * dx + dy * dy
    dbar = float(path_len) / dk
    # Σ_{m=0}^{dk-1} m² — lever of per-step yaw noise over the remaining path
    s2 = (dk - 1) * dk * (2 * dk - 1) / 6.0
    walk = rot_var * dbar * dbar * s2
    lev2 = 0.25 * path_len * path_len
    # Δp-levered form (exact on a straight chain): δx = -ψ·Δp_y,
    # δy = +ψ·Δp_x (z-rotation of the displacement)
    inv_n2 = 1.0 / max(norm2, 1e-12)
    lev_x = dy * dy * yaw_var - 2.0 * dy * cov_x_yaw + dy * dy * inv_n2 * walk
    lev_y = dx * dx * yaw_var + 2.0 * dx * cov_y_yaw + dx * dx * inv_n2 * walk
    # loop-back form: when |Δp| ≪ path length the straight-line lever
    # collapses (dxy→0 would zero the yaw terms and underestimate the
    # accumulated error), so bound the solve-time yaw lever by the path
    # half-length, split isotropically; cross terms have no usable sign.
    iso = 0.5 * lev2 * yaw_var + 0.5 * walk
    # continuous blend between the regimes: weight the levered form by
    # how much of the path the net displacement covers (w=1 at and beyond
    # |Δp| = path_len/2, so the straight-chain case stays exact; w→0 as
    # Δp→0). A hard switch at the threshold made the GPS-gate variance
    # jump between consecutive keyframes as dxy crossed it.
    w = min(norm2 / lev2, 1.0) if lev2 > 0.0 else 1.0
    var[0] += dk * trans_var + w * lev_x + (1.0 - w) * iso
    var[1] += dk * trans_var + w * lev_y + (1.0 - w) * iso
    return var


@geometry_precision
def _loop_resid2(g: PoseGraph, cfg: PoseGraphConfig, poses):
    """Chain-aware squared consistency residual per between factor at
    ``poses`` — the GNC measure. A loop spanning d = |i-j| keyframe hops
    is judged against sigma²_meas + d·sigma²_hop, NOT the factor's claimed
    noise alone: a correct loop demanding an 8 m correction across a
    900-hop drifted chain is ~what accumulated odometry uncertainty
    predicts (plausible), while the same 8 m across 50 hops is a >10-sigma
    outlier. Whitening only by the measurement noise mistakes every
    correct FAR correction for an outlier — measured on the canyon
    circuit: 3 accepted loops with 0.3 m true error, GNC killed them
    mid-anneal and the half-bent chain scored 12.9 m (loop-free: 3.6)."""
    Ti = poses[g.bt_i]
    Tj = poses[g.bt_j]
    E = se3.compose(se3.inverse(g.bt_rel), se3.between(Ti, Tj))
    r0 = se3.log(E)  # (F, 6) = [rho, theta]
    rt2 = jnp.sum(r0[:, :3] ** 2, axis=-1)
    rr2 = jnp.sum(r0[:, 3:] ** 2, axis=-1)
    d = jnp.abs(g.bt_i - g.bt_j).astype(jnp.float32)
    si_t = jnp.mean(g.bt_sqrt_info[:, :3], axis=-1)
    si_r = jnp.mean(g.bt_sqrt_info[:, 3:], axis=-1)
    var_t = 1.0 / jnp.maximum(si_t, _EPS) ** 2 + cfg.gnc_hop_trans_var * d
    var_r = 1.0 / jnp.maximum(si_r, _EPS) ** 2 + cfg.gnc_hop_rot_var * d
    return (rt2 / var_t + rr2 / var_r) * g.bt_valid


def _gnc_loop_weights(g: PoseGraph, cfg: PoseGraphConfig, poses, mu):
    """Per-factor GNC-GM weights: 1 on the odometry chain, annealed
    Geman-McClure on loop factors (see PoseGraphConfig.loop_gnc_barc)."""
    rn2 = _loop_resid2(g, cfg, poses)
    c2 = jnp.float32(cfg.loop_gnc_barc ** 2)
    w = (mu * c2 / (rn2 + mu * c2)) ** 2
    is_loop = jnp.abs(g.bt_i - g.bt_j) > 1
    return jnp.where(is_loop & g.bt_valid, w, 1.0)


def solve(g: PoseGraph, cfg: PoseGraphConfig, prior_pose=None):
    """Run the LM loop; returns the graph with optimized poses.

    Fully jittable (static trip counts). The reference's behavior of extra
    iSAM2 update rounds after a loop factor (`fast_lio_sam.cpp:504-509`) is
    subsumed by running `lm_iters` full re-linearizations per solve.

    With ``cfg.loop_gnc_barc > 0`` the LM loop runs inside a GNC anneal:
    ``gnc_stages`` outer stages, each fixing Geman-McClure loop weights at
    the PREVIOUS stage's converged poses (stage 0: mu_0 large, all loops
    fully weighted = the L2 consensus), running a full ``lm_iters`` LM
    solve under those weights, then annealing mu toward 1. Judging the
    weights only at stage-converged estimates is what separates GNC from
    naive IRLS — mid-solve residuals reflect drift, not inconsistency.
    """
    if prior_pose is None:
        prior_pose = g.poses[0]
    kf_mask = g.kf_valid[:, None].astype(jnp.float32)
    # "auto" = PCG: measured faster than the dense factorization at every
    # graph size on both TPU and CPU (see PoseGraphConfig.linear_solver)
    use_dense = cfg.linear_solver == "dense"
    use_gnc = cfg.loop_gnc_barc > 0.0

    def lm_scan(gw, poses0):
        """Full LM loop on (possibly reweighted) graph gw from poses0."""

        def lm_iter(carry, _):
            poses, lam, cost = carry
            gg = gw._replace(poses=poses)
            if use_dense:
                dx = _dense_step(gg, cfg, prior_pose, lam)
            else:
                b, Hd, matvec = _linearize(gg, cfg, prior_pose)
                dx = _pcg(matvec, b, Hd, lam, cfg.pcg_iters)
            dx = dx * kf_mask
            cand = se3.retract(poses, dx)
            cand = jnp.where(g.kf_valid[:, None, None], cand, poses)
            new_cost = graph_cost(gw._replace(poses=cand), cfg, prior_pose)
            accept = new_cost < cost
            poses = jnp.where(accept, cand, poses)
            cost = jnp.where(accept, new_cost, cost)
            lam = jnp.where(accept, lam * cfg.lambda_down, lam * cfg.lambda_up)
            lam = jnp.clip(lam, 1e-9, 1e6)
            return (poses, lam, cost), cost

        cost0 = graph_cost(gw._replace(poses=poses0), cfg, prior_pose)
        (poses, _, cost), _ = jax.lax.scan(
            lm_iter,
            (poses0, jnp.float32(cfg.lambda_init), cost0),
            None,
            length=cfg.lm_iters,
        )
        return poses, cost

    if not use_gnc:
        poses, cost = lm_scan(g, g.poses)
        return g._replace(poses=poses), cost

    # mu_0 from the worst loop residual at the initial poses: the first
    # surrogate is (near-)convex — every loop fully weighted, the solve
    # finds the L2 consensus the weights are then judged against
    rn2 = _loop_resid2(g, cfg, g.poses)
    is_loop = (jnp.abs(g.bt_i - g.bt_j) > 1) & g.bt_valid
    r2max = jnp.max(jnp.where(is_loop, rn2, 0.0))
    mu0 = jnp.maximum(2.0 * r2max / jnp.float32(cfg.loop_gnc_barc ** 2), 1.0)
    if cfg.gnc_div > 0.0:
        gnc_div = jnp.float32(cfg.gnc_div)
    else:  # auto: land on mu = 1 at the LAST stage
        gnc_div = jnp.exp(
            jnp.log(mu0) / jnp.float32(max(cfg.gnc_stages - 1, 1))
        )

    def gnc_stage(carry, _):
        poses, mu = carry
        sw = jnp.sqrt(_gnc_loop_weights(g, cfg, poses, mu))
        gw = g._replace(bt_sqrt_info=g.bt_sqrt_info * sw[:, None])
        poses, cost = lm_scan(gw, poses)
        mu = jnp.maximum(mu / gnc_div, 1.0)
        return (poses, mu), cost

    (poses, _), costs = jax.lax.scan(
        gnc_stage, (g.poses, mu0), None, length=cfg.gnc_stages
    )
    return g._replace(poses=poses), costs[-1]
