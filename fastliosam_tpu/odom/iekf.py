"""Iterated error-state Kalman update with point-to-plane map matching.

The TPU-native heart of the FAST-LIO2 capability (SURVEY.md §3.6): each
iteration transforms the (downsampled, deskewed) scan into the world frame,
queries per-point planes from the voxel-surfel map, forms the stacked
point-to-plane residual and its sparse Jacobian, and solves the 18-dim MAP
system. Because each residual row only touches the 6 pose columns, the
Gram matrix is accumulated as a (N,6)ᵀ(N,6) matmul — MXU-friendly — and
embedded into the 18x18 system.

Math (right-perturbation ESKF):
  residual   r_j = n_jᵀ (R p_j + t) + d_j
  d r_j/dδθ  = -n_jᵀ R [p_j]_x  =  (p_j × (Rᵀ n_j))ᵀ
  d r_j/dδp  = n_jᵀ
  MAP step: (Hᵀ R⁻¹ H + P⁻¹) dx = -(Hᵀ R⁻¹ r + P⁻¹ (x ⊟ x_prop))
Iterated ``max_iteration`` times (reference contract `kitti.launch:8`),
then P ← (Hᵀ R⁻¹ H + P⁻¹)⁻¹.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.eigh3 import eigh3
from ..map import voxel_hash as vh
from .state import NavState, OdomConfig, boxplus, boxminus


def _query_planes(x, pts_body, mask, vmap, map_cfg, cfg: OdomConfig,
                  query_fn=None):
    """Returns ``(normal, d, valid, rvar)`` — rvar is the per-point
    residual-variance inflation from surfel-fit uncertainty (0 for the
    cached single-voxel mode, whose stored planes carry no moment
    record). ``query_fn`` overrides the map query (the multi-device
    slot-sharded map, `parallel/sharded_odom.py`)."""
    pw = pts_body @ x.R.T + x.p
    if query_fn is not None:
        return query_fn(vmap, map_cfg, pw, mask)
    if cfg.query_mode == "merged":
        return vh.query_planes_merged(vmap, map_cfg, pw, mask)
    if cfg.query_mode == "merged2":
        return vh.query_planes_merged2(vmap, map_cfg, pw, mask)
    if cfg.query_mode == "merged3":
        return vh.query_planes_merged3(vmap, map_cfg, pw, mask)
    n, d, valid = vh.query_planes(vmap, map_cfg, pw, mask)
    return n, d, valid, jnp.zeros(valid.shape, jnp.float32)


def iekf_update(
    x_prop: NavState,
    pts_body,
    mask,
    vmap: vh.VoxelMap,
    map_cfg: vh.VoxelMapConfig,
    cfg: OdomConfig,
    query_fn=None,
):
    """Iterated MAP update. Returns ``(state, n_matched)``.

    Plane association (hash probing + moment merge) runs at the propagated
    state and is then re-run for the first ``requery_iters`` Kalman
    iterations; later iterations reuse the association (pose deltas shrink
    to millimeters, far below the voxel size). Residuals and the outlier
    gate ARE recomputed every iteration from the updated pose.
    """
    P_inv = jnp.linalg.inv(x_prop.P)
    x = x_prop
    n_matched = jnp.zeros((), jnp.int32)
    inv_R = 1.0 / cfg.point_cov

    plane_n, plane_d, assoc, rvar = _query_planes(
        x, pts_body, mask, vmap, map_cfg, cfg, query_fn
    )

    # LiDAR-frame points, recovered once through the propagated extrinsic —
    # the measurement model below re-applies the *current* extrinsic each
    # iteration so the residual genuinely depends on it (otherwise the
    # extrinsic block would chase a phantom gradient and diverge)
    p_l = (pts_body - x_prop.t_ext) @ x_prop.R_ext

    S = None
    # lever arm for the association-staleness metric: the farthest valid
    # point in this scan — a rotation correction δθ moves world points by
    # up to r_max·|δθ|, which must count toward the re-query trigger just
    # like translation (a rotation-only correction on a cold start or
    # sharp turn otherwise leaves associations stale without tripping it)
    r_max = jnp.max(
        jnp.linalg.norm(pts_body, axis=-1) * mask.astype(jnp.float32)
    )
    dp_last = jnp.float32(jnp.inf)  # assoc displacement of the previous iter
    for it in range(cfg.max_iteration):
        q_b = p_l @ x.R_ext.T + x.t_ext if cfg.extrinsic_est_en else pts_body
        if 0 < it <= cfg.requery_iters:
            if cfg.requery_thresh > 0.0:
                # adaptive: only pay the association when the previous
                # step moved far enough to invalidate it (requery_thresh)
                plane_n, plane_d, assoc, rvar = jax.lax.cond(
                    dp_last > cfg.requery_thresh,
                    lambda: _query_planes(
                        x, q_b, mask, vmap, map_cfg, cfg, query_fn
                    ),
                    lambda: (plane_n, plane_d, assoc, rvar),
                )
            else:
                plane_n, plane_d, assoc, rvar = _query_planes(
                    x, q_b, mask, vmap, map_cfg, cfg, query_fn
                )
        pw = q_b @ x.R.T + x.p
        n = plane_n
        r = jnp.sum(n * pw, axis=-1) + plane_d
        valid = assoc & (jnp.abs(r) < cfg.max_residual)
        # heteroscedastic rows: each point weighted by the inverse of
        # (sensor noise + surfel-fit uncertainty at the query offset) —
        # see voxel_hash._fit_rvar. Garbage associations (query between
        # the rings of a near-collinear fit) self-attenuate; sound ones
        # keep ~full weight.
        w = valid.astype(jnp.float32) / (cfg.point_cov + rvar)
        n_matched = jnp.sum(valid.astype(jnp.int32))
        # sparse Jacobian rows: A = [dr/dδθ, dr/dδp(, dr/dδθ_ext, dr/dδt_ext)]
        v = n @ x.R  # Rᵀ n per point
        jtheta = jnp.cross(q_b, v)
        cols = [jtheta, n]
        col_idx = list(range(0, 6))
        if cfg.extrinsic_est_en:
            v_ext = v @ x.R_ext  # (R R_ext)ᵀ n
            cols.append(jnp.cross(p_l, v_ext))  # dr/dδθ_ext
            cols.append(v)  # dr/dδt_ext = nᵀ R
            col_idx += list(range(18, 24))
        A = jnp.concatenate(cols, axis=-1)  # (N, 6 or 12)
        Aw = A * w[:, None]
        G = A.T @ Aw  # Gram — MXU matmul over the point axis
        bvec = Aw.T @ r
        if cfg.degen_rel_thresh > 0.0:
            # degeneracy-aware solution remapping (Zhang & Singh ICRA'16):
            # eigendecompose the world-frame translation block of the
            # measurement Gram; directions with mean cos² below threshold
            # carry no genuine constraint (corridor walls ⊥ the street
            # observe nothing along it — whatever tiny gradient remains is
            # grazing-incidence artifact). Project the measurement system
            # onto the observable subspace so the MAP solve keeps the
            # prediction along degenerate axes. (Extrinsic columns stay
            # untouched: they are frozen unless extrinsic_est_en.)
            # observability from CONFIDENT evidence only (state.py
            # degen_conf_ratio doc): matches whose surfel-fit uncertainty
            # is below the sensor noise. The weighted Gram G[3:6,3:6]
            # still includes soft-weighted ring-alias matches whose
            # correlated bias fakes along-street observability.
            wc = (
                valid & (rvar < cfg.degen_conf_ratio * cfg.point_cov)
            ).astype(jnp.float32) * inv_R
            nc = n * wc[:, None]
            Gt = nc.T @ n
            lam, V = eigh3(0.5 * (Gt + Gt.T))  # closed form, no LAPACK
            scale = jnp.maximum(jnp.sum(wc), 1e-6)
            thr = cfg.degen_rel_thresh * scale
            keep0 = lam > thr
            # hysteresis: closed-form eigenvectors are only reliable when
            # the kept/dropped spectra genuinely separate — two eigenvalues
            # straddling the threshold arbitrarily closely would make the
            # projector keep/drop an essentially arbitrary direction inside
            # the near-degenerate 2-space. Require every kept eigenvalue to
            # clear 2× the largest dropped one; borderline directions are
            # dropped too (conservative coast along them this iteration).
            dropped_max = jnp.max(jnp.where(keep0, 0.0, lam))
            keep = (lam > jnp.maximum(thr, 2.0 * dropped_max)).astype(
                jnp.float32
            )
            # when nothing is dropped the projector is exactly I
            proj = jnp.where(
                jnp.all(keep > 0.5),
                jnp.eye(3, dtype=G.dtype),
                (V * keep[None, :]) @ V.T,
            )
            Q = jnp.eye(G.shape[0], dtype=G.dtype).at[3:6, 3:6].set(proj)
            G = Q @ G @ Q
            bvec = Q @ bvec
        ii = jnp.asarray(col_idx)
        HtRH = jnp.zeros((24, 24), jnp.float32).at[jnp.ix_(ii, ii)].set(G)
        Htr = jnp.zeros((24,), jnp.float32).at[ii].set(bvec)
        dxi = boxminus(x, x_prop)
        S = HtRH + P_inv
        rhs = -(Htr + P_inv @ dxi)
        dx = jnp.linalg.solve(S, rhs)
        dp_last = jnp.linalg.norm(dx[3:6]) + r_max * jnp.linalg.norm(dx[0:3])
        x = boxplus(x, dx)

    # posterior covariance from the final linearization
    P_new = jnp.linalg.inv(S)
    P_new = 0.5 * (P_new + P_new.T)
    return x._replace(P=P_new), n_matched
