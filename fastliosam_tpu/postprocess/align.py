"""Trajectory <-> GPS alignment tools.

Capability ports (redesigned, numpy/JAX) of the reference post-processing:
  * timestamp matching with tolerance — `geo_ref_slam_wgs84.py:79-107`
  * 2D similarity (scale+R+t) Horn fit — `geo_ref_slam_wgs84.py:109-132`
  * timestamp-free 2D point-to-point ICP with scale —
    `align_slam_gps_icp.py:81-157`
"""
from __future__ import annotations

from dataclasses import dataclass, asdict

import numpy as np


def match_by_timestamp(
    stamps_a: np.ndarray, stamps_b: np.ndarray, tol: float = 0.5
):
    """For each entry of a, the nearest entry of b within ``tol`` seconds.
    Returns (idx_a, idx_b) index arrays of the matched pairs."""
    stamps_b = np.asarray(stamps_b)
    order = np.argsort(stamps_b)
    sb = stamps_b[order]
    pos = np.searchsorted(sb, stamps_a)
    idx_a, idx_b = [], []
    for i, (t, p) in enumerate(zip(stamps_a, pos)):
        cands = []
        if p > 0:
            cands.append(p - 1)
        if p < len(sb):
            cands.append(p)
        if not cands:
            continue
        best = min(cands, key=lambda c: abs(sb[c] - t))
        if abs(sb[best] - t) <= tol:
            idx_a.append(i)
            idx_b.append(order[best])
    return np.asarray(idx_a, int), np.asarray(idx_b, int)


@dataclass
class Similarity2D:
    """2D similarity: ``dst ≈ s · R(theta) · src + t`` (+ vertical offset)."""

    scale: float
    theta: float
    tx: float
    ty: float
    tz: float = 0.0

    @property
    def R(self):
        c, s = np.cos(self.theta), np.sin(self.theta)
        return np.array([[c, -s], [s, c]])

    def apply(self, xy: np.ndarray) -> np.ndarray:
        return self.scale * xy @ self.R.T + np.array([self.tx, self.ty])

    def apply_xyz(self, xyz: np.ndarray) -> np.ndarray:
        out = np.asarray(xyz, np.float64).copy()
        out[:, :2] = self.apply(out[:, :2])
        out[:, 2] += self.tz
        return out

    def to_dict(self):
        return asdict(self)

    @staticmethod
    def from_dict(d) -> "Similarity2D":
        return Similarity2D(**d)


def fit_similarity_2d(
    src_xy: np.ndarray, dst_xy: np.ndarray, with_scale: bool = True
) -> Similarity2D:
    """Closed-form (Umeyama/Horn) 2D similarity fit on matched pairs."""
    src = np.asarray(src_xy, np.float64)
    dst = np.asarray(dst_xy, np.float64)
    mu_s, mu_d = src.mean(0), dst.mean(0)
    xs, xd = src - mu_s, dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(2)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[1, 1] = -1
    R = U @ S @ Vt
    scale = (
        float(np.trace(np.diag(D) @ S) / ((xs**2).sum() / len(src)))
        if with_scale
        else 1.0
    )
    t = mu_d - scale * R @ mu_s
    theta = float(np.arctan2(R[1, 0], R[0, 0]))
    return Similarity2D(scale=scale, theta=theta, tx=float(t[0]), ty=float(t[1]))


def icp_2d_with_scale(
    src_xy: np.ndarray,
    dst_xy: np.ndarray,
    iters: int = 50,
    init: Similarity2D | None = None,
    trim_fraction: float = 0.9,
) -> tuple:
    """Timestamp-free 2D ICP with per-iteration similarity (SVD) fit.

    Returns ``(Similarity2D, rms_error)``. Capability port of
    `align_slam_gps_icp.py:81-157` (nearest-neighbor + scale SVD per iter).
    Without an ``init``, starts from centroid alignment (translation only);
    like any ICP it refines a roughly-correct rotation, it does not search
    globally.
    """
    src = np.asarray(src_xy, np.float64)
    dst = np.asarray(dst_xy, np.float64)
    if init is None:
        d = dst.mean(0) - src.mean(0)
        init = Similarity2D(1.0, 0.0, float(d[0]), float(d[1]))
    sim = init
    rms = np.inf
    for _ in range(iters):
        cur = sim.apply(src)
        d2 = ((cur[:, None] - dst[None]) ** 2).sum(-1)
        nn = d2.argmin(1)
        dn = d2[np.arange(len(src)), nn]
        if trim_fraction < 1.0:
            thr = np.quantile(dn, trim_fraction)
            keep = dn <= thr
        else:
            keep = np.ones(len(src), bool)
        sim_step = fit_similarity_2d(cur[keep], dst[nn][keep])
        # compose: total = step ∘ sim
        R_tot = sim_step.R @ sim.R
        s_tot = sim_step.scale * sim.scale
        t_tot = sim_step.scale * sim_step.R @ np.array([sim.tx, sim.ty]) + np.array(
            [sim_step.tx, sim_step.ty]
        )
        sim = Similarity2D(
            scale=s_tot,
            theta=float(np.arctan2(R_tot[1, 0], R_tot[0, 0])),
            tx=float(t_tot[0]),
            ty=float(t_tot[1]),
        )
        rms = float(np.sqrt(dn[keep].mean()))
    return sim, rms


def alignment_report(sim: Similarity2D, src_xy, dst_xy):
    """Mean/std residual report (`geo_ref_slam_wgs84.py:422-426` analog)."""
    res = np.linalg.norm(sim.apply(np.asarray(src_xy)) - np.asarray(dst_xy), axis=1)
    return {
        "mean_error_m": float(res.mean()),
        "std_error_m": float(res.std()),
        "max_error_m": float(res.max()),
        "n_pairs": int(len(res)),
    }
