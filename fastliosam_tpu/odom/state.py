"""Navigation state and error-state utilities for the iterated ESKF.

FAST-LIO2-capability state (SURVEY.md §3.6): rotation, position, velocity,
gyro/accel biases, gravity, and the LiDAR-IMU extrinsic, with a 24-dim
error state ordered ``[dtheta(0:3), dp(3:6), dv(6:9), dbg(9:12),
dba(12:15), dg(15:18), dtheta_ext(18:21), dt_ext(21:24)]``. Rotation
errors use the local (right) convention ``R_true = R_est Exp(dθ)``. When
``extrinsic_est_en`` is off the extrinsic block carries ~zero covariance
and never moves — one uniform code path for both modes (FAST-LIO2's
``mapping.extrinsic_est_en`` contract).

The parameter surface mirrors the reference's FAST-LIO config contract
(`third_party/fastlio_config_launch/kitti.yaml:16-27`, `kitti.launch:6-11`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import so3

STATE_DIM = 24
GRAVITY = 9.81


class OdomConfig(NamedTuple):
    """Odometry configuration (FAST-LIO parameter surface)."""

    # noise densities (mapping.{acc_cov,gyr_cov,b_acc_cov,b_gyr_cov})
    acc_cov: float = 0.1
    gyr_cov: float = 0.1
    b_acc_cov: float = 0.0001
    b_gyr_cov: float = 0.0001
    # initial velocity variance (m²/s²). Counterintuitive measured result
    # (r5, no-init rolling start at 1.26 m/s): a vehicle-scale "honest"
    # prior (4.0) makes the no-init ATE WORSE (0.089 -> 0.104; 0.25 and
    # 1.0 likewise ~0.12) — the first scans' corrections are contaminated
    # by the v=0 deskew distortion of the seed map, and a wide prior dumps
    # that contamination straight into the velocity state, while the tight
    # prior low-passes it and lets the surfel map average the seed
    # distortion out. Kept configurable for resume/handoff scenarios.
    init_vel_cov: float = 0.01
    # iterated update
    max_iteration: int = 3  # kitti.launch:8
    point_cov: float = 0.001  # LASER_POINT_COV analog
    max_residual: float = 1.0  # point-to-plane outlier gate (m)
    # plane association mode: "merged" (7-voxel face stencil — the robust
    # default, best on sparse scans where small pools miss min_points),
    # "merged3" (own voxel + two dominant-axis neighbors — on dense scans
    # measured faster AND more accurate than the stencil on TPU: 95 vs 81
    # scans/s at ATE 0.19 vs 0.22 on the 32k-pt bench; worse on sparse
    # scans), "merged2" (1 neighbor), "cached" (own voxel only)
    query_mode: str = "merged"
    # plane re-association during the iterated update: 0 = associate once at
    # the propagated pose (fastest), 1 = once more after the first Kalman
    # iteration (recovers most of the accuracy), >=max_iteration-1 = every
    # iteration (the reference's re-search-per-iteration behavior)
    requery_iters: int = 1
    # adaptive re-association: within the requery_iters window, re-run the
    # (expensive) association ONLY when the previous Kalman step moved the
    # position more than this (m). While tracking, corrections are
    # millimetres and the re-query is pure cost — measured r4: skipping it
    # is +12% throughput AND better ATE (0.0549→0.0437 dense,
    # 0.0109→0.0085 livox) because mid-update pool reassignment is
    # noisier than the propagated-pose association; on a cold start the
    # first corrections are large and the re-query is load-bearing
    # (no-init ATE 0.100 vs 0.157 without it). 0 = always re-query.
    requery_thresh: float = 0.125
    # preprocessing
    blind: float = 1.0  # preprocess.blind
    point_filter_num: int = 4  # kitti.launch:7
    filter_size_surf: float = 0.5  # kitti.launch:9
    det_range: float = 300.0  # mapping.det_range
    # extrinsics: lidar -> imu (mapping.extrinsic_T / extrinsic_R)
    extrinsic_T: tuple = (0.0, 0.0, 0.0)
    extrinsic_R: tuple = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    extrinsic_est_en: bool = False  # online extrinsic refinement
    extrinsic_prior_cov: float = 1e-4  # initial ext covariance when enabled
    # budgets (static shapes)
    max_imu_per_scan: int = 32
    num_ds_points: int = 8192  # downsampled points fed to the iEKF
    # map maintenance
    evict_every: int = 50  # scans between FoV-sliding eviction passes
    # initialization
    init_gravity_samples: int = 10
    # LiDAR-only (no IMU) constant-velocity process noise per second
    cv_rot_cov: float = 0.05
    cv_pos_cov: float = 0.5
    cv_vel_cov: float = 5.0
    # clamp on the turn rate re-estimated from consecutive corrections
    # (rad/s): one bad-association attitude jump must not become the next
    # scan's predicted rotation
    cv_max_rate: float = 2.0
    # EMA coefficient for the LiDAR-only velocity re-estimate: the scan-
    # to-scan finite difference carries any single-scan correction spike,
    # and entering a degenerate stretch freezes whatever velocity it
    # happens to hold (the coast then integrates the spike for the whole
    # stretch: a 5% entry error over a 55 s canyon = 9 m). 1.0 = raw
    # finite difference (no smoothing).
    cv_vel_alpha: float = 0.5
    # degeneracy-aware solution remapping (Zhang & Singh, ICRA'16): drop
    # the LiDAR update along translation directions whose measurement-Gram
    # eigenvalue, normalized to mean-cos² units (λ / (n_matched/point_cov)),
    # falls below this — the prediction coasts along unobservable axes
    # instead of chasing spurious gradients (corridors/urban canyons:
    # grazing-incidence artifacts otherwise erode velocity scan by scan).
    # 0 disables.
    degen_rel_thresh: float = 5e-3
    # observability evidence gate: the degeneracy eigen-analysis only
    # counts matches whose fit-uncertainty rvar is below
    # degen_conf_ratio x point_cov (confidence >= 1/2). Near-collinear
    # ring-alias matches survive the soft rvar weighting at ~1/30 weight
    # each, but thousands of them are biased the SAME way (correlated,
    # not independent evidence) and keep a phantom along-street eigenvalue
    # above threshold — measured 9-40% per-scan speed erosion through the
    # canyon with the weighted-Gram criterion.
    degen_conf_ratio: float = 1.0

    def ext_R(self):
        return jnp.asarray(self.extrinsic_R, jnp.float32).reshape(3, 3)

    def ext_T(self):
        return jnp.asarray(self.extrinsic_T, jnp.float32)


class NavState(NamedTuple):
    R: jnp.ndarray  # (3, 3) body(IMU)->world
    p: jnp.ndarray  # (3,)
    v: jnp.ndarray  # (3,)
    bg: jnp.ndarray  # (3,)
    ba: jnp.ndarray  # (3,)
    g: jnp.ndarray  # (3,) gravity in world frame (approx [0,0,-9.81])
    R_ext: jnp.ndarray  # (3, 3) LiDAR -> IMU rotation
    t_ext: jnp.ndarray  # (3,) LiDAR -> IMU translation
    P: jnp.ndarray  # (24, 24) error covariance


def init_state(g_world=None, cfg: OdomConfig | None = None) -> NavState:
    if g_world is None:
        g_world = jnp.array([0.0, 0.0, -GRAVITY], jnp.float32)
    cfg = cfg or OdomConfig()
    ext_cov = cfg.extrinsic_prior_cov if cfg.extrinsic_est_en else 1e-12
    P = jnp.diag(
        jnp.concatenate(
            [
                jnp.full((3,), 1e-4),  # attitude
                jnp.full((3,), 1e-8),  # position (anchored)
                jnp.full((3,), cfg.init_vel_cov),  # velocity
                jnp.full((3,), 1e-4),  # bg
                jnp.full((3,), 1e-3),  # ba
                jnp.full((3,), 1e-4),  # gravity
                jnp.full((6,), ext_cov),  # extrinsic (frozen when disabled)
            ]
        ).astype(jnp.float32)
    )
    return NavState(
        R=jnp.eye(3, dtype=jnp.float32),
        p=jnp.zeros(3, jnp.float32),
        v=jnp.zeros(3, jnp.float32),
        bg=jnp.zeros(3, jnp.float32),
        ba=jnp.zeros(3, jnp.float32),
        g=g_world.astype(jnp.float32),
        R_ext=cfg.ext_R(),
        t_ext=cfg.ext_T(),
        P=P,
    )


def boxplus(x: NavState, dx) -> NavState:
    """Apply a 24-dim error-state increment."""
    return x._replace(
        R=so3.normalize_matrix(x.R @ so3.exp(dx[0:3])),
        p=x.p + dx[3:6],
        v=x.v + dx[6:9],
        bg=x.bg + dx[9:12],
        ba=x.ba + dx[12:15],
        g=x.g + dx[15:18],
        R_ext=so3.normalize_matrix(x.R_ext @ so3.exp(dx[18:21])),
        t_ext=x.t_ext + dx[21:24],
    )


def boxminus(a: NavState, b: NavState):
    """24-dim error a ⊟ b (so that b ⊞ (a ⊟ b) == a)."""
    return jnp.concatenate(
        [
            so3.log(b.R.T @ a.R),
            a.p - b.p,
            a.v - b.v,
            a.bg - b.bg,
            a.ba - b.ba,
            a.g - b.g,
            so3.log(b.R_ext.T @ a.R_ext),
            a.t_ext - b.t_ext,
        ]
    )
