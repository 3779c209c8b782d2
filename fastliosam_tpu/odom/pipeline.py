"""The per-scan odometry step: preprocess → propagate → deskew → downsample
→ iterated update → map insert → (periodic) eviction.

This is the jitted hot path replacing the reference's `fastlio_mapping`
process (SURVEY.md §3.1/3.6). One call advances the filter by one LiDAR
scan; all state (nav state + voxel map) lives on device and is donated
between steps by the runtime.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.pointcloud import Cloud, voxel_downsample
from ..map import voxel_hash as vh
from .iekf import iekf_update
from .imu import ImuBatch, deskew, propagate
from .state import GRAVITY, NavState, OdomConfig, init_state
from ..utils.precision import geometry_precision


class Scan(NamedTuple):
    """One LiDAR sweep in the sensor frame.

    ``t_offset`` is seconds since the previous scan end (same clock as the
    IMU batch); ``stamp`` the absolute end-of-scan time (host bookkeeping).
    """

    xyz: jnp.ndarray  # (N, 3)
    t_offset: jnp.ndarray  # (N,)
    mask: jnp.ndarray  # (N,)


class OdomState(NamedTuple):
    nav: NavState
    vmap: vh.VoxelMap
    scan_idx: jnp.ndarray  # int32 scalar
    initialized: jnp.ndarray  # bool scalar (map bootstrapped)
    # body angular-rate memory for the IMU-less coordinated-turn model
    # (re-estimated from consecutive pose corrections; unused with IMU)
    w_cv: jnp.ndarray  # (3,) rad/s


def init_odom(map_cfg: vh.VoxelMapConfig, odom_cfg: OdomConfig | None = None,
              g_world=None) -> OdomState:
    return OdomState(
        nav=init_state(g_world, odom_cfg),
        vmap=vh.make_map(map_cfg),
        scan_idx=jnp.zeros((), jnp.int32),
        initialized=jnp.zeros((), bool),
        w_cv=jnp.zeros((3,), jnp.float32),
    )


def gravity_from_imu(imu: ImuBatch):
    """Initial gravity estimate from averaged static accelerometer samples
    (FAST-LIO init capability). Returns world gravity assuming R0 = I."""
    w = imu.mask.astype(jnp.float32)
    mean_acc = jnp.sum(imu.acc * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    return -mean_acc / jnp.maximum(jnp.linalg.norm(mean_acc), 1e-6) * GRAVITY


def _preprocess(scan: Scan, cfg: OdomConfig) -> Scan:
    """blind ring filter + point stride (FAST-LIO preprocess contract)."""
    d2 = jnp.sum(scan.xyz * scan.xyz, axis=-1)
    mask = scan.mask & (d2 > cfg.blind**2) & (d2 < cfg.det_range**2)
    if cfg.point_filter_num > 1:
        idx = jnp.arange(scan.xyz.shape[0])
        mask = mask & ((idx % cfg.point_filter_num) == 0)
    return scan._replace(mask=mask)


@geometry_precision
def odom_step(
    state: OdomState,
    scan: Scan,
    imu: ImuBatch,
    scan_dt,
    cfg: OdomConfig,
    map_cfg: vh.VoxelMapConfig,
    map_ops=None,
):
    """Advance odometry by one scan. Fully jittable with static cfgs.

    Returns ``(new_state, aux)`` where aux carries the world pose (R, p),
    the deskewed world-frame downsampled cloud (the `/cloud_registered`
    analog), and diagnostics. ``map_ops`` (query, insert, evict) overrides
    the map backend — the slot-sharded multi-device map
    (`parallel/sharded_odom.py: sharded_map_ops`) plugs in here.
    """
    scan = _preprocess(scan, cfg)

    # --- IMU propagate + deskew into scan-end body frame ---
    # LiDAR-only sequences (e.g. KITTI odometry) have no IMU samples; fall
    # back to a coordinated-turn prediction — constant BODY velocity and
    # angular rate, both re-estimated from consecutive pose corrections
    # below — with inflated process noise so the iEKF still tracks.
    # (A translation-only constant-velocity model leaves the predicted
    # attitude one full turn-step stale at urban yaw rates — 4.6°/scan at
    # 8 m/s through a 10 m corner — and the prior then fights the
    # measurement every scan.)
    has_imu = jnp.any(imu.mask)
    nav_prop, traj = propagate(state.nav, imu, cfg, scan_dt)

    def cv_predict():
        from ..core import so3

        nav = state.nav
        dR = so3.exp(state.w_cv * scan_dt)
        R_new = nav.R @ dR
        # body-frame velocity rotates with the turn (coordinated turn)
        v_new = R_new @ (nav.R.T @ nav.v)
        p_new = nav.p + 0.5 * (nav.v + v_new) * scan_dt
        P = nav.P + jnp.diag(
            jnp.concatenate(
                [
                    jnp.full((3,), cfg.cv_rot_cov * scan_dt),
                    jnp.full((3,), cfg.cv_pos_cov * scan_dt),
                    jnp.full((3,), cfg.cv_vel_cov * scan_dt),
                    jnp.full((15,), 1e-8),
                ]
            ).astype(jnp.float32)
        )
        return nav._replace(R=R_new, p=p_new, v=v_new, P=P)

    nav_prop = jax.lax.cond(has_imu, lambda: nav_prop, cv_predict)
    pts_body = deskew(
        scan.xyz, scan.t_offset, scan.mask, traj, nav_prop, cfg, imu.mask, scan_dt
    )
    # without IMU there is no in-sweep pose trajectory: spin-rate deskew is
    # approximated by the constant-velocity translation only
    pts_body = jnp.where(
        has_imu,
        pts_body,
        jnp.where(
            scan.mask[:, None],
            scan.xyz @ state.nav.R_ext.T
            + state.nav.t_ext
            - (state.nav.R.T @ state.nav.v)[None, :]
            * (scan_dt - scan.t_offset)[:, None],
            1.0e6,
        ),
    )

    # --- spatial downsample to the iEKF budget (output comes packed) ---
    ds = voxel_downsample(Cloud(xyz=pts_body, mask=scan.mask), cfg.filter_size_surf)
    budget = min(cfg.num_ds_points, ds.xyz.shape[0])
    pts = ds.xyz[:budget]
    msk = ds.mask[:budget]

    # --- iterated update (identity when the map is still empty: zero valid
    # matches make the MAP step collapse to the propagated state) ---
    nav_upd, n_matched = iekf_update(
        nav_prop, pts, msk, state.vmap, map_cfg, cfg,
        query_fn=None if map_ops is None else map_ops.query,
    )
    # LiDAR-only: velocity/angular rate are unobservable through the
    # (absent) IMU model — re-estimate both from the pose correction for
    # the next coordinated-turn prediction
    v_fd = (nav_upd.p - state.nav.p) / jnp.maximum(scan_dt, 1e-3)
    # EMA against the previous velocity state (cv_vel_alpha doc): a
    # single-scan correction spike must not become the frozen coast
    # velocity of the next degenerate stretch
    v_sm = cfg.cv_vel_alpha * v_fd + (1.0 - cfg.cv_vel_alpha) * state.nav.v
    nav_upd = nav_upd._replace(
        v=jnp.where(has_imu, nav_upd.v, v_sm)
    )
    nav_new = jax.lax.cond(
        state.initialized, lambda: nav_upd, lambda: nav_prop
    )
    from ..core import so3

    w_fd = so3.log(state.nav.R.T @ nav_new.R) / jnp.maximum(scan_dt, 1e-3)
    # clamp to a plausible vehicle rate: a single bad-association attitude
    # jump would otherwise rotate both the predicted attitude AND the
    # body-velocity direction next scan (the spurious-correction feedback
    # loop the degeneracy remapping targets, via the attitude channel)
    w_mag = jnp.linalg.norm(w_fd)
    w_fd = w_fd * jnp.minimum(
        1.0, cfg.cv_max_rate / jnp.maximum(w_mag, 1e-9)
    )
    w_cv_new = jnp.where(has_imu, state.w_cv, w_fd)

    # --- map insert of the updated world-frame cloud (cached-plane refit
    # only needed when some query path reads cached planes) ---
    pw = pts @ nav_new.R.T + nav_new.p
    if map_ops is None:
        vmap_new, n_dropped = vh.insert(
            state.vmap, map_cfg, pw, msk,
            refresh_planes=(cfg.query_mode == "cached"),
        )
    else:
        vmap_new, n_dropped = map_ops.insert(state.vmap, map_cfg, pw, msk)

    # --- periodic FoV-sliding eviction ---
    do_evict = (state.scan_idx % cfg.evict_every) == (cfg.evict_every - 1)
    evict = vh.evict_far if map_ops is None else map_ops.evict
    vmap_new = jax.lax.cond(
        do_evict,
        lambda m: evict(m, map_cfg, nav_new.p, cfg.det_range),
        lambda m: m,
        vmap_new,
    )

    new_state = OdomState(
        nav=nav_new,
        vmap=vmap_new,
        scan_idx=state.scan_idx + 1,
        initialized=jnp.ones((), bool),
        w_cv=w_cv_new,
    )
    aux = {
        "R": nav_new.R,
        "p": nav_new.p,
        "v": nav_new.v,
        "cloud_world": pw,
        "cloud_mask": msk,
        "n_matched": n_matched,
        "n_dropped": n_dropped,
    }
    return new_state, aux


@geometry_precision
def odom_rollout(
    state: OdomState,
    scans: Scan,  # stacked: xyz (S, N, 3), t_offset (S, N), mask (S, N)
    imus: ImuBatch,  # stacked: (S, M, ...)
    scan_dt,
    cfg: OdomConfig,
    map_cfg: vh.VoxelMapConfig,
):
    """Run ``S`` scans in a single `lax.scan` — one XLA dispatch for the
    whole sequence (throughput path; also the benchmark harness). Returns
    the final state plus per-scan poses and match counts."""

    def step(s, inp):
        scan, imu = inp
        s2, aux = odom_step(s, scan, imu, scan_dt, cfg, map_cfg)
        return s2, (aux["R"], aux["p"], aux["n_matched"])

    state, (Rs, ps, matched) = jax.lax.scan(step, state, (scans, imus))
    return state, {"R": Rs, "p": ps, "n_matched": matched}
