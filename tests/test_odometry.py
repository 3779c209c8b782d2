import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastliosam_tpu.core import so3
from fastliosam_tpu.map import VoxelMapConfig
from fastliosam_tpu.odom import (
    ImuBatch,
    OdomConfig,
    Scan,
    init_odom,
    odom_step,
    propagate,
)
from fastliosam_tpu.odom.pipeline import gravity_from_imu
from fastliosam_tpu.odom.state import init_state
from fastliosam_tpu.sim import PlaneWorld, SimConfig, Trajectory, simulate_sequence

MAP_CFG = VoxelMapConfig(capacity=1 << 16, voxel_size=0.4, min_points=4)
ODOM_CFG = OdomConfig(
    point_filter_num=1,
    blind=0.5,
    filter_size_surf=0.3,
    num_ds_points=4096,
    max_imu_per_scan=32,
    evict_every=1000,
)


def make_imu_batch(ts, gyro, acc, capacity=32):
    n = len(ts)
    pad = capacity - n
    assert pad >= 0
    return ImuBatch(
        stamps=jnp.asarray(np.pad(ts, (0, pad), constant_values=1e9)),
        gyro=jnp.asarray(np.pad(gyro, ((0, pad), (0, 0)))),
        acc=jnp.asarray(np.pad(acc, ((0, pad), (0, 0)))),
        mask=jnp.asarray(np.arange(capacity) < n),
    )


@pytest.fixture(scope="module")
def sim_data():
    world = PlaneWorld.room(size=30.0, height=6.0, n_boxes=10, seed=1)
    traj = Trajectory.circle(radius=8.0, period=60.0)
    cfg = SimConfig(
        n_azimuth=256,
        n_elev=12,
        gyro_noise=0.0005,
        acc_noise=0.005,
        gyro_bias=(0, 0, 0),
        acc_bias=(0, 0, 0),
        seed=3,
    )
    return simulate_sequence(world, traj, cfg, n_scans=20), traj, cfg


def test_imu_propagation_tracks_truth(sim_data):
    data, traj, cfg = sim_data
    # start from exact ground truth at t=0 and dead-reckon 20 scans
    R0, p0 = traj.pose(0.0)
    x = init_state()
    x = x._replace(R=jnp.asarray(R0, jnp.float32), p=jnp.asarray(p0, jnp.float32),
                   v=jnp.asarray(traj.velocity(0.0), jnp.float32))
    ocfg = ODOM_CFG
    for k in range(20):
        ts, gyro, acc = data["imu"][k]
        imu = make_imu_batch(ts, gyro, acc)
        x, _ = propagate(x, imu, ocfg, data["scan_dt"])
    R_gt, p_gt = data["gt"][-1]
    pos_err = np.linalg.norm(np.asarray(x.p) - p_gt)
    rot_err = np.linalg.norm(
        np.asarray(so3.log(jnp.asarray(R_gt.T, jnp.float32) @ x.R))
    )
    # 2 seconds of dead reckoning with low noise: sub-decimeter, sub-degree
    assert pos_err < 0.15, f"position drift {pos_err}"
    assert rot_err < 0.02, f"rotation drift {rot_err}"


def test_gravity_init(sim_data):
    data, traj, cfg = sim_data
    ts, gyro, acc = data["imu"][0]
    imu = make_imu_batch(ts, gyro, acc)
    g = np.asarray(gravity_from_imu(imu))
    # trajectory is gentle: gravity direction dominates accel
    assert g[2] < -9.0
    np.testing.assert_allclose(np.linalg.norm(g), 9.81, atol=1e-3)


def test_odometry_end_to_end(sim_data):
    """Full iEKF+map loop on 20 synthetic scans: trajectory error stays small
    (this is the minimum end-to-end slice of SURVEY.md §7)."""
    data, traj, cfg = sim_data
    R0, p0 = traj.pose(0.0)
    state = init_odom(MAP_CFG)
    nav = state.nav._replace(
        R=jnp.asarray(R0, jnp.float32),
        p=jnp.asarray(p0, jnp.float32),
        v=jnp.asarray(traj.velocity(0.0), jnp.float32),
    )
    state = state._replace(nav=nav)

    step = jax.jit(
        lambda s, scan, imu, dt: odom_step(s, scan, imu, dt, ODOM_CFG, MAP_CFG),
        donate_argnums=(0,),
    )

    errs = []
    for k in range(20):
        pts, toff, mask = data["scans"][k]
        scan = Scan(
            xyz=jnp.asarray(pts), t_offset=jnp.asarray(toff), mask=jnp.asarray(mask)
        )
        ts, gyro, acc = data["imu"][k]
        imu = make_imu_batch(ts, gyro, acc)
        state, aux = step(state, scan, imu, jnp.float32(data["scan_dt"]))
        R_gt, p_gt = data["gt"][k]
        errs.append(np.linalg.norm(np.asarray(aux["p"]) - p_gt))
        if k >= 2:
            assert int(aux["n_matched"]) > 500, f"scan {k}: too few matches"
    ate = float(np.sqrt(np.mean(np.square(errs))))
    assert ate < 0.10, f"odometry ATE too high: {ate:.3f} m (errs={errs})"


def test_odom_step_shapes_static(sim_data):
    """odom_step must compile once: two different scans hit the same cache."""
    data, traj, cfg = sim_data
    state = init_odom(MAP_CFG)
    step = jax.jit(
        lambda s, scan, imu, dt: odom_step(s, scan, imu, dt, ODOM_CFG, MAP_CFG)
    )
    for k in range(2):
        pts, toff, mask = data["scans"][k]
        scan = Scan(
            xyz=jnp.asarray(pts), t_offset=jnp.asarray(toff), mask=jnp.asarray(mask)
        )
        ts, gyro, acc = data["imu"][k]
        imu = make_imu_batch(ts, gyro, acc)
        state, aux = step(state, scan, imu, jnp.float32(data["scan_dt"]))
    assert step._cache_size() == 1


def test_lidar_only_tracking(sim_data):
    """No-IMU (KITTI odometry style) tracking via the constant-velocity
    fallback: drift stays bounded over 20 scans."""
    data, traj, cfg = sim_data
    R0, p0 = traj.pose(0.0)
    state = init_odom(MAP_CFG)
    state = state._replace(
        nav=state.nav._replace(
            R=jnp.asarray(R0, jnp.float32),
            p=jnp.asarray(p0, jnp.float32),
            v=jnp.asarray(traj.velocity(0.0), jnp.float32),
        )
    )
    ocfg = ODOM_CFG._replace(max_residual=1.5)
    step = jax.jit(lambda s, scan, imu, dt: odom_step(s, scan, imu, dt, ocfg, MAP_CFG))
    empty = ImuBatch(
        stamps=jnp.full((32,), 1e9, jnp.float32),
        gyro=jnp.zeros((32, 3)),
        acc=jnp.zeros((32, 3)),
        mask=jnp.zeros((32,), bool),
    )
    errs = []
    for k in range(20):
        pts, toff, mask = data["scans"][k]
        scan = Scan(jnp.asarray(pts), jnp.asarray(toff), jnp.asarray(mask))
        state, aux = step(state, scan, empty, jnp.float32(data["scan_dt"]))
        _, p_gt = data["gt"][k]
        errs.append(np.linalg.norm(np.asarray(aux["p"]) - p_gt))
    ate = float(np.sqrt(np.mean(np.square(errs))))
    assert ate < 0.25, f"lidar-only ATE {ate} errs={errs}"


def test_bias_estimation_converges():
    """With IMU biases enabled in the simulator, the filter's bias states
    must move toward the true biases over a longer run (validates the
    F-matrix bias coupling of the error-state model)."""
    world = PlaneWorld.room(size=30.0, height=6.0, n_boxes=10, seed=1)
    traj = Trajectory.circle(radius=8.0, period=60.0)
    true_bg = (0.01, -0.008, 0.012)
    cfg = SimConfig(
        n_azimuth=256, n_elev=12, gyro_noise=0.0005, acc_noise=0.005,
        gyro_bias=true_bg, acc_bias=(0.0, 0.0, 0.0), seed=4,
    )
    data = simulate_sequence(world, traj, cfg, n_scans=40)
    R0, p0 = traj.pose(0.0)
    state = init_odom(MAP_CFG)
    state = state._replace(
        nav=state.nav._replace(
            R=jnp.asarray(R0, jnp.float32),
            p=jnp.asarray(p0, jnp.float32),
            v=jnp.asarray(traj.velocity(0.0), jnp.float32),
        )
    )
    ocfg = ODOM_CFG._replace(b_gyr_cov=1e-3)
    step = jax.jit(
        lambda s, scan, imu, dt: odom_step(s, scan, imu, dt, ocfg, MAP_CFG),
        donate_argnums=(0,),
    )
    for k in range(40):
        pts, toff, mask = data["scans"][k]
        scan = Scan(jnp.asarray(pts), jnp.asarray(toff), jnp.asarray(mask))
        ts, gyro, acc = data["imu"][k]
        imu = make_imu_batch(ts, gyro, acc)
        state, aux = step(state, scan, imu, jnp.float32(data["scan_dt"]))
    bg = np.asarray(state.nav.bg)
    err0 = np.linalg.norm(np.asarray(true_bg))
    err = np.linalg.norm(bg - np.asarray(true_bg))
    # bias estimate should have absorbed most of the true bias
    assert err < 0.65 * err0, f"bg={bg} true={true_bg}"


def test_extrinsic_estimation_converges():
    """Online LiDAR-IMU extrinsic refinement (extrinsic_est_en).

    Observability note: when the map itself is built from the same
    mis-calibrated points, residuals stay self-consistent and the extrinsic
    is only weakly observable (true of FAST-LIO as well). The clean
    observable setting is matching against an accurate prior map — so the
    test builds the map from ground-truth-posed scans (true extrinsic) and
    then runs the filter with a perturbed extrinsic.
    """
    true_t = np.array([0.15, -0.1, 0.05])
    world = PlaneWorld.room(size=30.0, height=6.0, n_boxes=10, seed=1)
    traj = Trajectory.circle(radius=8.0, period=20.0)
    cfg = SimConfig(
        n_azimuth=256, n_elev=12, gyro_noise=0.0005, acc_noise=0.005,
        gyro_bias=(0, 0, 0), acc_bias=(0, 0, 0), seed=6, lidar_t=true_t,
    )
    data = simulate_sequence(world, traj, cfg, n_scans=40)

    # build an accurate map: scans placed with ground-truth poses + true ext
    from fastliosam_tpu.map import insert, make_map

    m = make_map(MAP_CFG)
    for k in range(0, 40, 2):
        pts, toff, mask = data["scans"][k]
        R_gt, p_gt = data["gt"][k]
        pw = (pts + true_t) @ R_gt.T + p_gt  # lidar_R = I in this sim
        m, _ = insert(m, MAP_CFG, jnp.asarray(pw.astype(np.float32)),
                      jnp.asarray(mask))

    wrong_t = true_t + np.array([0.1, 0.08, -0.06])
    ocfg = ODOM_CFG._replace(
        extrinsic_est_en=True,
        extrinsic_T=tuple(wrong_t),
        extrinsic_prior_cov=5e-2,
        max_iteration=4,
    )
    from fastliosam_tpu.odom.iekf import iekf_update
    from fastliosam_tpu.odom.imu import deskew, propagate
    from fastliosam_tpu.core.pointcloud import Cloud, voxel_downsample

    state = init_odom(MAP_CFG, ocfg)._replace(vmap=m)
    R0, p0 = traj.pose(0.0)
    nav = state.nav._replace(
        R=jnp.asarray(R0, jnp.float32), p=jnp.asarray(p0, jnp.float32),
        v=jnp.asarray(traj.velocity(0.0), jnp.float32),
    )

    @jax.jit
    def loc_step(nav, scan_xyz, toff, mask, imu):
        nav_prop, traj_ = propagate(nav, imu, ocfg, jnp.float32(data["scan_dt"]))
        pts_body = deskew(scan_xyz, toff, mask, traj_, nav_prop, ocfg,
                          imu.mask, jnp.float32(data["scan_dt"]))
        ds = voxel_downsample(Cloud(xyz=pts_body, mask=mask), 0.3)
        nav_new, n_matched = iekf_update(
            nav_prop, ds.xyz[:4096], ds.mask[:4096], m, MAP_CFG, ocfg
        )
        return nav_new, n_matched

    err0 = np.linalg.norm(wrong_t - true_t)
    for k in range(40):
        pts, toff, mask = data["scans"][k]
        ts, gyro, acc = data["imu"][k]
        nav, nm = loc_step(
            nav, jnp.asarray(pts), jnp.asarray(toff), jnp.asarray(mask),
            make_imu_batch(ts, gyro, acc),
        )
    est_t = np.asarray(nav.t_ext)
    err = np.linalg.norm(est_t - true_t)
    # cross-track/vertical components are strongly observable and should
    # converge tightly; the along-track component needs far more heading
    # change (classic extrinsic observability), so only require net progress
    assert err < 0.75 * err0, f"t_ext={est_t} true={true_t} (err {err} vs {err0})"
    assert abs(est_t[1] - true_t[1]) < 0.02, est_t
    assert abs(est_t[2] - true_t[2]) < 0.02, est_t

    # with estimation DISABLED the extrinsic must not move
    ocfg2 = ocfg._replace(extrinsic_est_en=False)
    state2 = init_odom(MAP_CFG, ocfg2)
    step2 = jax.jit(
        lambda s, scan, imu, dt: odom_step(s, scan, imu, dt, ocfg2, MAP_CFG),
        donate_argnums=(0,),
    )
    for k in range(3):
        pts, toff, mask = data["scans"][k]
        scan = Scan(jnp.asarray(pts), jnp.asarray(toff), jnp.asarray(mask))
        ts, gyro, acc = data["imu"][k]
        imu = make_imu_batch(ts, gyro, acc)
        state2, _ = step2(state2, scan, imu, jnp.float32(data["scan_dt"]))
    np.testing.assert_allclose(
        np.asarray(state2.nav.t_ext), wrong_t.astype(np.float32), atol=1e-5
    )


def test_propagate_parallel_matches_sequential(rng):
    """The parallel-prefix propagate must reproduce the sequential scan."""
    from fastliosam_tpu.odom.imu import ImuBatch, propagate, propagate_sequential
    from fastliosam_tpu.odom.state import OdomConfig, init_state

    import jax.numpy as jnp

    cfg = OdomConfig()
    x = init_state(cfg=cfg)
    x = x._replace(
        v=jnp.asarray([1.0, -0.5, 0.2]),
        bg=jnp.asarray([0.01, -0.02, 0.005]),
        ba=jnp.asarray([0.05, 0.02, -0.1]),
        P=jnp.asarray(
            np.diag(rng.uniform(1e-4, 1e-2, 24)).astype(np.float32)
        ),
    )
    M = 32
    n_valid = 27
    stamps = np.sort(rng.uniform(0, 0.095, M)).astype(np.float32)
    stamps[n_valid:] = 1e9
    imu = ImuBatch(
        stamps=jnp.asarray(stamps),
        gyro=jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32) * 0.3),
        acc=jnp.asarray(
            (rng.normal(size=(M, 3)) * 0.5 + [0, 0, 9.81]).astype(np.float32)
        ),
        mask=jnp.asarray(np.arange(M) < n_valid),
    )
    xs, trs = propagate_sequential(x, imu, cfg, 0.1)
    xp, trp = propagate(x, imu, cfg, 0.1)
    np.testing.assert_allclose(np.asarray(xp.R), np.asarray(xs.R), atol=2e-5)
    np.testing.assert_allclose(np.asarray(xp.p), np.asarray(xs.p), atol=2e-5)
    np.testing.assert_allclose(np.asarray(xp.v), np.asarray(xs.v), atol=2e-5)
    np.testing.assert_allclose(np.asarray(xp.P), np.asarray(xs.P),
                               rtol=1e-3, atol=1e-6)
    for a, b in zip(trp[:5], trs[:5]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
