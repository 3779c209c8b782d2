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
