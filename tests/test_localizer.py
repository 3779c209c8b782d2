"""Map-based relocalization test: build a map from a sim run, then
localize fresh scans against the frozen map from a perturbed initial guess
(the FAST-LIO-Localization-QN consumer capability, `config.yaml:21`)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fastliosam_tpu.map import VoxelMapConfig
from fastliosam_tpu.odom import ImuBatch, OdomConfig, Scan
from fastliosam_tpu.runtime import MapLocalizer, save_results
from fastliosam_tpu.sim import PlaneWorld, SimConfig, Trajectory, simulate_sequence
from tests.test_engine import make_engine, run_engine

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def built_map(tmp_path_factory):
    world = PlaneWorld.room(size=30.0, height=6.0, n_boxes=10, seed=1)
    traj = Trajectory.circle(radius=8.0, period=16.0)
    cfg = SimConfig(
        scan_rate=5.0, n_azimuth=256, n_elev=10,
        gyro_noise=0.001, acc_noise=0.01, gyro_bias=(0, 0, 0),
        acc_bias=(0, 0, 0), seed=3,
    )
    data = simulate_sequence(world, traj, cfg, n_scans=85)
    engine = make_engine()
    run_engine(engine, data, traj)
    out = tmp_path_factory.mktemp("map")
    paths = save_results(engine, str(out), "locmap")
    # a later lap of the same world as the query stream
    data2 = simulate_sequence(world, traj, cfg, n_scans=10, t0=17.0)
    return paths["keyframes"], data2, traj


def test_localizer_tracks(built_map):
    bundle, data2, traj = built_map
    loc = MapLocalizer(
        bundle,
        map_cfg=VoxelMapConfig(capacity=1 << 16, voxel_size=0.4, min_points=4),
        odom_cfg=OdomConfig(
            point_filter_num=1, blind=0.5, filter_size_surf=0.3,
            num_ds_points=2048,
        ),
    )
    # initial guess: ground truth at stream start, perturbed
    R0, p0 = traj.pose(17.0)
    guess = np.eye(4, dtype=np.float32)
    guess[:3, :3] = R0
    guess[:3, 3] = p0 + np.array([0.4, -0.3, 0.1])
    pts, toff, mask = data2["scans"][0]
    scan0 = Scan(jnp.asarray(pts), jnp.asarray(toff), jnp.asarray(mask))
    fitness = loc.global_init(scan0, jnp.asarray(guess))
    assert fitness < 1.0

    errs = []
    cap = 64
    for k in range(len(data2["scans"])):
        pts, toff, mask = data2["scans"][k]
        scan = Scan(jnp.asarray(pts), jnp.asarray(toff), jnp.asarray(mask))
        ts, gy, ac = data2["imu"][k]
        n = len(ts)
        imu = ImuBatch(
            stamps=jnp.asarray(np.pad(ts, (0, cap - n), constant_values=1e9)),
            gyro=jnp.asarray(np.pad(gy, ((0, cap - n), (0, 0)))),
            acc=jnp.asarray(np.pad(ac, ((0, cap - n), (0, 0)))),
            mask=jnp.asarray(np.arange(cap) < n),
        )
        T, n_matched = loc.process(scan, imu, data2["scan_dt"])
        _, p_gt = data2["gt"][k]
        errs.append(np.linalg.norm(T[:3, 3] - p_gt))
        if k > 2:
            assert n_matched > 300
    # localization against the frozen map should stay decimeter-accurate
    assert float(np.sqrt(np.mean(np.square(errs)))) < 0.35, errs
