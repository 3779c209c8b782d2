"""Long-trajectory hardening test (VERDICT r1 #4): >=1k keyframes through
the chunked engine with multiple loop closures, crossing the initial graph
capacity (so geometric growth + solver recompile happen mid-run), with no
silent factor drops.

Scans are tiny (512 rays) so thousands of odometry steps stay cheap; the
figure-8 trajectory self-intersects every half period, producing real
ICP-verified loops throughout.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fastliosam_tpu.loop import LoopConfig
from fastliosam_tpu.map import VoxelMapConfig
from fastliosam_tpu.odom import ImuBatch, OdomConfig, Scan
from fastliosam_tpu.pgo import PoseGraphConfig
from fastliosam_tpu.runtime import EngineConfig, SlamEngine
from fastliosam_tpu.sim import PlaneWorld, SimConfig, Trajectory, simulate_sequence

pytestmark = pytest.mark.slow

N_SCANS = 1160
CHUNK = 8
IMU_CAP = 64


@pytest.fixture(scope="module")
def long_run():
    world = PlaneWorld.room(size=36.0, height=6.0, n_boxes=10, seed=5)
    traj = Trajectory.figure8(scale=10.0, period=44.0, z_amp=0.2)
    cfg = SimConfig(
        scan_rate=5.0, n_azimuth=64, n_elev=8, max_range=60.0,
        gyro_noise=0.001, acc_noise=0.01, seed=5, time_groups=8,
    )
    return simulate_sequence(world, traj, cfg, n_scans=N_SCANS), traj


def test_long_trajectory_multi_loop(long_run):
    data, traj = long_run
    engine = SlamEngine(
        odom_cfg=OdomConfig(
            point_filter_num=1, blind=0.3, filter_size_surf=0.3,
            num_ds_points=512, det_range=80.0, evict_every=10_000,
        ),
        map_cfg=VoxelMapConfig(capacity=1 << 15, voxel_size=0.4, min_points=4),
        loop_cfg=LoopConfig(
            radius=5.0, time_gap=15.0, num_submap_keyframes=2,
            voxel_res=0.3, submap_points=2048, max_iterations=15,
            nn_chunk=512,
        ),
        # deliberately small caps: the run MUST grow past them
        pgo_cfg=PoseGraphConfig(
            max_keyframes=512, max_between=512, max_gps=16,
            lm_iters=3, pcg_iters=48, linear_solver="pcg",
        ),
        cfg=EngineConfig(
            keyframe_threshold=0.1,  # ~every scan -> >2k keyframes
            loop_check_every=CHUNK,
            kf_cloud_points=512, kf_cloud_voxel=0.3,
        ),
    )
    R0, p0 = traj.pose(0.0)
    engine.odom = engine.odom._replace(
        nav=engine.odom.nav._replace(
            R=jnp.asarray(R0, jnp.float32),
            p=jnp.asarray(p0, jnp.float32),
            v=jnp.asarray(traj.velocity(0.0), jnp.float32),
        )
    )

    def chunk_input(lo, hi):
        scans = Scan(
            xyz=jnp.asarray(np.stack([data["scans"][k][0] for k in range(lo, hi)])),
            t_offset=jnp.asarray(
                np.stack([data["scans"][k][1] for k in range(lo, hi)])
            ),
            mask=jnp.asarray(np.stack([data["scans"][k][2] for k in range(lo, hi)])),
        )
        imu_np = []
        for k in range(lo, hi):
            ts, gy, ac = data["imu"][k]
            n = len(ts)
            imu_np.append((
                np.pad(ts, (0, IMU_CAP - n), constant_values=1e9),
                np.pad(gy, ((0, IMU_CAP - n), (0, 0))),
                np.pad(ac, ((0, IMU_CAP - n), (0, 0))),
                np.arange(IMU_CAP) < n,
            ))
        imus = ImuBatch(
            stamps=jnp.asarray(np.stack([i[0] for i in imu_np])),
            gyro=jnp.asarray(np.stack([i[1] for i in imu_np])),
            acc=jnp.asarray(np.stack([i[2] for i in imu_np])),
            mask=jnp.asarray(np.stack([i[3] for i in imu_np])),
        )
        return scans, imus, [data["stamps"][k] for k in range(lo, hi)]

    with pytest.warns(UserWarning, match="capacity"):
        for c in range(0, N_SCANS, CHUNK):
            scans, imus, stamps = chunk_input(c, c + CHUNK)
            engine.process_chunk(scans, imus, stamps, data["scan_dt"])
        engine.finish()

    # scale + growth actually happened
    assert engine.kf.n >= 1100, engine.kf.n
    assert engine.pgo_cfg.max_keyframes >= 1024
    assert engine.pgo_cfg.max_between >= 1024
    # multi-loop: crossings every ~22 s over 232 s -> many chances
    assert len(engine.loop_pairs) >= 3, engine.loop_pairs
    assert engine.solve_count >= 1
    # NO silent drops: every odometry edge + every accepted loop is in the
    # graph (the round-1 failure mode was no-op adds at capacity)
    assert int(engine.graph.n_kf) == engine.kf.n
    expected_bt = engine.kf.n - 1 + len(engine.loop_pairs)
    assert int(engine.graph.n_bt) == expected_bt
    assert engine._n_bt_host == expected_bt
    # accuracy stays sane end-to-end (tiny 512-ray scans, so be lenient)
    gt = np.stack([g[1] for g in data["gt"]])
    est = np.stack(engine.realtime_traj)[:, :3, 3]
    ate = float(np.sqrt(np.mean(np.sum((est - gt) ** 2, axis=1))))
    assert ate < 1.0, f"long-run ATE {ate}"
    # keyframe poses finite after all solves
    assert np.all(np.isfinite(engine.keyframe_poses()))
