"""Dataset reader tests against synthetic on-disk fixtures."""
import os

import numpy as np

from fastliosam_tpu.io import KittiSequence
from fastliosam_tpu.io.mulran import MulranSequence
from fastliosam_tpu.io.newer_college import NewerCollegeSequence
from fastliosam_tpu.io.rosbag import BagWriter, encode_imu, encode_pointcloud2
from tests.test_rosbag import make_cloud


def test_kitti_reader(tmp_path, rng):
    seq_dir = tmp_path / "sequences" / "07"
    velo = seq_dir / "velodyne"
    velo.mkdir(parents=True)
    for i in range(3):
        pts = rng.normal(size=(500, 4)).astype(np.float32)
        pts.tofile(velo / f"{i:06d}.bin")
    np.savetxt(seq_dir / "times.txt", np.arange(3) * 0.1)
    (seq_dir / "calib.txt").write_text(
        "Tr: 1 0 0 0 0 1 0 0 0 0 1 0\n"
    )
    poses_dir = tmp_path / "poses"
    poses_dir.mkdir()
    np.savetxt(poses_dir / "07.txt", np.tile(np.eye(4)[:3].ravel(), (3, 1)))

    seq = KittiSequence(str(tmp_path), "07")
    assert len(seq) == 3
    xyz, inten, toff = seq.scan(0)
    assert xyz.shape == (500, 3)
    assert toff.min() >= 0 and toff.max() <= 0.1
    assert "Tr" in seq.calib
    gt = seq.gt_poses()
    assert gt.shape == (3, 4, 4)


def test_drive_kitti_q16_matches_f32(tmp_path, rng):
    """The production reader's quantized upload path (native filter + int16
    fixed point, VERDICT r4 #3) must reproduce the float32 path within
    quantization tolerance on a real drive through the engine."""
    import jax.numpy as jnp  # noqa: F401

    from fastliosam_tpu.loop import LoopConfig
    from fastliosam_tpu.map import VoxelMapConfig
    from fastliosam_tpu.odom import OdomConfig
    from fastliosam_tpu.pgo import PoseGraphConfig
    from fastliosam_tpu.runtime import EngineConfig, SlamEngine
    from fastliosam_tpu.runtime.drivers import drive_kitti

    seq_dir = tmp_path / "sequences" / "00"
    velo = seq_dir / "velodyne"
    velo.mkdir(parents=True)
    n_scans = 9
    for i in range(n_scans):
        r = np.random.default_rng(50 + i)
        world = np.concatenate([
            np.stack([r.uniform(-8, 8, 400), r.uniform(-8, 8, 400),
                      np.full(400, -1.0)], 1),
            np.stack([np.full(300, 8.0), r.uniform(-8, 8, 300),
                      r.uniform(-1, 3, 300)], 1),
            np.stack([r.uniform(-8, 8, 324), np.full(324, -8.0),
                      r.uniform(-1, 3, 324)], 1),
        ]).astype(np.float32)
        body = world - np.asarray([0.2 * i, 0.0, 0.0], np.float32)
        rec = np.concatenate(
            [body, np.full((len(body), 1), 0.5, np.float32)], axis=1
        )
        rec.tofile(velo / f"{i:06d}.bin")
    np.savetxt(seq_dir / "times.txt", np.arange(n_scans) * 0.1)
    (seq_dir / "calib.txt").write_text("Tr: 1 0 0 0 0 1 0 0 0 0 1 0\n")

    def build():
        return SlamEngine(
            odom_cfg=OdomConfig(
                point_filter_num=1, blind=0.5, filter_size_surf=0.3,
                num_ds_points=512, evict_every=10_000, det_range=60.0,
            ),
            map_cfg=VoxelMapConfig(capacity=1 << 13, voxel_size=0.4,
                                   min_points=4),
            loop_cfg=LoopConfig(radius=0.1, time_gap=1e9,
                                num_submap_keyframes=1, submap_points=256,
                                max_iterations=2, nn_chunk=64),
            pgo_cfg=PoseGraphConfig(max_keyframes=16, max_between=32,
                                    max_gps=4, lm_iters=2, pcg_iters=8),
            cfg=EngineConfig(keyframe_threshold=0.15, loop_check_every=100,
                             kf_cloud_points=256),
        )

    e_q = build()
    drive_kitti(e_q, str(tmp_path), "00", scan_capacity=1024, chunk=3,
                progress=False, upload="q16")
    e_f = build()
    drive_kitti(e_f, str(tmp_path), "00", scan_capacity=1024, chunk=3,
                progress=False, upload="f32")
    tq = np.stack(e_q.realtime_traj)[:, :3, 3]
    tf = np.stack(e_f.realtime_traj)[:, :3, 3]
    assert e_q.kf.n == e_f.kf.n
    np.testing.assert_allclose(tq, tf, rtol=0, atol=0.03)


def test_mulran_reader(tmp_path, rng):
    sd = tmp_path / "sensor_data"
    ouster = sd / "Ouster"
    ouster.mkdir(parents=True)
    for k in range(2):
        stamp_ns = 1500000000000000000 + k * 100000000
        pts = rng.normal(size=(1024 * 64 // 16, 4)).astype(np.float32)
        pts.tofile(ouster / f"{stamp_ns}.bin")
    imu_rows = np.zeros((50, 17))
    imu_rows[:, 0] = 1500000000000000000 + np.arange(50) * 5000000
    imu_rows[:, 8:11] = 0.01
    imu_rows[:, 11:14] = [0, 0, 9.81]
    np.savetxt(sd / "xsens_imu.csv", imu_rows, delimiter=",")
    gps_rows = np.zeros((3, 13))
    gps_rows[:, 0] = 1500000000000000000 + np.arange(3) * 100000000
    gps_rows[:, 1] = 36.37
    gps_rows[:, 2] = 127.36
    gps_rows[:, 4] = 2.5  # cov[0,0]
    gps_rows[:, 8] = 2.5
    gps_rows[:, 12] = 9.0
    np.savetxt(sd / "gps.csv", gps_rows, delimiter=",")
    gt_rows = np.zeros((2, 13))
    gt_rows[:, 0] = 1500000000000000000
    gt_rows[:, 1:13] = np.eye(4)[:3].ravel()
    np.savetxt(tmp_path / "global_pose.csv", gt_rows, delimiter=",")

    seq = MulranSequence(str(tmp_path))
    assert len(seq) == 2
    xyz, inten, toff = seq.scan(0)
    assert xyz.shape[1] == 3 and toff.max() <= 0.1
    t0 = seq.stamps[0]
    ts, gyro, acc = seq.imu_between(t0 - 1, t0 + 1)
    assert len(ts) > 0 and np.allclose(acc[:, 2], 9.81)
    fixes = seq.gps_between(t0 - 1, t0 + 1)
    assert len(fixes) >= 1
    stamp, lat, lon, alt, cov = fixes[0]
    assert abs(lat - 36.37) < 1e-9
    np.testing.assert_allclose(cov, [2.5, 2.5, 9.0])
    assert seq.gt["poses"].shape == (2, 4, 4)


def test_newer_college_reader(tmp_path, rng):
    bag = str(tmp_path / "nc.bag")
    cloud = make_cloud(rng, 200)
    with BagWriter(bag) as w:
        for k in range(2):
            t = 1000.0 + k * 0.1
            w.write("/os1_cloud_node/points", "sensor_msgs/PointCloud2", t,
                    encode_pointcloud2(cloud, t))
            for j in range(5):
                ti = t + j * 0.02
                w.write("/os1_cloud_node/imu", "sensor_msgs/Imu", ti,
                        encode_imu(ti, [0, 0, 0.1], [0, 0, 9.81]))
    gt = tmp_path / "registered_poses.csv"
    gt.write_text(
        "sec,nsec,x,y,z,qx,qy,qz,qw\n"
        "1000,0,0,0,0,0,0,0,1\n"
        "1000,100000000,1,0,0,0,0,0,1\n"
    )
    seq = NewerCollegeSequence(bags=bag, gt_csv=str(gt))
    events = list(seq.stream())
    kinds = [e[0] for e in events]
    assert kinds.count("scan") == 2 and kinds.count("imu") == 10
    _, stamp, (xyz, inten, toff) = events[0]
    assert xyz.shape == (200, 3)
    assert seq.gt["poses"].shape == (2, 4, 4)
    np.testing.assert_allclose(seq.gt["poses"][1][:3, 3], [1, 0, 0])


def test_bag_sequence_presets(tmp_path, rng):
    """BagSequence streams scans/imu/gps through a SensorPreset (the
    run.launch `lidar:=` selection, run.launch:20-46)."""
    from fastliosam_tpu.io.presets import PRESETS, BagSequence
    from fastliosam_tpu.io.rosbag import encode_navsatfix

    pre = PRESETS["vbr-colosseo"]
    # ouster-style cloud: per-point "t" field in nanoseconds
    n = 150
    cloud = np.zeros(
        n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                  ("intensity", "<f4"), ("t", "<u4")]
    )
    cloud["x"] = rng.normal(size=n)
    cloud["y"] = rng.normal(size=n)
    cloud["z"] = rng.normal(size=n)
    cloud["t"] = (np.linspace(0, 0.1, n) * 1e9).astype(np.uint32)
    bag = str(tmp_path / "vbr.bag")
    with BagWriter(bag) as w:
        for k in range(2):
            t = 500.0 + 0.1 * k
            w.write(pre.lid_topic, "sensor_msgs/PointCloud2", t,
                    encode_pointcloud2(cloud, t))
            for j in range(4):
                ti = t + 0.025 * j
                w.write(pre.imu_topic, "sensor_msgs/Imu", ti,
                        encode_imu(ti, [0, 0, 0.05], [0, 0, 9.81]))
        w.write(pre.gps_topic, "sensor_msgs/NavSatFix", 500.05,
                encode_navsatfix(500.05, 22.3, 114.2, 5.0))
    events = list(BagSequence(bag, pre).stream())
    kinds = [e[0] for e in events]
    assert kinds.count("scan") == 2
    assert kinds.count("imu") == 8
    assert kinds.count("gps") == 1
    _, stamp, (xyz, inten, toff) = [e for e in events if e[0] == "scan"][0]
    assert xyz.shape == (n, 3)
    # timestamp_unit=3 (ns) scaling applied, sweep-relative
    assert toff.min() == 0.0 and abs(toff.max() - 0.1) < 1e-3
    _, _, (lat, lon, alt, cov, status) = [e for e in events if e[0] == "gps"][0]
    assert abs(lat - 22.3) < 1e-9 and status == 0


def test_preset_odom_kwargs():
    """Preset parameter surface matches the reference launch contract."""
    from fastliosam_tpu.io.presets import PRESETS, odom_config_kwargs
    from fastliosam_tpu.odom import OdomConfig

    for name, pre in PRESETS.items():
        cfg = OdomConfig(**odom_config_kwargs(pre))
        assert cfg.max_iteration == 3  # all reference launches use 3
        R = np.asarray(cfg.ext_R())
        # extrinsic rotations are valid rotation matrices
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
    assert PRESETS["mulran"].point_filter_num == 3  # mulran.launch
    assert PRESETS["kimera-multi"].filter_size_surf == 0.2  # kimera launch
    # per-robot kimera-multi variants (run.launch:38-43)
    assert PRESETS["kimera-multi-acl_jackal2"].lid_topic == "/acl_jackal2/lidar_points"
    assert PRESETS["kimera-multi-apis"].lid_topic == "/apis/lidar_points"
    assert PRESETS["kimera-multi-apis"].imu_topic == "/apis/forward/imu"
