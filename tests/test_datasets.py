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
