import numpy as np

from fastliosam_tpu.io.rosbag import (
    BagReader,
    BagWriter,
    DECODERS,
    decode_imu,
    decode_navsatfix,
    decode_pointcloud2,
    decode_string,
    encode_imu,
    encode_navsatfix,
    encode_pointcloud2,
    encode_string,
    split_bag,
)


def make_cloud(rng, n=100):
    cloud = np.zeros(
        n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("intensity", "<f4")]
    )
    cloud["x"] = rng.normal(size=n)
    cloud["y"] = rng.normal(size=n)
    cloud["z"] = rng.normal(size=n)
    cloud["intensity"] = rng.uniform(0, 255, n)
    return cloud


def test_bag_roundtrip(tmp_path, rng):
    path = str(tmp_path / "test.bag")
    cloud = make_cloud(rng)
    with BagWriter(path) as w:
        w.write("/points", "sensor_msgs/PointCloud2", 10.0,
                encode_pointcloud2(cloud, 10.0))
        w.write("/imu", "sensor_msgs/Imu", 10.01,
                encode_imu(10.01, [0.1, 0.2, 0.3], [0.0, 0.0, 9.81]))
        w.write("/gps/fix", "sensor_msgs/NavSatFix", 10.5,
                encode_navsatfix(10.5, 22.3, 114.2, 5.0))
        w.write("/save_dir", "std_msgs/String", 11.0, encode_string("/tmp/x"))
    msgs = list(BagReader(path))
    assert [m.topic for m in msgs] == ["/points", "/imu", "/gps/fix", "/save_dir"]
    assert [m.msg_type for m in msgs] == [
        "sensor_msgs/PointCloud2", "sensor_msgs/Imu",
        "sensor_msgs/NavSatFix", "std_msgs/String",
    ]

    pc, hdr = decode_pointcloud2(msgs[0].raw)
    np.testing.assert_allclose(pc["x"], cloud["x"])
    np.testing.assert_allclose(pc["intensity"], cloud["intensity"])
    assert abs(hdr["stamp"] - 10.0) < 1e-6

    imu = decode_imu(msgs[1].raw)
    np.testing.assert_allclose(imu["angular_velocity"], [0.1, 0.2, 0.3])
    np.testing.assert_allclose(imu["linear_acceleration"], [0, 0, 9.81])

    gps = decode_navsatfix(msgs[2].raw)
    assert abs(gps["latitude"] - 22.3) < 1e-9
    assert gps["status"] == 0
    np.testing.assert_allclose(np.diag(gps["position_covariance"]), [1, 1, 4])

    assert decode_string(msgs[3].raw) == "/tmp/x"


def test_split_bag(tmp_path, rng):
    path = str(tmp_path / "long.bag")
    with BagWriter(path) as w:
        for k in range(100):
            w.write("/imu", "sensor_msgs/Imu", 100.0 + k * 0.1,
                    encode_imu(100.0 + k * 0.1, [0, 0, 0], [0, 0, 9.81]))
    outs = split_bag(path, str(tmp_path / "seg_{i}.bag"), segment_seconds=4.0)
    assert len(outs) == 3
    n_total = sum(len(list(BagReader(p))) for p in outs)
    assert n_total == 100
    # overlapping split keeps duplicates across boundaries
    outs2 = split_bag(path, str(tmp_path / "ov_{i}.bag"), 4.0, overlap_seconds=1.0)
    n_total2 = sum(len(list(BagReader(p))) for p in outs2)
    assert n_total2 > 100


def test_decoders_registry():
    assert "livox_ros_driver/CustomMsg" in DECODERS
    assert "nav_msgs/Odometry" in DECODERS
