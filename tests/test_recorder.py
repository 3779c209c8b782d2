import json
import os

import numpy as np

from fastliosam_tpu.io.rosbag import (
    BagWriter,
    encode_imu,
    encode_navsatfix,
    encode_pointcloud2,
)
from fastliosam_tpu.runtime.recorder import RecorderConfig, SensorRecorder, hkt_stamp_name
from tests.test_rosbag import make_cloud


def test_hkt_naming():
    # 2024-01-02 03:04:05.678 UTC == 11:04:05.678 HKT
    assert hkt_stamp_name(1704164645.678) == "20240102_110405_678"


def test_recorder_from_bag(tmp_path, rng):
    bag = str(tmp_path / "rec.bag")
    cloud = make_cloud(rng, 50)
    with BagWriter(bag) as w:
        for k in range(30):
            t = 1704164645.0 + k * 0.1
            w.write("/imu", "sensor_msgs/Imu", t,
                    encode_imu(t, [0.1, 0, 0], [0, 0, 9.8]))
        for k in range(3):
            t = 1704164645.0 + k
            w.write("/points", "sensor_msgs/PointCloud2", t,
                    encode_pointcloud2(cloud, t))
            w.write("/gps/fix", "sensor_msgs/NavSatFix", t + 0.01,
                    encode_navsatfix(t + 0.01, 22.3, 114.2, 5.0))

    out = str(tmp_path / "out")
    rec = SensorRecorder(RecorderConfig(out_dir=out, save_images=False))
    rec.consume_bag(bag)
    rec.close()

    imu_rows = np.loadtxt(os.path.join(out, "imu.txt"))
    assert imu_rows.shape == (30, 7)
    np.testing.assert_allclose(imu_rows[:, 1], 0.1)
    gnss_rows = np.loadtxt(os.path.join(out, "gnss.txt"))
    assert gnss_rows.shape == (3, 7)
    np.testing.assert_allclose(gnss_rows[:, 1], 22.3)
    clouds = os.listdir(os.path.join(out, "clouds"))
    assert len(clouds) == 3 and all(c.endswith(".pcd") for c in clouds)
    telemetry = [
        json.loads(line) for line in open(os.path.join(out, "telemetry.jsonl"))
    ]
    assert len(telemetry) >= 3
    assert telemetry[-1]["gnss"]["lat"] == 22.3
