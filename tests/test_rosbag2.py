import sqlite3
import struct

import numpy as np

from fastliosam_tpu.io.rosbag2 import (
    Bag2Reader,
    decode_imu_cdr,
    decode_navsatfix_cdr,
    decode_pointcloud2_cdr,
    split_bag2,
)


def cdr_header(stamp: float, frame_id: str) -> bytes:
    sec = int(stamp)
    nanosec = int(round((stamp - sec) * 1e9))
    out = struct.pack("<iI", sec, nanosec)
    fid = frame_id.encode() + b"\x00"
    out += struct.pack("<I", len(fid)) + fid
    return out


def align(body: bytes, size: int) -> bytes:
    rem = len(body) % size
    return body + b"\x00" * ((size - rem) % size) if rem else body


def encode_imu_cdr(stamp, gyro, accel) -> bytes:
    body = cdr_header(stamp, "imu")
    body = align(body, 8)
    vals = [0.0, 0.0, 0.0, 1.0] + [0.0] * 9 + list(gyro) + [0.0] * 9
    vals += list(accel) + [0.0] * 9
    body += struct.pack("<" + "d" * len(vals), *vals)
    return b"\x00\x01\x00\x00" + body


def encode_navsatfix_cdr(stamp, lat, lon, alt) -> bytes:
    body = cdr_header(stamp, "gps")
    body += struct.pack("<b", 0)
    body = align(body, 2)
    body += struct.pack("<H", 1)
    body = align(body, 8)
    cov = np.zeros(9)
    cov[0] = cov[4] = 1.0
    cov[8] = 4.0
    body += struct.pack("<ddd", lat, lon, alt)
    body += cov.astype("<f8").tobytes()
    body += struct.pack("<B", 2)
    return b"\x00\x01\x00\x00" + body


def encode_pc2_cdr(cloud: np.ndarray, stamp: float) -> bytes:
    body = cdr_header(stamp, "lidar")
    body = align(body, 4)
    body += struct.pack("<II", 1, len(cloud))
    body += struct.pack("<I", len(cloud.dtype.names))
    from fastliosam_tpu.io.rosbag import _PF_CODES

    for name in cloud.dtype.names:
        dt, foff = cloud.dtype.fields[name]
        fid = name.encode() + b"\x00"
        body = align(body, 4)
        body += struct.pack("<I", len(fid)) + fid
        body = align(body, 4)
        body += struct.pack("<I", foff)
        body += struct.pack("<B", _PF_CODES[dt.base.str[1:]])
        body = align(body, 4)
        body += struct.pack("<I", 1)
    body += struct.pack("<B", 0)
    body = align(body, 4)
    step = cloud.dtype.itemsize
    body += struct.pack("<II", step, step * len(cloud))
    body += struct.pack("<I", step * len(cloud))
    body += cloud.tobytes()
    body += struct.pack("<B", 1)
    return b"\x00\x01\x00\x00" + body


def write_db3(path, rows):
    """rows: (topic, msg_type, stamp, raw)"""
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT, "
        "serialization_format TEXT, offered_qos_profiles TEXT)"
    )
    con.execute(
        "CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER, "
        "timestamp INTEGER, data BLOB)"
    )
    topics = {}
    for topic, mtype, _, _ in rows:
        if topic not in topics:
            tid = len(topics) + 1
            topics[topic] = tid
            con.execute("INSERT INTO topics VALUES (?, ?, ?, 'cdr', '')",
                        (tid, topic, mtype))
    for i, (topic, mtype, stamp, raw) in enumerate(rows):
        con.execute("INSERT INTO messages VALUES (?, ?, ?, ?)",
                    (i + 1, topics[topic], int(stamp * 1e9), raw))
    con.commit()
    con.close()


def test_bag2_read_and_decode(tmp_path, rng):
    cloud = np.zeros(50, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                                ("intensity", "<f4")])
    cloud["x"] = rng.normal(size=50)
    cloud["z"] = rng.normal(size=50)
    db = str(tmp_path / "bag_0.db3")
    write_db3(db, [
        ("/points", "sensor_msgs/msg/PointCloud2", 5.0, encode_pc2_cdr(cloud, 5.0)),
        ("/imu", "sensor_msgs/msg/Imu", 5.01,
         encode_imu_cdr(5.01, [0.1, 0.2, 0.3], [0, 0, 9.81])),
        ("/gps", "sensor_msgs/msg/NavSatFix", 5.5,
         encode_navsatfix_cdr(5.5, 22.3, 114.2, 4.0)),
    ])
    msgs = list(Bag2Reader(db))
    assert len(msgs) == 3
    pc, hdr = decode_pointcloud2_cdr(msgs[0].raw)
    np.testing.assert_allclose(pc["x"], cloud["x"])
    assert hdr["frame_id"] == "lidar"
    imu = decode_imu_cdr(msgs[1].raw)
    np.testing.assert_allclose(imu["angular_velocity"], [0.1, 0.2, 0.3])
    gps = decode_navsatfix_cdr(msgs[2].raw)
    assert abs(gps["latitude"] - 22.3) < 1e-12
    np.testing.assert_allclose(np.diag(gps["position_covariance"]), [1, 1, 4])


def test_split_bag2(tmp_path):
    db = str(tmp_path / "long_0.db3")
    rows = [
        ("/imu", "sensor_msgs/msg/Imu", 100.0 + k * 0.5,
         encode_imu_cdr(100.0 + k * 0.5, [0, 0, 0], [0, 0, 9.81]))
        for k in range(20)
    ]
    write_db3(db, rows)
    outs = split_bag2(db, str(tmp_path / "part_{i}.db3"), 4.0)
    assert len(outs) == 3
    total = sum(len(list(Bag2Reader(p))) for p in outs)
    assert total == 20
