"""Dataset drive loops: stream a dataset through a `SlamEngine` with the
chunked single-sync path + one-chunk-ahead staging.

This is the production feed path the reference implements with ROS playback
+ TCPROS (`run.launch:14-17`): here the decode (native mmap reader) and the
host→device transfer of chunk k+1 overlap the device compute of chunk k,
and the engine pays ONE host sync per chunk (`SlamEngine.process_chunk`).
"""
from __future__ import annotations

import os
import time

import numpy as np


def drive_kitti(engine, root: str, seq: str = "00", scan_capacity: int = 65536,
                chunk: int = 5, n_scans: int | None = None, progress=True):
    """Run a KITTI odometry sequence through the engine (reader + native
    prefetcher + chunked engine path). Returns a dict with throughput and —
    when ground truth exists — ATE/RPE of the realtime trajectory.

    KITTI odometry carries no IMU: the engine runs LiDAR-only (constant-
    velocity propagation, `odom/pipeline.py`)."""
    import jax
    import jax.numpy as jnp

    from ..io import KittiSequence
    from ..io.kitti import _azimuth_time_offsets
    from ..io.native import read_bin
    from ..odom import ImuBatch, Scan

    seq_obj = KittiSequence(root, seq)
    S = len(seq_obj) if n_scans is None else min(n_scans, len(seq_obj))
    cap = scan_capacity
    imu_cap = 8
    empty_imu_np = (
        np.full((chunk, imu_cap), 1e9, np.float32),
        np.zeros((chunk, imu_cap, 3), np.float32),
        np.zeros((chunk, imu_cap, 3), np.float32),
        np.zeros((chunk, imu_cap), bool),
    )

    def stage(c0, n):
        """Decode + async host→device transfer of scans [c0, c0+n)."""
        xyz = np.full((chunk, cap, 3), 1.0e6, np.float32)
        toff = np.zeros((chunk, cap), np.float32)
        mask = np.zeros((chunk, cap), bool)
        for i in range(n):
            raw, npts = read_bin(
                os.path.join(seq_obj.velo_dir, seq_obj.files[c0 + i]), cap
            )
            xyz[i, :] = 1.0e6
            xyz[i, : raw.shape[0]] = raw[:, :3]
            toff[i, : raw.shape[0]] = _azimuth_time_offsets(raw[:, :3])
            mask[i] = np.arange(cap) < npts
        scans = Scan(
            xyz=jax.device_put(xyz),
            t_offset=jax.device_put(toff),
            mask=jax.device_put(mask),
        )
        imus = ImuBatch(
            stamps=jax.device_put(empty_imu_np[0]),
            gyro=jax.device_put(empty_imu_np[1]),
            acc=jax.device_put(empty_imu_np[2]),
            mask=jax.device_put(empty_imu_np[3]),
        )
        stamps = np.asarray(seq_obj.times[c0: c0 + n], np.float64)
        if n < chunk:  # pad the tail chunk with repeats of the last stamp
            stamps = np.concatenate(
                [stamps, np.full(chunk - n, stamps[-1])])
        return scans, imus, stamps

    dts = np.diff(np.asarray(seq_obj.times[:S], np.float64))
    dt = float(np.median(dts)) if len(dts) else 0.1

    t0 = time.perf_counter()
    nxt = stage(0, min(chunk, S))
    c = 0
    while c < S:
        scans, imus, stamps = nxt
        n_here = min(chunk, S - c)
        if c + chunk < S:  # async stage-ahead overlaps the chunk dispatch
            nxt = stage(c + chunk, min(chunk, S - c - chunk))
        engine.process_chunk(scans, imus, stamps, dt)
        c += chunk  # padded tail scans are dropped from metrics below
        if progress and (c // chunk) % 20 == 0:
            print(f"  scan {c}/{S}", flush=True)
    engine.finish()
    elapsed = time.perf_counter() - t0

    out = {
        "n_scans": S,
        "scans_per_sec": round(S / elapsed, 2),
        "n_keyframes": engine.kf.n,
        "n_loops": len(engine.loop_pairs),
        "n_solves": engine.solve_count,
    }
    gt = seq_obj.gt_poses()
    if gt is not None:
        from ..eval import align_umeyama

        # the filter runs in its own odometry frame (first body frame);
        # KITTI ground truth is in the sequence frame — rigidly align
        # before ATE, TUM-benchmark style (no scale)
        est = np.stack(engine.realtime_traj)[:S, :3, 3]
        g = gt[:S, :3, 3]
        _, R, t = align_umeyama(est, g)
        est = est @ R.T + t
        out["ate_m"] = round(
            float(np.sqrt(np.mean(np.sum((est - g) ** 2, axis=1)))), 4
        )
        d = max(1, int(round(1.0 / dt)))
        rel = (est[d:] - est[:-d]) - (g[d:] - g[:-d])
        out["rpe_1s_m"] = round(
            float(np.sqrt(np.mean(np.sum(rel ** 2, axis=1)))), 4
        )
    return out
