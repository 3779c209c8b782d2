#!/usr/bin/env python
"""Run the full SLAM pipeline over a dataset directory (the `run.launch`
analog — dataset selection, engine configuration, result export).

Examples:
  python scripts/run_slam.py --dataset kitti --root /data/kitti --seq 07 \
      --out out/kitti07
  python scripts/run_slam.py --dataset sim --out out/sim --n-scans 200
  python scripts/run_slam.py --dataset generic --root /data/recording \
      --use-gps --out out/rec
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_engine(args):
    import jax.numpy as jnp  # noqa: F401

    from fastliosam_tpu.loop import LoopConfig
    from fastliosam_tpu.map import VoxelMapConfig
    from fastliosam_tpu.odom import OdomConfig
    from fastliosam_tpu.pgo import PoseGraphConfig
    from fastliosam_tpu.runtime import EngineConfig, SlamEngine

    if args.dataset == "bag":
        # preset carries the full FAST-LIO parameter surface for the sensor
        from fastliosam_tpu.io.presets import PRESETS, odom_config_kwargs

        pre = PRESETS[args.preset]
        odom_cfg = OdomConfig(
            num_ds_points=args.num_ds_points, **odom_config_kwargs(pre)
        )
        filter_size_map = pre.filter_size_map
    else:
        odom_cfg = OdomConfig(
            point_filter_num=args.point_filter_num,
            blind=args.blind,
            filter_size_surf=args.filter_size_surf,
            num_ds_points=args.num_ds_points,
            det_range=args.det_range,
            max_iteration=args.max_iteration,
            query_mode=args.query_mode,
        )
        filter_size_map = args.filter_size_map

    return SlamEngine(
        odom_cfg=odom_cfg,
        map_cfg=VoxelMapConfig(
            capacity=1 << args.map_capacity_log2,
            voxel_size=filter_size_map,
        ),
        loop_cfg=LoopConfig(
            radius=args.loop_radius,
            time_gap=args.loop_time_gap,
            icp_score_threshold=args.icp_score_threshold,
        ),
        pgo_cfg=PoseGraphConfig(
            max_keyframes=args.max_keyframes,
            max_between=args.max_keyframes * 2,
        ),
        cfg=EngineConfig(
            keyframe_threshold=args.keyframe_threshold,
            use_gps=args.use_gps,
        ),
    )


def run_sim(args, engine):
    import jax.numpy as jnp

    from fastliosam_tpu.odom import ImuBatch, Scan
    from fastliosam_tpu.sim import PlaneWorld, SimConfig, Trajectory, simulate_sequence

    args.n_scans = args.n_scans or 200  # 0 sentinel = sim default
    world = PlaneWorld.room(size=50.0, height=8.0, n_boxes=20, seed=1)
    traj = Trajectory.circle(radius=8.0, period=40.0)
    sim_cfg = SimConfig(n_azimuth=1024, n_elev=16, time_groups=32, seed=1)
    data = simulate_sequence(world, traj, sim_cfg, n_scans=args.n_scans)
    cap = 64

    def pad_imu(k):
        ts, gy, ac = data["imu"][k]
        n = len(ts)
        return (
            np.pad(ts, (0, cap - n), constant_values=1e9),
            np.pad(gy, ((0, cap - n), (0, 0))),
            np.pad(ac, ((0, cap - n), (0, 0))),
            np.arange(cap) < n,
        )

    t0 = time.perf_counter()
    chunk = max(1, args.chunk)
    if chunk > 1:
        # chunked path: S scans per device dispatch, keyframe decisions on
        # device (one host sync per chunk)
        for c in range(0, args.n_scans, chunk):
            ks = range(c, min(c + chunk, args.n_scans))
            scans = Scan(
                xyz=jnp.asarray(np.stack([data["scans"][k][0] for k in ks])),
                t_offset=jnp.asarray(np.stack([data["scans"][k][1] for k in ks])),
                mask=jnp.asarray(np.stack([data["scans"][k][2] for k in ks])),
            )
            imu_np = [pad_imu(k) for k in ks]
            imus = ImuBatch(
                stamps=jnp.asarray(np.stack([i[0] for i in imu_np])),
                gyro=jnp.asarray(np.stack([i[1] for i in imu_np])),
                acc=jnp.asarray(np.stack([i[2] for i in imu_np])),
                mask=jnp.asarray(np.stack([i[3] for i in imu_np])),
            )
            stamps = [data["stamps"][k] for k in ks]
            engine.process_chunk(scans, imus, stamps, data["scan_dt"])
    else:
        for k in range(args.n_scans):
            ts_p, gy_p, ac_p, m_p = pad_imu(k)
            imu = ImuBatch(
                stamps=jnp.asarray(ts_p), gyro=jnp.asarray(gy_p),
                acc=jnp.asarray(ac_p), mask=jnp.asarray(m_p),
            )
            pts, toff, mask = data["scans"][k]
            scan = Scan(jnp.asarray(pts), jnp.asarray(toff), jnp.asarray(mask))
            engine.process(scan, imu, data["stamps"][k], data["scan_dt"])
    dt = time.perf_counter() - t0
    gt = np.stack([g[1] for g in data["gt"]])
    est = np.stack(engine.realtime_traj)[:, :3, 3]
    from fastliosam_tpu.eval import ate_rmse

    print(f"{args.n_scans} scans in {dt:.1f}s ({args.n_scans/dt:.1f} scans/s)")
    print(f"ATE (aligned): {ate_rmse(est, gt, align=True):.4f} m")


def run_kitti(args, engine):
    from fastliosam_tpu.runtime.drivers import drive_kitti

    out = drive_kitti(
        engine, args.root, args.seq, scan_capacity=args.scan_capacity,
        n_scans=args.n_scans if args.n_scans > 0 else None,
    )
    print(f"KITTI {args.seq}: {out['n_scans']} scans at "
          f"{out['scans_per_sec']} scans/s, {out['n_keyframes']} keyframes, "
          f"{out['n_loops']} loops")
    if "ate_m" in out:
        print(f"ATE: {out['ate_m']} m  RPE(1s): {out['rpe_1s_m']} m")


def run_generic(args, engine):
    import jax.numpy as jnp

    from fastliosam_tpu.io import GenericSequence
    from fastliosam_tpu.odom import ImuBatch, Scan
    from fastliosam_tpu.runtime import GpsFix

    seq = GenericSequence(args.root)
    cap = args.scan_capacity
    imu_cap = 64
    t_prev = float(seq.stamps[0]) - 0.1
    for i in range(len(seq)):
        xyz, inten = seq.scan(i)
        n = min(len(xyz), cap)
        pad = cap - n
        stamp = float(seq.stamps[i])
        ts, gy, ac = seq.imu_between(t_prev, stamp)
        m = min(len(ts), imu_cap)
        imu = ImuBatch(
            stamps=jnp.asarray(
                np.pad((ts[:m] - t_prev).astype(np.float32), (0, imu_cap - m),
                       constant_values=1e9)),
            gyro=jnp.asarray(np.pad(gy[:m].astype(np.float32),
                                    ((0, imu_cap - m), (0, 0)))),
            acc=jnp.asarray(np.pad(ac[:m].astype(np.float32),
                                   ((0, imu_cap - m), (0, 0)))),
            mask=jnp.asarray(np.arange(imu_cap) < m),
        )
        scan = Scan(
            xyz=jnp.asarray(np.pad(xyz[:n], ((0, pad), (0, 0)), constant_values=1e6)),
            t_offset=jnp.asarray(np.zeros(cap, np.float32)),
            mask=jnp.asarray(np.arange(cap) < n),
        )
        fixes = [
            GpsFix(stamp=r[0], lat=r[1], lon=r[2], alt=r[3],
                   cov_xyz=tuple(r[4:7]) if len(r) >= 7 else (1.0, 1.0, 4.0))
            for r in seq.gnss_between(t_prev, stamp)
        ]
        engine.process(scan, imu, stamp, stamp - t_prev, gps=fixes)
        t_prev = stamp


def run_mulran(args, engine):
    import jax.numpy as jnp

    from fastliosam_tpu.io.mulran import MulranSequence
    from fastliosam_tpu.odom import ImuBatch, Scan
    from fastliosam_tpu.runtime import GpsFix

    seq = MulranSequence(args.root)
    cap = args.scan_capacity
    imu_cap = 64
    print(f"MulRan: {len(seq)} scans")
    t_prev = float(seq.stamps[0]) - 0.1
    for i in range(len(seq)):
        xyz, inten, toff = seq.scan(i)
        n = min(len(xyz), cap)
        pad = cap - n
        stamp = float(seq.stamps[i])
        ts, gy, ac = seq.imu_between(t_prev, stamp)
        m = min(len(ts), imu_cap)
        imu = ImuBatch(
            stamps=jnp.asarray(np.pad((ts[:m] - t_prev).astype(np.float32),
                                      (0, imu_cap - m), constant_values=1e9)),
            gyro=jnp.asarray(np.pad(gy[:m].astype(np.float32),
                                    ((0, imu_cap - m), (0, 0)))),
            acc=jnp.asarray(np.pad(ac[:m].astype(np.float32),
                                   ((0, imu_cap - m), (0, 0)))),
            mask=jnp.asarray(np.arange(imu_cap) < m),
        )
        scan = Scan(
            xyz=jnp.asarray(np.pad(xyz[:n], ((0, pad), (0, 0)),
                                   constant_values=1e6)),
            t_offset=jnp.asarray(np.pad(toff[:n], (0, pad))),
            mask=jnp.asarray(np.arange(cap) < n),
        )
        fixes = [
            GpsFix(stamp=s, lat=la, lon=lo, alt=al, cov_xyz=tuple(cov))
            for (s, la, lo, al, cov) in seq.gps_between(t_prev, stamp)
        ]
        engine.process(scan, imu, stamp, stamp - t_prev, gps=fixes)
        t_prev = stamp
        if i % 100 == 0:
            print(f"  scan {i}/{len(seq)}")


def run_newer_college(args, engine):
    import jax.numpy as jnp

    from fastliosam_tpu.io.newer_college import NewerCollegeSequence
    from fastliosam_tpu.odom import ImuBatch, Scan

    seq = NewerCollegeSequence(bags=args.root, gt_csv=args.gt_csv)
    cap = args.scan_capacity
    imu_cap = 64
    imu_buf = []
    t_prev = None
    for kind, stamp, payload in seq.stream():
        if kind == "imu":
            imu_buf.append((stamp, *payload))
            continue
        xyz, inten, toff = payload
        if t_prev is None:
            t_prev = stamp - 0.1
        rel = [
            (s - t_prev, g, a) for (s, g, a) in imu_buf if t_prev < s <= stamp
        ]
        imu_buf = [e for e in imu_buf if e[0] > stamp]
        m = min(len(rel), imu_cap)
        ts = np.asarray([r[0] for r in rel[:m]], np.float32)
        gy = np.asarray([r[1] for r in rel[:m]], np.float32).reshape(m, 3)
        ac = np.asarray([r[2] for r in rel[:m]], np.float32).reshape(m, 3)
        imu = ImuBatch(
            stamps=jnp.asarray(np.pad(ts, (0, imu_cap - m), constant_values=1e9)),
            gyro=jnp.asarray(np.pad(gy, ((0, imu_cap - m), (0, 0)))),
            acc=jnp.asarray(np.pad(ac, ((0, imu_cap - m), (0, 0)))),
            mask=jnp.asarray(np.arange(imu_cap) < m),
        )
        n = min(len(xyz), cap)
        pad = cap - n
        scan = Scan(
            xyz=jnp.asarray(np.pad(xyz[:n], ((0, pad), (0, 0)),
                                   constant_values=1e6)),
            t_offset=jnp.asarray(np.pad(toff[:n], (0, pad))),
            mask=jnp.asarray(np.arange(cap) < n),
        )
        engine.process(scan, imu, stamp, stamp - t_prev)
        t_prev = stamp


def run_bag(args, engine):
    """Stream a ROS1 bag through a sensor preset — the `run.launch`
    `lidar:=<preset>` selection surface (run.launch:20-46)."""
    import jax.numpy as jnp

    from fastliosam_tpu.io.presets import PRESETS, BagSequence
    from fastliosam_tpu.odom import ImuBatch, Scan
    from fastliosam_tpu.runtime import GpsFix

    pre = PRESETS[args.preset]
    seq = BagSequence(args.root, pre)
    cap = args.scan_capacity
    imu_cap = 64
    imu_buf: list[tuple] = []
    gps_buf: list[GpsFix] = []
    t_prev = None
    n_scans = 0
    for kind, stamp, payload in seq.stream():
        if kind == "imu":
            imu_buf.append((stamp, *payload))
            continue
        if kind == "gps":
            lat, lon, alt, cov, status = payload
            gps_buf.append(GpsFix(stamp=stamp, lat=lat, lon=lon, alt=alt,
                                  cov_xyz=cov, status=status))
            continue
        xyz, inten, toff = payload
        if t_prev is None:
            t_prev = stamp - 0.1
        rel = [(s - t_prev, g, a) for (s, g, a) in imu_buf if t_prev < s <= stamp]
        imu_buf = [e for e in imu_buf if e[0] > stamp]
        m = min(len(rel), imu_cap)
        ts = np.asarray([r[0] for r in rel[:m]], np.float32)
        gy = np.asarray([r[1] for r in rel[:m]], np.float32).reshape(m, 3)
        ac = np.asarray([r[2] for r in rel[:m]], np.float32).reshape(m, 3)
        imu = ImuBatch(
            stamps=jnp.asarray(np.pad(ts, (0, imu_cap - m), constant_values=1e9)),
            gyro=jnp.asarray(np.pad(gy, ((0, imu_cap - m), (0, 0)))),
            acc=jnp.asarray(np.pad(ac, ((0, imu_cap - m), (0, 0)))),
            mask=jnp.asarray(np.arange(imu_cap) < m),
        )
        n = min(len(xyz), cap)
        pad = cap - n
        scan = Scan(
            xyz=jnp.asarray(np.pad(xyz[:n], ((0, pad), (0, 0)),
                                   constant_values=1e6)),
            t_offset=jnp.asarray(np.pad(toff[:n], (0, pad))),
            mask=jnp.asarray(np.arange(cap) < n),
        )
        fixes, gps_buf = gps_buf, []
        engine.process(scan, imu, stamp, stamp - t_prev, gps=fixes)
        t_prev = stamp
        n_scans += 1
        if n_scans % 100 == 0:
            print(f"  scan {n_scans}")
    print(f"bag [{args.preset}]: {n_scans} scans")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--dataset",
        choices=["kitti", "generic", "sim", "mulran", "newer-college", "bag"],
        default="sim",
    )
    from fastliosam_tpu.io.presets import PRESETS

    ap.add_argument(
        "--preset",
        default="ouster",
        choices=sorted(PRESETS),
        help="sensor preset for --dataset bag (run.launch lidar:= values)",
    )
    ap.add_argument("--gt-csv", default=None)
    ap.add_argument("--root", default=None)
    ap.add_argument("--seq", default="07")
    ap.add_argument("--out", default="out/run")
    ap.add_argument("--n-scans", type=int, default=0,
                help="0 = dataset default (sim: 200, file datasets: all)")
    ap.add_argument(
        "--chunk", type=int, default=1,
        help="scans per device dispatch (sim dataset): >1 uses the chunked "
        "engine path with on-device keyframe decisions",
    )
    ap.add_argument("--scan-capacity", type=int, default=131072)
    ap.add_argument("--use-gps", action="store_true")
    # FAST-LIO parameter surface (kitti.launch / config.yaml names)
    ap.add_argument("--point-filter-num", type=int, default=4)
    ap.add_argument("--blind", type=float, default=1.0)
    ap.add_argument("--filter-size-surf", type=float, default=0.5)
    ap.add_argument("--filter-size-map", type=float, default=0.5)
    ap.add_argument("--max-iteration", type=int, default=3)
    ap.add_argument(
        "--query-mode",
        choices=["merged", "merged2", "merged3", "cached"],
        default="merged",
        help="plane association: merged=7-voxel stencil (robust), "
        "merged3=adaptive 3-voxel (faster on dense scans)",
    )
    ap.add_argument("--det-range", type=float, default=300.0)
    ap.add_argument("--num-ds-points", type=int, default=8192)
    ap.add_argument("--map-capacity-log2", type=int, default=19)
    ap.add_argument("--keyframe-threshold", type=float, default=1.0)
    ap.add_argument("--loop-radius", type=float, default=35.0)
    ap.add_argument("--loop-time-gap", type=float, default=30.0)
    ap.add_argument("--icp-score-threshold", type=float, default=1.5)
    ap.add_argument("--max-keyframes", type=int, default=1024)
    args = ap.parse_args()

    engine = build_engine(args)
    if args.dataset == "sim":
        run_sim(args, engine)
    elif args.dataset == "kitti":
        run_kitti(args, engine)
    elif args.dataset == "mulran":
        run_mulran(args, engine)
    elif args.dataset == "newer-college":
        run_newer_college(args, engine)
    elif args.dataset == "bag":
        run_bag(args, engine)
    else:
        run_generic(args, engine)

    from fastliosam_tpu.runtime import save_results

    paths = save_results(engine, args.out, args.seq if args.dataset == "kitti" else args.dataset)
    print("saved:", paths)


if __name__ == "__main__":
    main()
