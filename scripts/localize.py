#!/usr/bin/env python
"""Relocalize a sensor stream against a saved keyframe map (the
FAST-LIO-Localization-QN consumer workflow, `config.yaml:21`).

  python scripts/localize.py --map out/run/seq_keyframes.npz \
      --dataset generic --root /data/recording --out out/loc \
      [--init-x 0 --init-y 0 --init-z 0 --init-yaw 0]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--map", required=True, help="keyframe bundle .npz")
    ap.add_argument("--dataset", choices=["generic", "kitti"], default="generic")
    ap.add_argument("--root", required=True)
    ap.add_argument("--seq", default="07")
    ap.add_argument("--out", default="out/localize")
    ap.add_argument("--scan-capacity", type=int, default=131072)
    ap.add_argument("--num-ds-points", type=int, default=8192)
    ap.add_argument("--map-capacity-log2", type=int, default=19)
    ap.add_argument("--init-x", type=float, default=0.0)
    ap.add_argument("--init-y", type=float, default=0.0)
    ap.add_argument("--init-z", type=float, default=0.0)
    ap.add_argument("--init-yaw", type=float, default=0.0)
    args = ap.parse_args()

    import jax.numpy as jnp

    from fastliosam_tpu.io import GenericSequence, KittiSequence
    from fastliosam_tpu.io.poses import write_tum_trajectory
    from fastliosam_tpu.map import VoxelMapConfig
    from fastliosam_tpu.odom import ImuBatch, OdomConfig, Scan
    from fastliosam_tpu.runtime import MapLocalizer

    loc = MapLocalizer(
        args.map,
        map_cfg=VoxelMapConfig(capacity=1 << args.map_capacity_log2),
        odom_cfg=OdomConfig(num_ds_points=args.num_ds_points),
    )
    guess = np.eye(4, dtype=np.float32)
    cy, sy = np.cos(args.init_yaw), np.sin(args.init_yaw)
    guess[:2, :2] = [[cy, -sy], [sy, cy]]
    guess[:3, 3] = (args.init_x, args.init_y, args.init_z)

    if args.dataset == "kitti":
        seq = KittiSequence(args.root, args.seq)
        stamps = seq.times
        def get(i):
            xyz, inten, toff = seq.scan(i)
            return xyz, toff, None
        n_scans = len(seq)
    else:
        seq = GenericSequence(args.root)
        stamps = seq.stamps
        def get(i):
            xyz, inten = seq.scan(i)
            return xyz, np.zeros(len(xyz), np.float32), None
        n_scans = len(seq)

    cap = args.scan_capacity
    imu_cap = 64
    poses, out_stamps = [], []
    t_prev = float(stamps[0]) - 0.1
    for i in range(n_scans):
        xyz, toff, _ = get(i)
        n = min(len(xyz), cap)
        pad = cap - n
        scan = Scan(
            xyz=jnp.asarray(np.pad(xyz[:n], ((0, pad), (0, 0)),
                                   constant_values=1e6)),
            t_offset=jnp.asarray(np.pad(toff[:n], (0, pad))),
            mask=jnp.asarray(np.arange(cap) < n),
        )
        stamp = float(stamps[i])
        if i == 0:
            fit = loc.global_init(scan, jnp.asarray(guess))
            print(f"global init fitness: {fit:.3f}")
        if args.dataset == "generic" and seq.imu is not None:
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
        else:
            imu = ImuBatch(
                stamps=jnp.full((8,), 1e9, jnp.float32),
                gyro=jnp.zeros((8, 3)), acc=jnp.zeros((8, 3)),
                mask=jnp.zeros((8,), bool),
            )
        T, n_matched = loc.process(scan, imu, max(stamp - t_prev, 0.05))
        poses.append(T)
        out_stamps.append(stamp)
        t_prev = stamp
        if i % 50 == 0:
            print(f"  scan {i}/{n_scans} matched={n_matched}")

    os.makedirs(args.out, exist_ok=True)
    out = os.path.join(args.out, "localized_tum.txt")
    write_tum_trajectory(out, out_stamps, np.stack(poses))
    print("saved:", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
