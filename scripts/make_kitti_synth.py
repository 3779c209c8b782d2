#!/usr/bin/env python
"""Generate a KITTI-odometry-format synthetic sequence from the urban-canyon
simulator (VERDICT r2 #6: a ≥1000-scan multi-loop circuit with a degenerate
canyon segment and corner yaw-rate spikes, written as real .bin files so
`scripts/run_slam.py --dataset kitti` exercises the full reader + native
prefetcher + engine path end-to-end).

Layout written (KITTI odometry contract, `io/kitti.py`):
    <out>/sequences/<seq>/velodyne/%06d.bin   (x, y, z, intensity) f32
    <out>/sequences/<seq>/times.txt
    <out>/sequences/<seq>/calib.txt           (Tr = identity)
    <out>/poses/<seq>.txt                     ground truth 3x4 rows

Usage: python scripts/make_kitti_synth.py --out out/kitti_synth [--n-scans 1160]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def generate(out_root, seq="00", n_scans=1160, n_azimuth=2048, n_elev=16,
             max_range=50.0, seed=0, progress=True, rich=False):
    from fastliosam_tpu.sim import (
        PlaneWorld, SimConfig, Trajectory, simulate_sequence,
    )

    world = PlaneWorld.city(a=60.0, b=60.0, street_w=12.0, wall_h=8.0,
                            n_clutter=96 if rich else 24, seed=seed,
                            rich=rich)
    # start from rest on the textured bottom street (real KITTI drives
    # start from rest; the featureless +x canyon is entered mid-run at
    # speed, once the LiDAR-only filter has locked its velocity)
    r = 10.0
    Ly, Lx, Q = 2 * (60.0 - r), 2 * (60.0 - r), np.pi * r / 2.0
    s_bottom = Ly + Q + Lx + Q + Ly + Q
    traj = Trajectory.circuit(a=60.0, b=60.0, corner_r=10.0, speed=8.0,
                              ramp_t=4.0, s_start=s_bottom)
    cfg = SimConfig(
        scan_rate=10.0, n_azimuth=n_azimuth, n_elev=n_elev,
        max_range=max_range, gyro_noise=0.001, acc_noise=0.01,
        seed=seed, time_groups=32,
    )
    seq_dir = os.path.join(out_root, "sequences", seq)
    velo = os.path.join(seq_dir, "velodyne")
    os.makedirs(velo, exist_ok=True)
    os.makedirs(os.path.join(out_root, "poses"), exist_ok=True)

    times, pose_rows = [], []
    # chunked generation keeps peak memory flat on the 2-core host
    CH = 50
    k0 = 0
    while k0 < n_scans:
        n = min(CH, n_scans - k0)
        data = simulate_sequence(world, traj, cfg, n_scans=n,
                                 t0=k0 / cfg.scan_rate)
        for i in range(n):
            pts, toff, mask = data["scans"][i]
            p = pts[mask]
            rec = np.zeros((len(p), 4), np.float32)
            rec[:, :3] = p
            rec[:, 3] = 0.5  # constant intensity (sim has no reflectivity)
            rec.tofile(os.path.join(velo, f"{k0 + i:06d}.bin"))
            times.append(data["stamps"][i])
            R, t = data["gt"][i]
            T = np.hstack([R, t[:, None]])
            pose_rows.append(" ".join(f"{v:.9e}" for v in T.reshape(-1)))
        k0 += n
        if progress:
            print(f"  {k0}/{n_scans} scans", flush=True)

    np.savetxt(os.path.join(seq_dir, "times.txt"), np.asarray(times),
               fmt="%.6f")
    with open(os.path.join(seq_dir, "calib.txt"), "w") as f:
        eye = "1 0 0 0 0 1 0 0 0 0 1 0"
        for k in ("P0", "P1", "P2", "P3", "Tr"):
            f.write(f"{k}: {eye}\n")
    with open(os.path.join(out_root, "poses", f"{seq}.txt"), "w") as f:
        f.write("\n".join(pose_rows) + "\n")
    return out_root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="out/kitti_synth")
    ap.add_argument("--seq", default="00")
    ap.add_argument("--n-scans", type=int, default=1160)
    ap.add_argument("--n-azimuth", type=int, default=2048)
    ap.add_argument("--max-range", type=float, default=50.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--rich", action="store_true",
                    help="feature-rich world (no featureless canyon)")
    a = ap.parse_args()
    generate(a.out, a.seq, a.n_scans, a.n_azimuth, max_range=a.max_range,
             seed=a.seed, rich=a.rich)
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
