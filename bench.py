#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Primary metric (BASELINE.md): LiDAR scans/sec/chip at reference-grade ATE.
The reference stack's implicit target is real-time at the sensor rate
(10 Hz, `kitti.yaml: scan_rate: 10`); vs_baseline = scans_per_sec / 10.
Secondary: PGO solve latency per keyframe-cadence re-solve.

With no datasets in the environment the feed is the synthetic plane-world
sequence (KITTI-like density: ~32k points/scan after the reference's
point_filter_num=4 preprocessing of HDL-64 scans). ATE is measured against
the simulator's exact ground truth and reported alongside throughput.

Timing methodology: scans are pre-staged on device and the whole sequence
runs inside one `lax.scan` dispatch (`odom_rollout`), so the number is
chip throughput, not host-dispatch overhead.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, "out", "bench_seq_v1.npz")

# persistent XLA compilation cache: first-run compiles of the big programs
# (rollout, dense PGO factorization) take minutes on the remote-compile
# path; later runs hit this cache.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, "out", "jaxcache")
)

N_SCANS = 40
N_WARM = 3
RAW_PTS = 32768  # ~HDL-64 after point_filter_num=4
IMU_CAP = 32


def build_sequence():
    from fastliosam_tpu.sim import PlaneWorld, SimConfig, Trajectory, simulate_sequence

    world = PlaneWorld.room(size=60.0, height=10.0, n_boxes=25, seed=7)
    traj = Trajectory.circle(radius=8.0, period=40.0, z_amp=0.3)
    cfg = SimConfig(
        scan_rate=10.0,
        n_azimuth=2048,
        n_elev=16,
        max_range=120.0,
        gyro_noise=0.001,
        acc_noise=0.01,
        seed=7,
        time_groups=32,
    )
    data = simulate_sequence(world, traj, cfg, n_scans=N_SCANS + N_WARM)
    xyz = np.stack([s[0] for s in data["scans"]])  # (S, N, 3)
    toff = np.stack([s[1] for s in data["scans"]])
    mask = np.stack([s[2] for s in data["scans"]])
    imu_t = np.stack([np.pad(b[0], (0, IMU_CAP - len(b[0])), constant_values=1e9)
                      for b in data["imu"]])
    imu_g = np.stack([np.pad(b[1], ((0, IMU_CAP - len(b[1])), (0, 0)))
                      for b in data["imu"]])
    imu_a = np.stack([np.pad(b[2], ((0, IMU_CAP - len(b[2])), (0, 0)))
                      for b in data["imu"]])
    imu_m = np.stack([np.arange(IMU_CAP) < len(b[0]) for b in data["imu"]])
    gt_p = np.stack([g[1] for g in data["gt"]])
    R0, p0 = traj.pose(0.0)
    v0 = traj.velocity(0.0)
    return {
        "R0": R0.astype(np.float32),
        "p0": p0.astype(np.float32),
        "v0": v0.astype(np.float32),
        "xyz": xyz.astype(np.float32),
        "toff": toff.astype(np.float32),
        "mask": mask,
        "imu_t": imu_t.astype(np.float32),
        "imu_g": imu_g.astype(np.float32),
        "imu_a": imu_a.astype(np.float32),
        "imu_m": imu_m,
        "gt_p": gt_p.astype(np.float32),
        "scan_dt": np.float32(data["scan_dt"]),
    }


def get_sequence():
    if os.path.exists(CACHE):
        return dict(np.load(CACHE))
    data = build_sequence()
    os.makedirs(os.path.dirname(CACHE), exist_ok=True)
    np.savez_compressed(CACHE, **data)
    return data


def pad_scans(data):
    """Pad the ray count to the RAW_PTS static budget."""
    s, n, _ = data["xyz"].shape
    if n >= RAW_PTS:
        sl = slice(0, RAW_PTS)
        return (
            data["xyz"][:, sl],
            data["toff"][:, sl],
            data["mask"][:, sl],
        )
    pad = RAW_PTS - n
    xyz = np.pad(data["xyz"], ((0, 0), (0, pad), (0, 0)), constant_values=1e6)
    toff = np.pad(data["toff"], ((0, 0), (0, pad)))
    mask = np.pad(data["mask"], ((0, 0), (0, pad)))
    return xyz, toff, mask


def bench_odometry(data):
    import jax
    import jax.numpy as jnp

    from fastliosam_tpu.map import VoxelMapConfig
    from fastliosam_tpu.odom import ImuBatch, OdomConfig, Scan, init_odom
    from fastliosam_tpu.odom.pipeline import odom_rollout

    map_cfg = VoxelMapConfig(capacity=1 << 19, voxel_size=0.5, min_points=5)
    odom_cfg = OdomConfig(
        point_filter_num=1,  # feed is already filtered
        blind=1.0,
        filter_size_surf=0.5,
        num_ds_points=8192,
        det_range=150.0,
        evict_every=10_000,
        # dense HDL-64-like feed: the adaptive 3-voxel pool is faster AND
        # more accurate than the 7-stencil here (measured: 95 vs 81 scans/s,
        # ATE 0.19 vs 0.22); sparse feeds should keep the "merged" default
        query_mode="merged3",
    )
    xyz, toff, mask = pad_scans(data)
    S = xyz.shape[0]

    scans = Scan(
        xyz=jnp.asarray(xyz), t_offset=jnp.asarray(toff), mask=jnp.asarray(mask)
    )
    imus = ImuBatch(
        stamps=jnp.asarray(data["imu_t"]),
        gyro=jnp.asarray(data["imu_g"]),
        acc=jnp.asarray(data["imu_a"]),
        mask=jnp.asarray(data["imu_m"]),
    )
    dt = jnp.float32(data["scan_dt"])

    roll = jax.jit(
        lambda st, scans, imus: odom_rollout(st, scans, imus, dt, odom_cfg, map_cfg)
    )

    def fresh_state():
        st = init_odom(map_cfg)
        # start at the true initial pose/velocity (bench measures tracking
        # throughput, not global initialization)
        nav = st.nav._replace(
            R=jnp.asarray(data["R0"], jnp.float32),
            p=jnp.asarray(data["p0"], jnp.float32),
            v=jnp.asarray(data["v0"], jnp.float32),
        )
        return st._replace(nav=nav)

    # warmup/compile
    st, aux = roll(fresh_state(), scans, imus)
    aux["p"].block_until_ready()

    t0 = time.perf_counter()
    st, aux = roll(fresh_state(), scans, imus)
    aux["p"].block_until_ready()
    elapsed = time.perf_counter() - t0
    scans_per_sec = S / elapsed

    ps = np.asarray(aux["p"])
    ate = float(np.sqrt(np.mean(np.sum((ps - data["gt_p"][:S]) ** 2, axis=1))))
    matched = np.asarray(aux["n_matched"])
    return scans_per_sec, ate, int(matched[-1])


def bench_pgo():
    import jax

    from fastliosam_tpu.pgo import PoseGraphConfig, from_arrays, solve

    cfg = PoseGraphConfig(
        max_keyframes=512, max_between=1024, max_gps=128, lm_iters=6, pcg_iters=128
    )
    rng = np.random.default_rng(0)
    # noisy circle chain + one loop factor, built host-side (numpy)
    K = 512
    a = 2 * np.pi / K
    ca, sa = np.cos(a), np.sin(a)
    step_T = np.eye(4, dtype=np.float32)
    step_T[:2, :2] = [[ca, -sa], [sa, ca]]
    step_T[0, 3] = 0.5
    poses = [np.eye(4, dtype=np.float32)]
    rels = []
    for k in range(1, K):
        noise = np.eye(4, dtype=np.float32)
        noise[:3, 3] = rng.normal(size=3) * 0.02
        rel = step_T @ noise
        poses.append(poses[-1] @ rel)
        rels.append(rel)
    bt_i = np.arange(K - 1)
    bt_j = np.arange(1, K)
    si = np.tile(np.asarray([10.0] * 3 + [100.0] * 3, np.float32), (K - 1, 1))
    # loop factor: last -> first
    bt_i = np.append(bt_i, K - 1)
    bt_j = np.append(bt_j, 0)
    rels.append(np.linalg.inv(poses[-1]).astype(np.float32))
    si = np.vstack([si, np.asarray([[100.0] * 3 + [1000.0] * 3], np.float32)])
    g = from_arrays(
        cfg, np.stack(poses), bt_i=bt_i, bt_j=bt_j, bt_rel=np.stack(rels),
        bt_sqrt_info=si,
    )

    solver = jax.jit(lambda g: solve(g, cfg))
    g2, cost = solver(g)
    cost.block_until_ready()
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        g2, cost = solver(g)
        cost.block_until_ready()
    ms = (time.perf_counter() - t0) / reps * 1000.0
    return ms, float(cost)


def bench_loop_icp():
    """Loop verification latency: trimmed ICP (50 iters) between two 16k
    submaps — Pallas fused-NN path on TPU."""
    import jax
    import jax.numpy as jnp

    from fastliosam_tpu.loop.icp import icp_align

    rng = np.random.default_rng(1)
    base = rng.uniform(-40, 40, size=(16384, 3)).astype(np.float32)
    base[:, 2] = np.sin(base[:, 0] * 0.3) + 0.1 * base[:, 1]
    shift = np.array([1.5, -1.0, 0.3], np.float32)
    src = jnp.asarray(base + shift)
    dst = jnp.asarray(base)
    mask = jnp.ones((16384,), bool)
    f = jax.jit(
        lambda s, d: icp_align(s, mask, d, mask, max_iterations=50,
                               max_corr_dist=52.5, trim_fraction=0.8)
    )
    T, fit, nc = f(src, dst)
    fit.block_until_ready()
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        T, fit, nc = f(src, dst)
        fit.block_until_ready()
    ms = (time.perf_counter() - t0) / reps * 1000
    return ms, float(fit)


def main():
    import jax

    backend = jax.default_backend()
    t_start = time.perf_counter()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    data = get_sequence()
    scans_per_sec, ate, matched = bench_odometry(data)

    # secondary metrics are best-effort inside the time budget — the
    # primary JSON line must always be printed (first compiles on the
    # remote-compile TPU path can take minutes each)
    pgo_ms = icp_ms = -1.0
    try:
        if time.perf_counter() - t_start < budget_s:
            pgo_ms, pgo_cost = bench_pgo()
    except Exception as e:  # pragma: no cover
        print(f"# bench_pgo failed: {e}", file=sys.stderr)
    try:
        if time.perf_counter() - t_start < budget_s:
            icp_ms, icp_fit = bench_loop_icp()
    except Exception as e:  # pragma: no cover
        print(f"# bench_loop_icp failed: {e}", file=sys.stderr)
    result = {
        "metric": "odom_scans_per_sec_per_chip",
        "value": round(scans_per_sec, 2),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_sec / 10.0, 2),
        "ate_m": round(ate, 4),
        "pgo_solve_ms_512kf": round(pgo_ms, 2),
        "loop_icp_ms_50it_16k": round(icp_ms, 2),
        "backend": backend,
        "n_scans": N_SCANS + N_WARM,
        "raw_pts_per_scan": RAW_PTS,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
