#!/usr/bin/env python
"""Scaling-efficiency harness: distributed PGO solve + sharded scan-match
Gram over 1..N devices (the trajectory-length "sequence axis" scaling of
SURVEY.md §2.3 / BASELINE.md's ≥0.7-efficiency-at-2-hosts target).

On real TPU slices this measures honest ICI/DCN scaling; in this
environment (one chip) it runs on N virtual CPU devices
(``XLA_FLAGS=--xla_force_host_platform_device_count=8``), which validates
the sharded programs end-to-end and reports the same metric — noting that
virtual devices share host cores, so the printed efficiency is a lower
bound on real-hardware efficiency for compute-bound stages.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/bench_scaling.py --keyframes 2048
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_graph(cfg, K, seed=0):
    from fastliosam_tpu.pgo import from_arrays

    rng = np.random.default_rng(seed)
    a = 2 * np.pi / K
    ca, sa = np.cos(a), np.sin(a)
    step_T = np.eye(4, dtype=np.float32)
    step_T[:2, :2] = [[ca, -sa], [sa, ca]]
    step_T[0, 3] = 0.5
    poses = [np.eye(4, dtype=np.float32)]
    rels = []
    for _ in range(1, K):
        noise = np.eye(4, dtype=np.float32)
        noise[:3, 3] = rng.normal(size=3) * 0.02
        rel = step_T @ noise
        poses.append(poses[-1] @ rel)
        rels.append(rel)
    bt_i = np.arange(K - 1)
    bt_j = np.arange(1, K)
    si = np.tile(np.asarray([10.0] * 3 + [100.0] * 3, np.float32), (K - 1, 1))
    bt_i = np.append(bt_i, K - 1)
    bt_j = np.append(bt_j, 0)
    rels.append(np.linalg.inv(poses[-1]).astype(np.float32))
    si = np.vstack([si, np.asarray([[100.0] * 3 + [1000.0] * 3], np.float32)])
    return from_arrays(
        cfg, np.stack(poses), bt_i=bt_i, bt_j=bt_j, bt_rel=np.stack(rels),
        bt_sqrt_info=si,
    )


def time_solve(g, cfg, mesh):
    import jax

    from fastliosam_tpu.parallel.sharded_pgo import solve_sharded

    f = jax.jit(lambda g: solve_sharded(g, cfg, mesh))
    g2, cost = f(g)
    cost.block_until_ready()
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        g2, cost = f(g)
        cost.block_until_ready()
    return (time.perf_counter() - t0) / reps, float(cost)


def time_loop_icp(n_pts, mesh):
    """Point-axis-sharded loop-verification ICP (16k submaps, 50 iters)."""
    import jax
    import jax.numpy as jnp

    from fastliosam_tpu.parallel import icp_align_sharded

    rng = np.random.default_rng(1)
    base = rng.uniform(-40, 40, size=(n_pts, 3)).astype(np.float32)
    base[:, 2] = np.sin(base[:, 0] * 0.3) + 0.1 * base[:, 1]
    src = jnp.asarray(base + np.array([1.5, -1.0, 0.3], np.float32))
    dst = jnp.asarray(base)
    mask = jnp.ones((n_pts,), bool)
    f = jax.jit(
        lambda s, d: icp_align_sharded(
            s, mask, d, mask, mesh, max_iterations=50, max_corr_dist=52.5
        )
    )
    T, fit, nc = f(src, dst)
    fit.block_until_ready()
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        T, fit, nc = f(src, dst)
        fit.block_until_ready()
    return (time.perf_counter() - t0) / reps, float(fit)


def time_detect(K, mesh):
    """Keyframe-axis-sharded loop-candidate search over K keyframes."""
    import jax
    import jax.numpy as jnp

    from fastliosam_tpu.parallel import detect_sharded

    rng = np.random.default_rng(2)
    pos = jnp.asarray(rng.uniform(-500, 500, size=(K, 3)), jnp.float32)
    stamps = jnp.asarray(np.arange(K) * 0.5, jnp.float32)
    valid = jnp.ones((K,), bool)
    f = jax.jit(
        lambda p, q: detect_sharded(
            p, stamps, valid, q, radius=35.0, time_gap=30.0, mesh=mesh
        )
    )
    i, fo = f(pos, jnp.int32(K - 1))
    fo.block_until_ready()
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        i, fo = f(pos, jnp.int32(K - 1))
        fo.block_until_ready()
    return (time.perf_counter() - t0) / reps, int(i)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--keyframes", type=int, default=2048)
    ap.add_argument("--what", choices=("pgo", "loop", "all"), default="all")
    ap.add_argument("--icp-points", type=int, default=16384)
    ap.add_argument("--devices", type=int, nargs="*", default=None,
                    help="device counts to sweep (default: 1,2,...,all)")
    ap.add_argument("--cpu", type=int, default=0, metavar="N",
                    help="force the CPU backend with N virtual devices "
                    "(the container's sitecustomize overrides JAX_PLATFORMS, "
                    "so a plain env var is not enough)")
    args = ap.parse_args()

    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.cpu}"
            ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    from jax.sharding import Mesh

    from fastliosam_tpu.pgo import PoseGraphConfig

    devs = jax.devices()
    n_all = len(devs)
    if args.devices:
        bad = [d for d in args.devices if d > n_all]
        if bad:
            ap.error(f"requested {max(bad)} devices but only {n_all} exist")
        sweep = args.devices
    else:
        sweep = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_all]
    K = args.keyframes
    cfg = PoseGraphConfig(
        max_keyframes=K, max_between=2 * K, max_gps=8, lm_iters=4,
        pcg_iters=64,
    )
    g = build_graph(cfg, K)

    out = {
        "keyframes": K,
        "icp_points": args.icp_points,
        "backend": jax.default_backend(),
        "virtual_devices": jax.default_backend() == "cpu",
        # virtual CPU devices time-share the host cores: with host_cores <
        # devices the sweep validates the sharded programs end-to-end but
        # CANNOT show real speedup (all devices contend for the same
        # cores); treat efficiencies as a correctness artifact there
        "host_cores": os.cpu_count(),
    }

    def run_sweep(label, timer):
        rows = []
        t1 = None
        for n in sweep:
            mesh = Mesh(np.asarray(devs[:n]), ("kf",))
            dt, aux = timer(mesh)
            if t1 is None:
                t1 = dt
            eff = t1 / (dt * n)
            rows.append({"devices": n, "ms": round(dt * 1e3, 2),
                         "speedup": round(t1 / dt, 3),
                         "efficiency": round(eff, 3)})
            print(f"  [{label}] {n} dev: {dt*1e3:8.2f} ms  "
                  f"speedup {t1/dt:5.2f}x  efficiency {eff:.2f}",
                  file=sys.stderr)
        return rows

    if args.what in ("pgo", "all"):
        out["pgo_solve"] = run_sweep(
            "pgo", lambda mesh: time_solve(g, cfg, mesh)
        )
    if args.what in ("loop", "all"):
        out["loop_icp"] = run_sweep(
            "loop-icp", lambda mesh: time_loop_icp(args.icp_points, mesh)
        )
        out["loop_detect"] = run_sweep(
            "detect", lambda mesh: time_detect(max(K, 4096), mesh)
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
