#!/usr/bin/env python
"""Per-stage sharded-vs-single crossover table (VERDICT r2 #4).

For each sharded stage (loop detect, submap gather, point-sharded ICP,
PGO PCG solve, slot-sharded voxel-map query) sweep problem size K and
device count, and record where the sharded program crosses its replicated
twin. On this host the mesh is N virtual CPU devices over 2 physical
cores, so measured "efficiency" is bounded near 1/N for compute-bound
stages regardless of program quality — the honest quantity reported per
stage is therefore (a) the sharded-to-replicated ratio at each size (the
overhead the sharding machinery adds) and (b) the analytic collective
payload per invocation, which is what actually crosses ICI/DCN on real
multi-chip hardware.

Usage:
  python scripts/bench_crossover.py --cpu 8 --out SCALING_r03.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, *args, reps=10):
    out = f(*args)
    import jax

    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=8)
    ap.add_argument("--sizes", type=int, nargs="*",
                    default=[1024, 4096, 16384])
    ap.add_argument("--devices", type=int, nargs="*", default=[1, 2, 8])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.cpu}"
            ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "out", "jaxcache-cpu"))

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from fastliosam_tpu.loop.detect import fetch_closest_keyframe_idx
    from fastliosam_tpu.loop.closure import LoopConfig, build_submap
    from fastliosam_tpu.loop.icp import icp_align
    from fastliosam_tpu.map import VoxelMapConfig, insert, make_map
    from fastliosam_tpu.map.voxel_hash import query_planes_merged3
    from fastliosam_tpu.parallel import (
        detect_sharded, gather_submap_sharded, icp_align_sharded,
        insert_sharded, make_map_sharded, query_planes_merged3_sharded,
        solve_sharded,
    )
    from fastliosam_tpu.pgo import PoseGraphConfig, solve

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_scaling import build_graph

    devs = jax.devices()
    rng = np.random.default_rng(0)
    results = {"host_cores": os.cpu_count(), "backend": jax.default_backend(),
               "stages": {}}

    def sweep(stage, sizes, single_fn, sharded_fn, payload_fn):
        rows = []
        for K in sizes:
            t1 = single_fn(K)
            row = {"K": K, "single_ms": round(t1, 3), "sharded_ms": {}}
            for n in args.devices:
                if n > len(devs):
                    continue
                mesh = Mesh(np.asarray(devs[:n]), ("kf",))
                ts = sharded_fn(K, mesh)
                row["sharded_ms"][str(n)] = round(ts, 3)
            row["collective_bytes"] = payload_fn(K)
            rows.append(row)
            print(f"[{stage}] K={K}: single {t1:.3f} ms, sharded "
                  f"{row['sharded_ms']} (collective {row['collective_bytes']}"
                  f" B)", file=sys.stderr, flush=True)
        results["stages"][stage] = rows

    # ---- loop detect -------------------------------------------------
    def det_single(K):
        pos = jnp.asarray(rng.uniform(-500, 500, (K, 3)).astype(np.float32))
        st = jnp.asarray(np.arange(K) * 0.5, jnp.float32)
        va = jnp.ones((K,), bool)
        f = jax.jit(lambda p, q: fetch_closest_keyframe_idx(
            p, st, va, q, 35.0, 30.0))
        return timeit(f, pos, jnp.int32(K - 1))

    def det_sharded(K, mesh):
        pos = jnp.asarray(rng.uniform(-500, 500, (K, 3)).astype(np.float32))
        st = jnp.asarray(np.arange(K) * 0.5, jnp.float32)
        va = jnp.ones((K,), bool)
        # engine fast path: query row passed replicated (no broadcast psum)
        qrow = jnp.concatenate([pos[K - 1], st[K - 1:K]])
        f = jax.jit(lambda p, q, qr: detect_sharded(
            p, st, va, q, 35.0, 30.0, mesh, query_row=qr))
        return timeit(f, pos, jnp.int32(K - 1), qrow)

    sweep("loop_detect", args.sizes, det_single, det_sharded,
          lambda K: 4 * 4 + 2 * 4 * max(args.devices))  # qrow psum + packed gather

    # ---- submap gather ----------------------------------------------
    P = 1024
    n_sub = 5

    def sub_single(K):
        clouds = jnp.asarray(rng.normal(size=(K, P, 3)).astype(np.float32))
        masks = jnp.ones((K, P), bool)
        poses = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (K, 4, 4))
        valid = jnp.ones((K,), bool)
        cfg = LoopConfig(num_submap_keyframes=n_sub, submap_points=4096)
        f = jax.jit(lambda c: build_submap(clouds, masks, poses, valid, c, cfg))
        return timeit(f, jnp.int32(K // 2))

    def sub_sharded(K, mesh):
        clouds = jnp.asarray(rng.normal(size=(K, P, 3)).astype(np.float32))
        masks = jnp.ones((K, P), bool)
        f = jax.jit(lambda c: gather_submap_sharded(
            clouds, masks, c, n_sub, mesh))
        return timeit(f, jnp.int32(K // 2))

    span = 2 * n_sub + 1
    sweep("submap_gather", args.sizes, sub_single, sub_sharded,
          lambda K: span * P * 3 * 4 + span * P * 4)

    # ---- PGO solve ---------------------------------------------------
    def pgo_single(K):
        cfg = PoseGraphConfig(max_keyframes=K, max_between=2 * K, max_gps=8,
                              lm_iters=4, pcg_iters=64)
        g = build_graph(cfg, K)
        f = jax.jit(lambda g: solve(g, cfg))
        return timeit(f, g, reps=3)

    def pgo_sharded(K, mesh):
        cfg = PoseGraphConfig(max_keyframes=K, max_between=2 * K, max_gps=8,
                              lm_iters=4, pcg_iters=64)
        g = build_graph(cfg, K)
        f = jax.jit(lambda g: solve_sharded(g, cfg, mesh))
        return timeit(f, g, reps=3)

    sweep("pgo_solve", args.sizes, pgo_single, pgo_sharded,
          lambda K: 4 * 64 * (K * 6 * 4 + 8))  # per-LM: pcg_iters psums of (K,6)

    # ---- voxel map query (slot-sharded) ------------------------------
    N_Q = 8192

    def vm_tables(cap_log2):
        cfg = VoxelMapConfig(capacity=1 << cap_log2, voxel_size=0.5,
                             min_points=5)
        pts = np.stack([rng.uniform(-40, 40, N_Q), rng.uniform(-40, 40, N_Q),
                        0.05 * rng.standard_normal(N_Q)], 1).astype(np.float32)
        return cfg, jnp.asarray(pts), jnp.ones((N_Q,), bool)

    def vmq_single(K):
        cap_log2 = max(14, int(np.log2(K)) + 5)
        cfg, pts, msk = vm_tables(cap_log2)
        m = make_map(cfg)
        m, _ = insert(m, cfg, pts, msk, refresh_planes=False)
        f = jax.jit(lambda q: query_planes_merged3(m, cfg, q, msk))
        return timeit(f, pts)

    def vmq_sharded(K, mesh):
        cap_log2 = max(14, int(np.log2(K)) + 5)
        cfg, pts, msk = vm_tables(cap_log2)
        m = make_map_sharded(cfg, mesh)
        m, _ = insert_sharded(m, cfg, pts, msk, mesh)
        f = jax.jit(lambda q: query_planes_merged3_sharded(
            m, cfg, q, msk, mesh))
        return timeit(f, pts)

    sweep("voxel_query", args.sizes, vmq_single, vmq_sharded,
          lambda K: 3 * (N_Q * 4 + N_Q * 10 * 4))  # pmin + psum per stencil

    # crossover summary: smallest device count where sharded <= 1.2x single
    for stage, rows in results["stages"].items():
        for row in rows:
            ok = [int(n) for n, ms in row["sharded_ms"].items()
                  if ms <= 1.2 * row["single_ms"]]
            row["within_1p2x"] = sorted(ok)
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
