#!/usr/bin/env python
"""Attribute the pipeline-vs-odometry throughput gap (VERDICT r2 #2).

Runs the bench fig-8 feed through the chunked engine three ways:

  full       — keyframes + fused loop detect + ICP verify + PGO solves
  no_verify  — keyframes committed, loop verification suppressed
  no_kf      — keyframe threshold at infinity: pure chunked odometry

and prints per-variant wall time + scans/s. ``full - no_verify`` is the
loop-ICP + solve cost, ``no_verify - no_kf`` the keyframe-commit cost
(downsample + graph append inside the chunk program), and ``no_kf`` vs the
plain `odom_rollout` number is the chunking/dispatch overhead.

Usage: python scripts/profile_pipeline.py [--chunk 5] [--reps 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, "out", "jaxcache")
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import bench

    data = bench._cached(bench.PIPE_CACHE, bench.build_fig8_sequence)
    import jax.numpy as jnp

    from fastliosam_tpu.odom import ImuBatch, Scan

    engine = bench.make_engine_for(data, chunk=args.chunk)
    xyz, toff, mask = bench.pad_scans(data)
    S = xyz.shape[0]
    stamps_all = np.asarray(data["stamps"], np.float64)
    dt = float(data["scan_dt"])
    feed = []
    for c in range(0, S - (S % args.chunk), args.chunk):
        sl = slice(c, c + args.chunk)
        scans = Scan(xyz=jnp.asarray(xyz[sl]), t_offset=jnp.asarray(toff[sl]),
                     mask=jnp.asarray(mask[sl]))
        imus = ImuBatch(
            stamps=jnp.asarray(data["imu_t"][sl]),
            gyro=jnp.asarray(data["imu_g"][sl]),
            acc=jnp.asarray(data["imu_a"][sl]),
            mask=jnp.asarray(data["imu_m"][sl]),
        )
        feed.append((scans, imus, stamps_all[sl], dt,
                     float(stamps_all[sl][0]) - dt, float(stamps_all[sl][-1])))
    n_fed = len(feed) * args.chunk

    def run(variant):
        bench._init_engine_at(engine, data)
        if variant == "no_kf":
            engine.cfg = engine.cfg._replace(keyframe_threshold=1e9)
        if variant == "no_verify":
            engine._loop_processed_kf = 1 << 30
        t0 = time.perf_counter()
        for (scans, imus, stamps, sdt, lo, hi) in feed:
            engine.process_chunk(scans, imus, stamps, sdt)
            if variant == "no_verify":
                engine._loop_processed_kf = 1 << 30
        engine.finish()
        el = time.perf_counter() - t0
        stats = (engine.kf.n, len(engine.loop_pairs), engine.solve_count)
        engine.cfg = engine.cfg._replace(keyframe_threshold=1.0)
        return el, stats

    out = {}
    for variant in ("full", "no_verify", "no_kf"):
        run(variant)  # warm/compile
        el, stats = min(run(variant) for _ in range(args.reps))
        out[variant] = {
            "wall_s": round(el, 3),
            "scans_per_sec": round(n_fed / el, 2),
            "kf_loops_solves": stats,
        }
        print(f"# {variant}: {out[variant]}", file=sys.stderr)

    full, nv, nk = (out[v]["wall_s"] for v in ("full", "no_verify", "no_kf"))
    out["attribution_s"] = {
        "verify_plus_solve": round(full - nv, 3),
        "keyframe_commit": round(nv - nk, 3),
        "chunked_odom": round(nk, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
